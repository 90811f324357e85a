package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Compute-parallelism guard for expression-heavy stages.
  *
  * A small parquet table (one file under
  * `spark.sql.files.maxPartitionBytes`) scans as ONE partition, so a
  * compute-heavy per-row expression (MinHash signatures, winnowing,
  * media decode) runs on one core regardless of session width — the
  * scan is cheap but the compute is not, and Spark sizes partitions by
  * input bytes only. When the scan's partition count is below the
  * session's default parallelism, redistribute rows first: a small
  * round-robin shuffle buys full-width compute. At real scale
  * (thousands of input splits) the guard is a no-op — partition count
  * already exceeds parallelism and no shuffle is added. */
object Repartition {
  def forCompute(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** Global 0-based row index in `orderCols` order WITHOUT the
    * single-partition trap: `row_number()` over an un-partitioned
    * window funnels the ENTIRE table through one task — the canonical
    * way a working sf0.01 job dies at sf100. Here `orderBy` range-
    * partitions and sorts (every partition holds a contiguous rank
    * range), a first cheap pass counts rows per partition, the prefix
    * offsets ride the closure (numPartitions longs), and a second pass
    * adds offset + local position. No stage ever holds more than one
    * partition's rows. The per-partition imperative step is the RDD
    * exemption the design doc carves out — there is no Catalyst
    * operator for "my partition's global offset".
    *
    * `orderCols` should be a total order (include a unique tiebreak
    * column) or the assignment within ties is partition-dependent. */
  def withGlobalIndex(df: DataFrame, orderCols: Seq[String],
                      idxCol: String = "idx"): DataFrame = {
    require(orderCols.nonEmpty, "withGlobalIndex needs order columns")
    val spark = df.sparkSession
    // localCheckpoint (NOT cache): the counting pass and the indexing
    // pass both read the sorted layout, so it must be materialized
    // exactly once — but a .cache() here registers the frame in the
    // session CacheManager forever (the caller never gets a handle to
    // unpersist), permanently pinning a sorted copy of the input per
    // call. An eager local checkpoint materializes the same layout,
    // is cleaned by the ContextCleaner once the returned frame is
    // unreferenced, and truncates lineage as a bonus.
    val sorted = df.orderBy(orderCols.map(col): _*).localCheckpoint(true)
    val rdd = sorted.rdd
    val counts = rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)),
        preservesPartitioning = true)
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _) // offsets(i) = rows before partition i
    val indexed = rdd.mapPartitionsWithIndex({ (i, it) =>
      var n = offsets(i) - 1L
      it.map { row => n += 1L; Row.fromSeq(row.toSeq :+ n) }
    }, preservesPartitioning = true)
    spark.createDataFrame(indexed,
      StructType(sorted.schema.fields :+ StructField(idxCol, LongType, nullable = false)))
  }
}

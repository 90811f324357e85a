package graft.operators

import org.apache.spark.sql.DataFrame

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
}

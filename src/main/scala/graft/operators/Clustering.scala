package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.{NativeExprs, VectorAgg}

/** K-means clustering over an embedding column — the curation stage of
  * a training-data pipeline (semantic balancing, diversity sampling,
  * cluster-level filtering).
  *
  * The execution shape is MLlib's dense Lloyd's: centroids live on the
  * driver (k × dim doubles — driver-sized at any corpus size) and reach
  * executors as literals inside a codegen'd argmin expression, so one
  * iteration is ONE corpus scan feeding a map-side-combined per-cluster
  * vector mean (k rows cross the shuffle per partition). The corpus is
  * never shuffled, k-way exploded, or joined against itself.
  *
  * Determinism contract (what lets the driver hash-gate the result):
  *  - seeding: the k lowest-`idCol` vectors, not a sampled init;
  *  - assignment score: `dot(c,c) - 2·dot(v,c)` — same argmin as
  *    squared L2 (the `dot(v,v)` term is constant per row), each dot a
  *    sequential-order sum ([[NativeExprs.dotNative]] ↔ DuckDB
  *    `list_sum`), ties on the lower cluster id;
  *  - between iterations every centroid component is snapped to the
  *    1e-6 grid (`floor(x·10^6 + 0.5) / 10^6`, all IEEE-exact ops), so
  *    sum-order noise in the means never leaks into the next
  *    assignment;
  *  - a cluster that loses all its points keeps its previous centroid.
  */
object Clustering {

  /** Per-cluster result after `iters` Lloyd iterations: (cid, n,
    * centroid) with `n` the final assignment's cluster size (0 for an
    * emptied cluster) and `centroid` on the 1e-6 grid. */
  def kmeansCentroids(embs: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters > 0, "k and iters must be positive")
    val spark = embs.sparkSession
    val e = embs.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    var centroids: IndexedSeq[Array[Double]] =
      e.orderBy("id").limit(k).collect()
        .map(_.getSeq[Double](1).toArray).toIndexedSeq
    require(centroids.length == k, s"corpus has fewer than k=$k vectors")

    var assigned: DataFrame = null
    for (_ <- 1 to iters) {
      assigned = assign(e, centroids)
      val means = assigned.groupBy("cid")
        .agg(VectorAgg.vectorMean(col("v")).as("c"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      centroids = centroids.zipWithIndex.map { case (old, cid) =>
        means.get(cid).map(_.map(x => math.floor(x * 1e6 + 0.5) / 1e6)).getOrElse(old)
      }
    }

    val counts = assigned.groupBy("cid").agg(count(lit(1)).as("n"))
    val centRows = centroids.zipWithIndex.map { case (c, cid) => Row(cid, c.toSeq) }
    val centDF = spark.createDataFrame(
      spark.sparkContext.parallelize(centRows, 1),
      StructType(Seq(StructField("cid", IntegerType, nullable = false),
        StructField("c", ArrayType(DoubleType), nullable = false))))
    centDF.join(counts, Seq("cid"), "left")
      .select(col("cid"), coalesce(col("n"), lit(0L)).as("n"), col("c"))
  }

  /** Final (id, cid) assignment under the same trajectory. */
  def kmeansAssign(embs: DataFrame, idCol: String, vecCol: String,
                   k: Int, iters: Int): DataFrame = {
    val spark = embs.sparkSession
    val finalCentroids = kmeansCentroids(embs, idCol, vecCol, k, iters)
      .select("cid", "c").collect().sortBy(_.getInt(0))
      .map(_.getSeq[Double](1).toArray).toIndexedSeq
    val e = embs.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    assign(e, finalCentroids).select("id", "cid")
  }

  /** Argmin-by-(score, cid) as one codegen-friendly expression: an
    * array of (score, cid) structs reduced by array_min's struct
    * ordering. `dot(c,c)` is folded on the driver with the same
    * sequential order as the executors' `dotNative`. */
  private[operators] def assign(e: DataFrame, centroids: IndexedSeq[Array[Double]]): DataFrame = {
    val scored: Seq[Column] = centroids.zipWithIndex.map { case (c, cid) =>
      val dcc = c.foldLeft(0.0)((a, x) => a + x * x)
      val s = lit(dcc) - lit(2.0) * NativeExprs.dotNative(col("v"), typedLit(c.toSeq))
      struct(s.as("s"), lit(cid).as("cid"))
    }
    e.withColumn("cid", array_min(array(scored: _*)).getField("cid"))
  }
}

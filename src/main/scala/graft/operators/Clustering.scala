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
  * iteration is ONE scan of the (cached, ≤trainCap-row) training
  * sample feeding a map-side-combined per-cluster vector mean (k rows
  * cross the shuffle per partition). The corpus is never shuffled,
  * k-way exploded, or joined against itself — and the full corpus is
  * read only for the sizing count and the final assignment, never
  * inside the iteration loop.
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

  /** Rows the Lloyd loop may touch per iteration. A codebook's quality
    * needs only a sample; the loop must never pay one full corpus read
    * per iteration (at 100 TB that is `iters` full scans to train
    * driver-sized state). */
  val DefaultTrainCap = 100000L

  /** Per-cluster result after `iters` Lloyd iterations: (cid, n,
    * centroid) with `centroid` on the 1e-6 grid and `n` the FULL
    * corpus's cluster size under those returned centroids (0 for an
    * emptied cluster) — self-consistent with [[kmeansAssign]]'s
    * assignment by construction.
    *
    * Training runs on a deterministic hash sample of at most ~
    * `trainCap` vectors ([[Sampling.hashSampleToCap]] — md5-bucket
    * filter, engine-reproducible), cached for the loop; the full
    * corpus is read exactly twice: the sizing count and the final
    * count-per-cluster pass. Corpora at or under the cap train on
    * everything — the sample is the identity there. */
  def kmeansCentroids(embs: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int,
                      trainCap: Long = DefaultTrainCap): DataFrame = {
    val spark = embs.sparkSession
    val e = embs.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val centroids = trainCentroids(e, k, iters, trainCap)
    val counts = assign(e, centroids).groupBy("cid").agg(count(lit(1)).as("n"))
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
                   k: Int, iters: Int,
                   trainCap: Long = DefaultTrainCap): DataFrame = {
    val e = embs.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    assign(e, trainCentroids(e, k, iters, trainCap)).select("id", "cid")
  }

  /** The Lloyd loop itself: seeds + `iters` assign/mean rounds over the
    * (cached) training sample. Every round is materialized by its
    * collect, so the cache is dropped before returning. */
  private def trainCentroids(e: DataFrame, k: Int, iters: Int,
                             trainCap: Long): IndexedSeq[Array[Double]] = {
    require(k > 0 && iters > 0, "k and iters must be positive")
    // NOT forCompute-spread (unlike ProductQuant's trainer): plain
    // Lloyd's per-iteration work is k dots/row — light enough that at
    // the sampled sizes a 32-task round costs more scheduling than the
    // serial compute (measured +0.4 s on emb_kmeans at sf0.1 when
    // spread; PQ's joint-subspace rounds are m× heavier and win). At
    // scale the hash-sample filter inherits the corpus's partitioning,
    // so the loop is parallel exactly when the input was.
    val train = Sampling.hashSampleToCap(e, "id", trainCap).cache()
    var centroids: IndexedSeq[Array[Double]] =
      train.orderBy("id").limit(k).collect()
        .map(_.getSeq[Double](1).toArray).toIndexedSeq
    require(centroids.length == k, s"training sample has fewer than k=$k vectors")
    for (_ <- 1 to iters) {
      val means = assign(train, centroids).groupBy("cid")
        .agg(VectorAgg.vectorMean(col("v")).as("c"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      centroids = centroids.zipWithIndex.map { case (old, cid) =>
        means.get(cid).map(_.map(x => math.floor(x * 1e6 + 0.5) / 1e6)).getOrElse(old)
      }
    }
    train.unpersist()
    centroids
  }

  /** Argmin over the centroid matrix as ONE native expression
    * ([[NativeExprs.ArgminCentroidExpr]]): score = dot(c,c) -
    * 2·dot(v,c) with sequential-order dots and ties to the lower cid
    * — the same law the previous struct-array/array_min formulation
    * computed from k separate literal dot expressions, which was a
    * codegen/analysis explosion once k derives from the corpus
    * (k ~ n/250 in semanticDedup). The matrix rides the expression
    * as one reference object; per-row cost is O(k·d) either way. */
  private[operators] def assign(e: DataFrame, centroids: IndexedSeq[Array[Double]]): DataFrame =
    e.withColumn("cid",
      NativeExprs.argminCentroidNative(col("v"), centroids.map(_.toSeq)))
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.NativeExprs

/** Product quantization (PQ) for embedding search at corpus scales
  * where even int8 vectors don't fit: each vector is cut into `m`
  * subspaces and every subvector is replaced by the id of its nearest
  * per-subspace k-means centroid — `m·log2(k)` bits per vector (a
  * 64-dim float vector at m=4, k=8 is 12 bits, a 170× compression).
  * Query-time scoring is asymmetric distance computation (ADC): the
  * probe builds one k-entry lookup table per subspace, and a corpus
  * row's score is `m` table lookups and `m−1` additions — no float
  * vector is ever read. (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011 — public.)
  *
  * Spark execution shape, driver-sized state end-to-end:
  *  - codebooks: `m` runs of [[Clustering.kmeansCentroids]] on sliced
  *    vectors — m·k·subDim doubles on the driver, literal-broadcast
  *    into every expression that needs them;
  *  - encode: ONE corpus scan appending `m` codegen'd argmin
  *    expressions — no shuffle, no join, no explode;
  *  - ADC: codes crossJoin a ≤probes-row broadcast of driver-computed
  *    LUT arrays, score = fixed-order `element_at` sum, top-k per
  *    probe via rank-limited window (WindowGroupLimit, no global
  *    sort).
  *
  * Determinism (what lets the driver hash-gate the whole pipeline):
  * the codebooks inherit [[Clustering]]'s engine-exact Lloyd
  * trajectory per subspace; encode ties break on the lower code; LUT
  * entries are `dot(c,c) − 2·dot(q_s,c)` folded in index order (the
  * same sequential sum DuckDB's `list_sum` computes); the final score
  * adds the `m` parts in subspace order. */
object ProductQuant {

  /** Per-subspace codebooks: `m` × `k` centroids of length `subDim`,
    * trained by the same deterministic Lloyd trajectory as
    * [[Clustering.kmeansCentroids]] on each vector slice — but all `m`
    * subspaces JOINTLY: one corpus scan per iteration computes every
    * subspace's argmin and feeds one (subspace, cid)-keyed map-side-
    * combined mean (m·k rows per partition cross the shuffle), instead
    * of m sequential trainings. The per-group contents are identical
    * to slice-at-a-time training, and centroids snap to the 1e-6 grid
    * between iterations, so the trajectory — and any oracle built on
    * it — is unchanged.
    *
    * Training reads a deterministic hash sample of at most ~`trainCap`
    * vectors ([[Sampling.hashSampleToCap]]), cached for the loop —
    * codebook quality needs a sample, not the corpus, and the full
    * read happens exactly once, in [[encode]]. Corpora at or under the
    * cap train on everything (sample = identity). */
  def trainCodebooks(embs: DataFrame, idCol: String, vecCol: String,
                     m: Int, subDim: Int, k: Int, iters: Int,
                     trainCap: Long = Clustering.DefaultTrainCap)
      : IndexedSeq[IndexedSeq[Array[Double]]] = {
    require(m >= 1 && subDim >= 1 && k >= 1 && iters >= 1)
    // forCompute before caching: the sample drives `iters` CPU-dense
    // joint-subspace argmin/mean rounds; without the spread a small or
    // single-file input serializes every round onto one core (no-op at
    // scale; the 1e-6 snap absorbs sum-order noise — see Clustering's
    // determinism contract).
    val e = Repartition.forCompute(Sampling.hashSampleToCap(
      embs.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v")),
      "id", trainCap)).cache()
    val seeds = e.orderBy("id").limit(k).collect()
      .map(_.getSeq[Double](1).toArray)
    require(seeds.length == k, s"training sample has fewer than k=$k vectors")
    var codebooks: IndexedSeq[IndexedSeq[Array[Double]]] =
      (0 until m).map(s => seeds.toIndexedSeq.map(_.slice(s * subDim, (s + 1) * subDim)))
    for (_ <- 1 to iters) {
      // Argmin per subspace as ONE native expression over the unsliced
      // vector (offset form of [[NativeExprs.ArgminCentroidExpr]]) —
      // the previous k-way struct/array_min unroll was a 10 KB
      // expression tree whose per-task deserialize+setup dominated the
      // gate (§1.2 step 2; see OPTIMIZATION_r15.md). Score law and tie
      // break are bit-identical: dcc - 2·dot in ascending-dim order,
      // ties to the lower cid.
      val perSub = codebooks.zipWithIndex.map { case (cb, s) =>
        struct(lit(s).as("sp"),
          NativeExprs.argminCentroidNative(col("v"), cb.map(_.toSeq),
            offset = s * subDim).as("cid"),
          slice(col("v"), s * subDim + 1, subDim).as("sv"))
      }
      val means = e.select(explode(array(perSub: _*)).as("x"))
        .select(col("x.sp").as("sp"), col("x.cid").as("cid"), col("x.sv").as("sv"))
        .groupBy("sp", "cid")
        .agg(graft.functions.VectorAgg.vectorMean(col("sv")).as("c"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray)
        .toMap
      codebooks = codebooks.zipWithIndex.map { case (cb, s) =>
        cb.zipWithIndex.map { case (old, cid) =>
          means.get((s, cid))
            .map(_.map(x => math.floor(x * 1e6 + 0.5) / 1e6))
            .getOrElse(old)
        }
      }
    }
    e.unpersist() // every iteration materialized by its collect
    codebooks
  }

  /** Encode the corpus: (id, code0 … code{m−1}) in one scan. */
  def encode(embs: DataFrame, idCol: String, vecCol: String,
             codebooks: IndexedSeq[IndexedSeq[Array[Double]]],
             subDim: Int): DataFrame = {
    // One compact native argmin per subspace over the unsliced vector
    // (offset form) instead of the m·k-way struct/array_min literal
    // unroll: same score law (dcc - 2·dot, ascending-dim order, ties
    // to the lower cid), so codes — and every downstream gate — are
    // bit-identical; the projection's expression tree shrinks from
    // ~10 KB (32 dot subtrees + 32 array literals) to m reference-
    // object calls.
    val codeCols = codebooks.zipWithIndex.map { case (cb, s) =>
      NativeExprs.argminCentroidNative(col(vecCol).cast("array<double>"),
        cb.map(_.toSeq), offset = s * subDim).as(s"code$s")
    }
    // forCompute: code assignment is m·k dot products per row and
    // rides the scan's partitioning — a single-file corpus serializes
    // it into one task (jobs probe: the dominant 0.4 s single-task
    // stage of knn_pq); the narrow (id, vec) exchange is cheaper.
    // Row-wise map → results identical; multi-split at scale → no-op.
    Repartition.forCompute(embs.select(col(idCol).as("id"), col(vecCol)))
      .select(col("id") +: codeCols: _*)
  }

  /** ADC top-k: probes are driver-side (few by contract, like the
    * exact top-k baseline's probe set); LUTs are computed on the
    * driver and shipped as a bounded broadcast. Returns
    * (qid, id, score, rk) with `score` the ADC estimate of
    * `‖q‖²-shifted` squared L2 (ranking-equivalent), 6-dp rounded. */
  def adcTopK(codes: DataFrame, probes: Seq[(Long, Array[Double])],
              codebooks: IndexedSeq[IndexedSeq[Array[Double]]],
              subDim: Int, topK: Int): DataFrame = {
    val spark = codes.sparkSession
    val m = codebooks.length
    val lutRows = probes.map { case (qid, q) =>
      val luts = codebooks.zipWithIndex.map { case (cb, s) =>
        cb.map { c =>
          val dcc = c.foldLeft(0.0)((a, x) => a + x * x)
          var dqc = 0.0
          var i = 0
          while (i < subDim) { dqc += q(s * subDim + i) * c(i); i += 1 }
          dcc - 2.0 * dqc
        }.toSeq
      }
      Row.fromSeq(qid +: luts)
    }
    val lutSchema = StructType(
      StructField("qid", LongType, nullable = false) +:
        (0 until m).map(s => StructField(s"lut$s",
          ArrayType(DoubleType, containsNull = false), nullable = false)))
    val lutDf = spark.createDataFrame(
      spark.sparkContext.parallelize(lutRows, 1), lutSchema)
    val score = (0 until m).map(s =>
      element_at(col(s"lut$s"), col(s"code$s") + 1)).reduceLeft(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("score"), col("id"))
    codes.crossJoin(broadcast(lutDf))
      .withColumn("score", score)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= topK)
      .select(col("qid"), col("id"), round(col("score"), 6).as("score"), col("rk"))
  }

  /** IVF-PQ: the production ANN layout — a coarse inverted file
    * restricts ADC scoring to each probe's `nprobe` cells, so per-probe
    * cost is (corpus/nCells)·nprobe code rows instead of the whole code
    * table. `cells` is [[graft.operators.Similarity.assignCells]]'s
    * (id, cell) frame; `centroids` the same nCells sampled vectors,
    * collected (bounded by contract). Probe→cell routing runs on the
    * driver with the identical 9-dp-rounded sequential cosine the
    * distributed assignment uses, so the whole pipeline stays
    * hash-gated. Scoring joins the code table to the broadcast
    * (qid, cell, LUTs) routing table on cell — candidates never
    * shuffle; at 100 TB the code table persists bucketed by cell and
    * the probe is a bucket lookup. */
  def ivfAdcTopK(codes: DataFrame, cells: DataFrame,
                 centroids: Seq[(Long, Array[Double])],
                 probes: Seq[(Long, Array[Double])],
                 codebooks: IndexedSeq[IndexedSeq[Array[Double]]],
                 subDim: Int, nprobe: Int, topK: Int): DataFrame = {
    val spark = codes.sparkSession
    val m = codebooks.length
    def round9(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    def norm(v: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    val centNorms = centroids.map { case (cid, cv) => (cid, cv, norm(cv)) }
    val lutRows = probes.flatMap { case (qid, q) =>
      val qn = norm(q)
      val probeCells = centNorms.map { case (cid, cv, cn) =>
        var dot = 0.0; var i = 0
        while (i < q.length) { dot += q(i) * cv(i); i += 1 }
        (cid, round9(dot / (qn * cn)))
      }.sortBy { case (cid, sim) => (-sim, cid) }.take(nprobe).map(_._1)
      val luts = codebooks.zipWithIndex.map { case (cb, s) =>
        cb.map { c =>
          val dcc = c.foldLeft(0.0)((a, x) => a + x * x)
          var dqc = 0.0
          var i = 0
          while (i < subDim) { dqc += q(s * subDim + i) * c(i); i += 1 }
          dcc - 2.0 * dqc
        }.toSeq
      }
      probeCells.map(cell => Row.fromSeq(qid +: cell +: luts))
    }
    val lutSchema = StructType(
      StructField("qid", LongType, nullable = false) +:
        StructField("cell", LongType, nullable = false) +:
        (0 until m).map(s => StructField(s"lut$s",
          ArrayType(DoubleType, containsNull = false), nullable = false)))
    val routing = spark.createDataFrame(
      spark.sparkContext.parallelize(lutRows, 1), lutSchema)
    val score = (0 until m).map(s =>
      element_at(col(s"lut$s"), col(s"code$s") + 1)).reduceLeft(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("score"), col("id"))
    codes.join(cells, "id")
      .join(broadcast(routing), "cell")
      .withColumn("score", score)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= topK)
      .select(col("qid"), col("id"), round(col("score"), 6).as("score"), col("rk"))
  }
}

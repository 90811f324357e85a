package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.NativeExprs

/** Distributed training of the hashed-feature quality classifier —
  * the step the scoring surface ([[graft.functions.TextFunctions
  * .hashedLinearScore]] / `hashedLinearScoreTrained`) was built to
  * receive: full-batch logistic regression by gradient descent, run
  * entirely as Spark aggregates (the fastText-style curation
  * classifier of the public data-pipeline literature, e.g. the CCNet /
  * LLaMA quality filters, trained at corpus scale).
  *
  * Model: `p(keep | doc) = σ(Σ_j w_j·x_j + w_D)` over `dim` hashed
  * bag-of-tokens counts `x_j` ([[NativeExprs.HashedCountsExpr]], one
  * native tokenize pass per row) plus an intercept slot `x_D = 1`.
  *
  * Determinism (the library's quantized-integer law, same as
  * [[LanguageModel]] / [[Search]]): weights live in integer
  * MICRO-units; the per-doc margin is an EXACT long dot product
  * (`Σ w_micro_j · x_j`, one double divide at the end); the sigmoid
  * is quantized to the 1e-4 grid (`pq = ⌊p·1e4 + 0.5⌋`) BEFORE it
  * enters the gradient, so every per-doc gradient contribution
  * `(pq − y·1e4) · x_j · 100` is an exact integer and the distributed
  * sum is independent of row order and partitioning; the driver-side
  * update `w_j ← w_j − ⌊lr·G_j/n + 0.5⌋` is the only floating step
  * and runs on one JVM. An engine recomputing the same law (the
  * DuckDB oracle unrolls the iterations as CTE stages) reproduces the
  * weights bit-for-bit.
  *
  * Scale shape: each iteration is ONE corpus scan — a native
  * feature-extraction pass, a codegen'd margin fold against the
  * weight literal, then a posexplode into a (dim+1)-key map-side-
  * combined aggregate (the only shuffle: ≤ (dim+1)·P partial rows).
  * Nothing is cached and nothing but the (dim+1)-row gradient ever
  * reaches the driver, so the loop holds at any corpus size; `iters`
  * scans is the honest cost of full-batch GD (mini-batching would
  * ride [[Sampling.hashSample]] on the same law). */
object Training {

  /** Train `iters` full-batch GD steps; returns `dim+1` micro-unit
    * weights (index `dim` = intercept). `label` must evaluate to
    * 0/1 (cast to long). */
  def trainLogRegWeights(docs: DataFrame, textCol: String, label: Column,
                         dim: Int = 32, iters: Int = 3,
                         lr: Double = 0.2): Array[Long] = {
    val base = docs.select(
      concat(NativeExprs.hashedCountsNative(col(textCol), dim),
        array(lit(1L))).as("x"),
      label.cast("long").as("y"))
    val n = docs.count()
    val w = Array.fill(dim + 1)(0L)
    if (n == 0L) return w
    var it = 0
    while (it < iters) {
      val grads = base
        .select(col("y"), col("x"), marginMicro(col("x"), w).as("m"))
        .select(col("x"), gradScale(col("m"), col("y")).as("gs"))
        .select(col("gs"), posexplode(col("x")).as(Seq("j", "xj")))
        // (pq − y·1e4)·x_j·100: exact integers, order-independent sum
        .withColumn("g", col("gs") * col("xj"))
        .groupBy("j").agg(sum(col("g")).as("g"))
        .collect()
      grads.foreach { r =>
        val j = r.getInt(0)
        w(j) -= math.floor(lr * r.getLong(1) / n + 0.5).toLong
      }
      it += 1
    }
    w
  }

  /** Exact long dot product of the count array against the micro-unit
    * weight literal. */
  private def marginMicro(x: Column, w: Array[Long]): Column =
    aggregate(zip_with(x, typedLit(w.toSeq), (a, b) => a * b),
      lit(0L), (acc, v) => acc + v)

  /** `(pq − y·1e4)·100` where `pq = ⌊σ(m/1e6)·1e4 + 0.5⌋` — the
    * per-doc gradient scale; multiplied by the integer count x_j it
    * is the exact-integer contribution. */
  private def gradScale(mMicro: Column, y: Column): Column =
    (floor(lit(1e4) / (lit(1.0) + exp(-(mMicro.cast("double") / lit(1e6))))
      + lit(0.5)).cast("long") - y * lit(10000L)) * lit(100L)

  /** The trained model as data: `(bucket, w_micro)`, bucket `dim` =
    * intercept. */
  def trainLogReg(docs: DataFrame, textCol: String, label: Column,
                  dim: Int = 32, iters: Int = 3,
                  lr: Double = 0.2): DataFrame = {
    val w = trainLogRegWeights(docs, textCol, label, dim, iters, lr)
    val spark = docs.sparkSession
    import spark.implicits._
    w.toSeq.zipWithIndex.map { case (wm, j) => (j, wm) }
      .toDF("bucket", "w_micro")
  }

  /** Score with trained micro-weights: the quantized sigmoid
    * `pq ∈ [0, 10000]` (same law as training) and the keep decision
    * `pq ≥ 5000`. One native feature pass + codegen'd fold; no
    * shuffle. */
  def scoreLogReg(text: Column, w: Array[Long]): (Column, Column) = {
    val dim = w.length - 1
    val x = concat(NativeExprs.hashedCountsNative(text, dim), array(lit(1L)))
    val pq = floor(lit(1e4) / (lit(1.0) +
      exp(-(marginMicro(x, w).cast("double") / lit(1e6)))) + lit(0.5))
      .cast("long")
    (pq, (pq >= 5000L).cast("int"))
  }
}

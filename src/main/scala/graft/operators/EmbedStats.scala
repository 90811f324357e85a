package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Exact distributed second-moment statistics over an embedding
  * column, and the PCA that rides on them — the whitening /
  * dimensionality-reduction stage in front of the ANN tier
  * ([[Similarity]], [[ProductQuant]]): IVF cell assignment and PQ
  * subspaces both behave better on decorrelated axes (the public
  * OPQ/whitening observation).
  *
  * Determinism (the library's quantized-integer law): components are
  * quantized to the milli grid (`⌊x·1e3 + 0.5⌋` as long) BEFORE any
  * sum, so Σx_i, Σx_i·x_j and n are exact longs — independent of row
  * order and partitioning, reproducible by any engine. The D(D+1)/2
  * upper-triangle products per row ride ONE pure-map pass into a
  * (D(D+1)/2 + D + 1)-key map-side-combined aggregate; the only
  * shuffle is those ≤153·P partial rows (D=16), never the vectors.
  * The covariance build and the power iteration run on the driver
  * over the tiny D×D matrix — the same bounded-driver-work pattern
  * as [[ProductQuant]]'s ADC tables.
  *
  * Scale: 100 TB of vectors stream through one scan; what reaches the
  * driver is O(D²) longs. Adding rows never changes the shape. */
object EmbedStats {

  /** Exact quantized second moments of the first `dims` components:
    * rows `(i, j, s)` with i ≤ j = Σ xq_i·xq_j (upper triangle),
    * `(i, -1, s)` = Σ xq_i (marginals), `(-1, -1, n)` (count) —
    * everything downstream covariance/PCA needs, all exact longs.
    * `quant` bounds the product magnitude: at 1e3 and |x| ≤ ~30 the
    * per-row product is ≤ 9e8, so the long sum holds past 1e9 rows. */
  def secondMoments(embs: DataFrame, vecCol: String, dims: Int,
                    quant: Double = 1e3): DataFrame = {
    require(dims >= 1, s"dims=$dims")
    val spark = embs.sparkSession
    import spark.implicits._
    val xq = transform(slice(col(vecCol).cast("array<double>"), 1, dims),
      v => floor(v * lit(quant) + lit(0.5)).cast("long"))
    val pairs = for { i <- 0 until dims; j <- i until dims } yield (i, j)
    val base = embs.select(xq.as("xq"))
    val entries = array(
      (pairs.map { case (i, j) =>
        element_at(col("xq"), i + 1) * element_at(col("xq"), j + 1) } ++
        (0 until dims).map(i => element_at(col("xq"), i + 1)) ++
        Seq(lit(1L))): _*)
    val mapping = (pairs ++
      (0 until dims).map(i => (i, -1)) ++ Seq((-1, -1)))
      .zipWithIndex.map { case ((i, j), pos) => (pos, i, j) }
      .toDF("pos", "i", "j")
    base.select(posexplode(entries).as(Seq("pos", "v")))
      .groupBy("pos").agg(sum(col("v")).as("s"))
      .join(broadcast(mapping), "pos")
      .select(col("i"), col("j"), col("s"))
  }

  /** Covariance matrix (population, divide by n) from collected
    * [[secondMoments]] rows, in REAL units (the quantization divides
    * back out). Driver-side, D×D. */
  def covarianceFromMoments(rows: Seq[Row], dims: Int,
                            quant: Double = 1e3): Array[Array[Double]] = {
    val m = rows.map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val n = m((-1, -1)).toDouble
    require(n > 0, "empty input")
    val cov = Array.ofDim[Double](dims, dims)
    for (i <- 0 until dims; j <- i until dims) {
      val sxy = m((i, j)).toDouble
      val sx = m((i, -1)).toDouble
      val sy = m((j, -1)).toDouble
      val c = (sxy / n - (sx / n) * (sy / n)) / (quant * quant)
      cov(i)(j) = c
      cov(j)(i) = c
    }
    cov
  }

  /** Top-`k` principal components by deterministic power iteration
    * with deflation (start vector = e_axis of the largest diagonal,
    * fixed `iters`, no randomness — same trajectory on every run).
    * Returns unit-norm rows, sign-fixed so the largest-|.| component
    * is positive. */
  def principalComponents(cov: Array[Array[Double]], k: Int,
                          iters: Int = 100): Array[Array[Double]] = {
    val d = cov.length
    val a = cov.map(_.clone())
    def matvec(v: Array[Double]): Array[Double] =
      Array.tabulate(d)(i => (0 until d).map(j => a(i)(j) * v(j)).sum)
    def norm(v: Array[Double]): Double = math.sqrt(v.map(x => x * x).sum)
    (0 until k).map { _ =>
      var v = Array.tabulate(d)(i =>
        if (i == (0 until d).maxBy(j => a(j)(j))) 1.0 else 0.0)
      var it = 0
      while (it < iters) {
        val w = matvec(v)
        val nw = norm(w)
        if (nw > 0) v = w.map(_ / nw)
        it += 1
      }
      // sign fix: largest-|.| component positive
      val m = v.indices.maxBy(i => math.abs(v(i)))
      if (v(m) < 0) v = v.map(-_)
      // deflate: a -= λ v vᵀ
      val lam = {
        val w = matvec(v)
        v.indices.map(i => v(i) * w(i)).sum
      }
      for (i <- 0 until d; j <- 0 until d) a(i)(j) -= lam * v(i) * v(j)
      v
    }.toArray
  }

  /** Project the first `dims` components of `vecCol` onto the given
    * component rows (pure map, no shuffle): output array<double>
    * length k. */
  def project(vecCol: org.apache.spark.sql.Column, comps: Array[Array[Double]],
              dims: Int): org.apache.spark.sql.Column = {
    val x = slice(vecCol.cast("array<double>"), 1, dims)
    array(comps.map { c =>
      aggregate(zip_with(x, typedLit(c.toSeq), (a, b) => a * b),
        lit(0.0), (acc, v) => acc + v)
    }: _*)
  }
}

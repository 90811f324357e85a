package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval join with NO equality key — the join shape Spark
  * can only plan as a BroadcastNestedLoopJoin (or a Cartesian product)
  * from a raw range predicate, which is the classic 100 TB cliff.
  *
  * Binned rewrite: pick a bin width w ≈ the typical interval length.
  * Each interval [lo, hi] explodes into its covered bins (⌈|interval|/w⌉
  * + 1 rows); each point lands in exactly ONE bin. The join becomes a
  * hash EQUIJOIN on the bin with the exact range predicate as a
  * post-filter — shuffle on bin keys, partial-aggregation-friendly,
  * AQE-replannable, no nested loop anywhere. Because a point has one
  * bin and an interval covers that bin at most once, a point matching
  * k intervals emits exactly k rows — no dedup pass needed.
  *
  * Cost model: the interval side inflates by the mean covered-bin
  * count (≤ |interval|/w + 1) — w too small inflates the build side,
  * w too large degrades bin selectivity toward all-pairs-per-bin.
  * w ≈ median interval length keeps both within a small constant. */
object RangeJoin {

  /** Join `points` to every interval of `intervals` containing its
    * value: pointCol ∈ [loCol, hiCol], all non-negative longs
    * (callers map dates/timestamps to day/second numbers first).
    * Returns the joined frame with all columns from both sides. */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth=$binWidth")
    // integral `div`, never `/`: Column division is double division,
    // inexact past 2^53 (same rule as the product decode).
    val ivBins = intervals.withColumn("_bin",
      explode(sequence(expr(s"$loCol div $binWidth"), expr(s"$hiCol div $binWidth"))))
    val ptBins = points.withColumn("_bin", expr(s"$pointCol div $binWidth"))
    ptBins.join(ivBins, "_bin")
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bin")
  }
}

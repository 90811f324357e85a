package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward, inclusive) join: for every left row, attach the
  * right row with the greatest `rightTs <= leftTs` sharing the join
  * key. The reference has no such operator (SURVEY §2.7) — this is one
  * of the engine's scale extensions.
  *
  * Scale design: NO range cross-join. Both sides are tagged and
  * unioned, then a single shuffle on the key + an in-partition sort
  * feeds a running `last(right, ignoreNulls)` window — O(n log n) per
  * key group, one shuffle total, AQE-friendly. At 100 TB this is the
  * plan you want: the alternative (per-key cross join + filter +
  * argmax) explodes quadratically on hot keys.
  */
object AsofJoin {

  /** Forward as-of: earliest right row with `rightTs >= leftTs` per
    * key. Same single-shuffle design, windowed from the other end. */
  def forward(left: DataFrame, right: DataFrame, key: String,
              leftTs: String, rightTs: String,
              rightPayload: Seq[String]): DataFrame =
    joinImpl(left, right, Seq(key), leftTs, rightTs, rightPayload, backwardMode = false)

  /** @param rightPayload right-side columns carried onto left rows
    *                     (null when no right row precedes the left row). */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightPayload: Seq[String]): DataFrame =
    joinImpl(left, right, Seq(key), leftTs, rightTs, rightPayload, backwardMode = true)

  /** Multi-column-key backward as-of. */
  def backwardKeys(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   rightPayload: Seq[String]): DataFrame =
    joinImpl(left, right, keys, leftTs, rightTs, rightPayload, backwardMode = true)

  private def joinImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTs: String, rightTs: String,
                       rightPayload: Seq[String], backwardMode: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    // A genuinely-NULL struct (not a struct of nulls): last(ignoreNulls)
    // must skip rows of the opposite side.
    def nullStruct(df: DataFrame, cols: Seq[String]) =
      lit(null).cast(org.apache.spark.sql.types.StructType(cols.map(c => df.schema(c))))

    val l = left.select(
      struct(keys.map(col): _*).as("_k") +: Seq(
        col(leftTs).as("_ts"), lit(1).as("_tag"),
        struct(leftCols.map(col): _*).as("_lrow"),
        nullStruct(right, rightPayload).as("_rrow")): _*)
    val r = right.select(
      struct(keys.map(col): _*).as("_k") +: Seq(
        col(rightTs).as("_ts"), lit(0).as("_tag"),
        nullStruct(left, leftCols).as("_lrow"),
        struct(rightPayload.map(col): _*).as("_rrow")): _*)
    // Right rows sort "inside" the inclusive bound at equal ts: before
    // left rows for backward (_tag 0 < 1 ascending), after-start for
    // forward (descending ts, right still first at the tie).
    // _rrow as the final sort key makes the choice among right rows
    // sharing (key, ts) deterministic (left rows all have _rrow null,
    // so it never reorders left-vs-right).
    val w = (if (backwardMode)
      Window.partitionBy("_k").orderBy(col("_ts").asc, col("_tag").asc, col("_rrow").asc)
    else
      Window.partitionBy("_k").orderBy(col("_ts").desc, col("_tag").asc, col("_rrow").asc))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("_match", last(col("_rrow"), ignoreNulls = true).over(w))
      .where(col("_tag") === 1)
    val out = leftCols.map(c => col(s"_lrow.$c").as(c)) ++
      rightPayload.map(c => col(s"_match.$c").as(c))
    matched.select(out: _*)
  }
}

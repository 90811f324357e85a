package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis over an event log: for steps
  * s₁ → s₂ → … → sₖ, a user completes step i at
  * `tᵢ = min{ts : type = sᵢ, ts > tᵢ₋₁}` (strictly-after chaining,
  * the standard product-analytics law).
  *
  * Scale shape: ONE shuffle total. The naive plan is k aggregates
  * and k−1 re-joins on user (k passes over the log, k shuffles);
  * here the chained per-step first-completion times are k stacked
  * window layers over the SAME (user, ts) window spec, so Catalyst
  * plans a single Exchange + Sort and evaluates all k layers inside
  * one Window pipeline: layer i's running prefix-min `mᵢ` of
  * qualified step-i times is non-increasing, and a step-(i+1) event
  * qualifies exactly when it falls strictly after that prefix-min —
  * which from tᵢ's row onward IS tᵢ, reproducing the law above. Per
  * user, `min(mᵢ)` over all rows is tᵢ. No per-user event list is
  * ever materialized, so a power user with millions of events costs
  * sort-merge work, not memory. */
object Funnel {

  /** Per-user step-completion times: `(user, t0 … t(k-1))`, null where
    * the chain stalls. */
  def funnelTimes(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, orderCol: String,
                  steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one step")
    val w = Window.partitionBy(userCol)
      .orderBy(col(tsCol).asc, col(orderCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var df = events.select(col(userCol), col(typeCol), col(tsCol),
      col(orderCol))
    steps.zipWithIndex.foreach { case (s, i) =>
      val qual =
        if (i == 0) col(typeCol) === s
        else col(typeCol) === s && col(s"m${i - 1}").isNotNull &&
          col(tsCol) > col(s"m${i - 1}")
      df = df.withColumn(s"m$i", min(when(qual, col(tsCol))).over(w))
    }
    val aggs = steps.indices.map(i => min(col(s"m$i")).as(s"t$i"))
    df.groupBy(col(userCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Cohort retention: users grouped by first-activity week (Monday
    * truncation), counted per later activity-week offset — the
    * triangle a product dashboard plots. Output
    * `(cohort, week_offset, users)`; offset 0 row = cohort size.
    *
    * Scale shape: the (user, week) activity set is distinct-reduced
    * BEFORE the join (weeks-per-user rows, not events-per-user), and
    * both the cohort aggregate and the join key on user — Catalyst
    * co-partitions them, so the chain is two user-keyed exchanges +
    * the small (cohort, offset) aggregate. No per-user history is
    * materialized. */
  def retentionCohorts(events: DataFrame, userCol: String,
                       tsCol: String): DataFrame = {
    val wk = date_trunc("week", col(tsCol)).cast("date")
    val firsts = events.groupBy(col(userCol))
      .agg(min(wk).as("cohort"))
    val activity = events.select(col(userCol), wk.as("wk")).distinct()
    activity.join(firsts, userCol)
      .select(col("cohort"),
        (datediff(col("wk"), col("cohort")) / 7).cast("int").as("week_offset"))
      .groupBy("cohort", "week_offset")
      .agg(count(lit(1)).as("users"))
  }

  /** Per-user daily activity with the gaps filled: every day between
    * a user's first and last event appears, zero-count where idle —
    * the dense series a downstream model consumes. Output
    * `(user, day, n)`.
    *
    * Scale shape: daily counts aggregate first (days-per-user rows),
    * the per-user [min, max] span aggregates from THAT (no second
    * event scan), and the `sequence` explode generates only span
    * days — all three stages share the user-keyed partitioning. The
    * explode is the output's own size, not a blowup. */
  def gapFillDaily(events: DataFrame, userCol: String,
                   tsCol: String): DataFrame = {
    val day = col(tsCol).cast("date")
    val counts = events.groupBy(col(userCol), day.as("day"))
      .agg(count(lit(1)).as("n"))
    val spans = counts.groupBy(col(userCol))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val spine = spans.select(col(userCol),
      explode(sequence(col("d0"), col("d1"))).as("day"))
    spine.join(counts, Seq(userCol, "day"), "left")
      .select(col(userCol), col("day"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Step-completion counts: `(step, step_name, users)` — users whose
    * chain reached step i. Monotone non-increasing by construction. */
  def funnelCounts(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, orderCol: String,
                   steps: Seq[String]): DataFrame = {
    val times = funnelTimes(events, userCol, typeCol, tsCol, orderCol, steps)
    // coalesce: a global agg over ZERO rows yields null sums, but the
    // count of users who reached a step of an empty corpus is 0.
    val counts = times.agg(
      coalesce(sum(when(col("t0").isNotNull, 1L).otherwise(0L)), lit(0L)).as("c0"),
      steps.indices.tail.map(i =>
        coalesce(sum(when(col(s"t$i").isNotNull, 1L).otherwise(0L)), lit(0L))
          .as(s"c$i")): _*)
    counts.select(explode(array(steps.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).as("step"), lit(s).as("step_name"),
        col(s"c$i").as("users"))
    }: _*)).as("r")).select(col("r.step"), col("r.step_name"), col("r.users"))
  }
}

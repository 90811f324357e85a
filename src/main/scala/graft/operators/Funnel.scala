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

  /** Step-completion counts: `(step, step_name, users)` — users whose
    * chain reached step i. Monotone non-increasing by construction. */
  def funnelCounts(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, orderCol: String,
                   steps: Seq[String]): DataFrame = {
    val times = funnelTimes(events, userCol, typeCol, tsCol, orderCol, steps)
    val counts = times.agg(
      sum(when(col("t0").isNotNull, 1L).otherwise(0L)).as("c0"),
      steps.indices.tail.map(i =>
        sum(when(col(s"t$i").isNotNull, 1L).otherwise(0L)).as(s"c$i")): _*)
    counts.select(explode(array(steps.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).as("step"), lit(s).as("step_name"),
        col(s"c$i").as("users"))
    }: _*)).as("r")).select(col("r.step"), col("r.step_name"), col("r.users"))
  }
}

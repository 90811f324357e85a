package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface — the reference has no streaming at all
  * (SURVEY §2.7); these are the engine's scale extensions, built on
  * stock watermark + windowed aggregation and
  * `flatMapGroupsWithState` for custom session state.
  *
  * Every transform takes a DataFrame/Dataset and works identically on a
  * batch frame or a `readStream` frame — the Spark-first way to keep
  * one code path for backfill (batch over 100 TB of history) and live
  * tailing.
  */
object EventStreams {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionOut(user_id: Long, session_start: Timestamp,
                        session_end: Timestamp, n_events: Long, sum_value: Double)

  /** Schema version stamped into every stateful-operator state row
    * ([[SessionState]], [[FunnelState]]). Spark's state-store encoder
    * check catches FIELD-layout drift across a checkpoint restart, but
    * not a SEMANTIC change under an identical layout (e.g. a field
    * reinterpreted from seconds to ms) — the stamp turns that silent
    * corruption into [[checkStateVersion]]'s fail-fast. History:
    * v1 = pre-round-9 (`FunnelState` without `lastMs`, NoTimeout);
    * v2 = round 9 (retention clock + EventTimeTimeout); v3 = round 12
    * (this stamp — adding it is itself a state-schema break, see the
    * checkpoint-compatibility note on [[funnelStream]]). */
  val StateSchemaVersion: Int = 3

  /** Fail fast when a restored state row carries a different schema
    * version than this build writes: restarting from an incompatible
    * checkpoint must surface as a clear error at the first touched
    * key, not as silently wrong sessions/funnels. Spec-pinned message
    * (StreamingSpec). */
  private[graft] def checkStateVersion(ver: Int, what: String): Unit =
    if (ver != StateSchemaVersion)
      throw new IllegalStateException(
        s"$what checkpoint schema version $ver is incompatible with this " +
          s"build (expects $StateSchemaVersion): restart the query from a " +
          "NEW checkpoint location (and replay the retained event horizon " +
          "if continuity matters); there is no in-place state migration.")

  /** Per-user aggregation state (public: the state encoder's generated
    * code must be able to reach the constructor). */
  case class SessionState(startMs: Long, lastMs: Long, cnt: Long, total: Double,
                          ver: Int = StateSchemaVersion)

  private val streamSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** [[windowedCounts]] run as a REAL streaming query — file source →
    * watermark → append-mode aggregation → memory sink — driven to
    * completion with `Trigger.AvailableNow`. On bounded input the
    * result is deterministic: append mode emits exactly the windows
    * whose end has passed the FINAL watermark (max event-time,
    * truncated to ms as Spark's EventTimeStatsAccum does, minus the
    * delay); later windows are still "open" and stay in state — the
    * semantics a live pipeline sees, which the batch face can't
    * exercise. The whole file arrives in one micro-batch (one input
    * file), so no row is ever dropped as late and the emitted set
    * depends only on the data.
    *
    * Scale: state is one row per (window, event_type) group partition;
    * the watermark reaps closed windows, so a year-long stream holds
    * ~delay/windowLen windows of state per key, not the full history. */
  def windowedCountsStream(spark: org.apache.spark.sql.SparkSession, dir: String,
                           windowLen: String = "1 hour",
                           watermark: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val batchSchema = spark.read.parquet(s"$dir/events.parquet").schema
    // glob form: the file stream source requires a directory (or glob)
    // basePath, and the test corpus ships events as a single file
    val raw = spark.readStream.schema(batchSchema).parquet(s"$dir/events.parquet*")
    // same ts normalization as GraftSession.loadEvents (NANOS-as-long
    // and NTZ generations both decode to µs TimestampType)
    val ev = batchSchema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
    val agg = windowedCounts(ev, windowLen, watermark)
    val name = s"graft_stream_windows_${streamSeq.incrementAndGet()}"
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Tumbling-window event counts with a watermark for state cleanup.
    * Works for batch and streaming frames alike. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming sessionization with a gap timeout: emits one row per
    * CLOSED session (no event for `gapSeconds`). State per user is
    * O(1) — start/last/count/sum — so 10^9 users is a bounded-state
    * job, not an accumulation leak; event-time timeout + watermark
    * reap idle keys. */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800,
                 watermark: String = "1 hour"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000L

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            checkStateVersion(s.ver, "SessionState")
            state.remove()
            Iterator(SessionOut(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.cnt, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            cur.foreach(s => checkStateVersion(s.ver, "SessionState"))
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  cur = Some(SessionState(s.startMs, t, s.cnt + 1, s.total + e.value))
                case Some(s) =>
                  closed ::= SessionOut(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.cnt, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Per-user funnel-progress state for [[funnelStream]] (public for
    * the state encoder's generated code): per step the ascending
    * candidate times (ms) that could still become that step's
    * first-completion time, plus the max event time seen (the
    * retention clock). */
  case class FunnelState(times: Seq[Seq[Long]], lastMs: Long = 0L,
                         ver: Int = StateSchemaVersion)

  /** One funnel-progress update: the user's deepest reached stage
    * (0 = not started) and the completion times (ms) of the reached
    * prefix. */
  case class FunnelUpdate(user_id: Long, stage: Int, t_ms: Seq[Long])

  /** [[graft.operators.Funnel]]'s chain law on a live stream, with
    * out-of-order arrival handled: `mapGroupsWithState` keeps, per
    * step, only the candidate times that can still matter — step 1
    * needs just its min (t₁ only ever decreases); for step i, a
    * LATE-arriving earlier step-(i−1) event can only lower tᵢ₋₁,
    * which only ADMITS SMALLER step-i times, so any stored time above
    * the current tᵢ is dead and is pruned, and the remainder is
    * capped at the `maxKeep` smallest (the documented approximation
    * bound — exact whenever fewer than `maxKeep` step-i events
    * precede the settled chain, which is the practical case). Each
    * batch re-derives the chain from the candidate lists and emits
    * the user's current progress (update mode: latest row per user
    * wins). State is O(steps · maxKeep) longs per user AND reaped in
    * time: an event-time timeout fires once the watermark passes
    * `retentionMs` beyond the user's last event — the final progress
    * row is emitted once more and the state removed, so the job's
    * state store is bounded by the ACTIVE user population inside the
    * retention horizon, not every user ever seen.
    *
    * CHECKPOINT COMPATIBILITY: the retention change (round 9) added
    * `lastMs` to [[FunnelState]] and switched the group-state timeout
    * from NoTimeout to EventTimeTimeout. Both are incompatible with
    * checkpoints written by the pre-change operator — a restart from
    * an old checkpoint location fails on the state-encoder schema and
    * timeout-mode check. Round 12 added the [[StateSchemaVersion]]
    * stamp (`ver`, v3) — itself one more such boundary, and the
    * reason future SEMANTIC changes under an unchanged field layout
    * fail fast via [[checkStateVersion]] instead of corrupting
    * silently. Jobs upgrading across any of these boundaries must
    * start a NEW checkpoint location (and, if continuity matters,
    * replay the retained event horizon into it); there is no in-place
    * state migration. */
  def funnelStream(events: Dataset[Event], steps: Seq[String],
                   watermark: String = "1 hour",
                   maxKeep: Int = 64,
                   retentionMs: Long = 30L * 24 * 3600 * 1000): Dataset[FunnelUpdate] = {
    import events.sparkSession.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val k = steps.size
    // chain law, shared by the update and timeout paths:
    // t_i = min step-i time strictly after t_{i-1}
    def chainOf(times: Seq[Seq[Long]]): Array[Option[Long]] = {
      val chain = Array.fill[Option[Long]](k)(None)
      for (i <- 0 until k) {
        val floor = if (i == 0) Long.MinValue
          else chain(i - 1).getOrElse(Long.MaxValue)
        chain(i) =
          if (i > 0 && chain(i - 1).isEmpty) None
          else times(i).find(_ > floor)
      }
      chain
    }
    def updateOf(userId: Long, chain: Array[Option[Long]]): FunnelUpdate = {
      val stage = chain.takeWhile(_.isDefined).length
      FunnelUpdate(userId, stage, chain.toSeq.take(stage).map(_.get))
    }
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelUpdate](
        GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // retention horizon passed with no new events: emit the
            // settled progress one last time and drop the state.
            val s = state.get
            checkStateVersion(s.ver, "FunnelState")
            val fin = updateOf(userId, chainOf(s.times))
            state.remove()
            fin
          } else {
            val prevState = state.getOption
            prevState.foreach(s => checkStateVersion(s.ver, "FunnelState"))
            val prev = prevState.map(_.times)
              .getOrElse(Seq.fill(k)(Seq.empty[Long]))
            val freshRows = rows.toSeq
            val fresh = freshRows
              .flatMap(e => stepIdx.get(e.event_type).map(_ -> e.ts.getTime))
              .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
            var times = (0 until k).map(i =>
              (prev(i) ++ fresh.getOrElse(i, Nil)).distinct.sorted)
            val chain = chainOf(times)
            // prune dead candidates: anything above the settled t_i can
            // never become the min (t_{i-1} only decreases); cap the rest
            times = (0 until k).map { i =>
              val kept = chain(i) match {
                case Some(t) => times(i).filter(_ <= t)
                case None => times(i)
              }
              kept.take(maxKeep)
            }
            // retention clock: EVERY event (funnel step or not) counts
            // as user activity; the timeout must sit strictly above the
            // current watermark or Spark rejects it.
            val lastMs = (prevState.map(_.lastMs).getOrElse(0L) +:
              freshRows.map(_.ts.getTime)).max
            state.update(FunnelState(times, lastMs))
            state.setTimeoutTimestamp(
              math.max(lastMs + retentionMs, state.getCurrentWatermarkMs + 1))
            updateOf(userId, chain)
          }
      }
  }

  /** Streaming dedup on a key within the watermark horizon: the
    * streaming face of exact dedup (state = seen keys inside the
    * watermark window; expired automatically — bounded state at any
    * input volume). */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream interval join: each purchase joined to the same
    * user's signups within [signup, signup + horizon]. Both sides
    * watermarked so join state is reaped. */
  def purchaseSignupJoin(events: DataFrame, horizonSeconds: Long = 3600,
                         watermark: String = "1 hour"): DataFrame = {
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    val signups = events.where(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("event_id").as("signup_id"), col("ts").as("s_ts"))
      .withWatermark("s_ts", watermark)
    purchases.join(signups,
      col("user_id") === col("s_user") &&
        col("p_ts") >= col("s_ts") &&
        col("p_ts") <= col("s_ts") + expr(s"INTERVAL $horizonSeconds SECONDS"))
      .select("purchase_id", "user_id", "signup_id")
  }

  /** Batch oracle for [[sessionize]]: the same session definition
    * computed with plain windows — used by both the spec and any
    * backfill job (identical semantics across the batch/stream seam;
    * includes the final still-open session per user, which the
    * streaming job only emits on timeout). */
  def sessionizeBatch(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ms", lag((col("ts").cast("double") * 1000).cast("long"), 1).over(w))
      .withColumn("ms", (col("ts").cast("double") * 1000).cast("long"))
      .withColumn("new_s", when(col("prev_ms").isNull ||
        col("ms") - col("prev_ms") > gapSeconds * 1000, 1L).otherwise(0L))
      .withColumn("session_id", sum("new_s").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .drop("session_id")
  }
}

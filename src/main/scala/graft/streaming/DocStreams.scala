package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Streaming face of the curation tier — continuous-ingest curation
  * for a document stream with schema (doc_id, ts, text, ...).
  *
  * The scoring/scrubbing operators ([[TextFunctions]]) are stateless
  * Column expressions, so the SAME functions that curate a batch
  * corpus curate an unbounded stream with no code change, no state,
  * and bit-identical results (the spec pins streamed == batch on the
  * same rows). Content dedup is the one stateful stage: keyed by a
  * 64-bit content digest, first-occurrence-wins, state bounded by the
  * watermark horizon via [[EventStreams.dedupStream]].
  *
  * At continuous-crawl scale this is the shape: score + scrub run
  * map-side inside the stream's tasks (codegen'd regexp/array
  * builtins, embarrassingly parallel), only the digest — not the
  * document — is dedup state, and the curated stream feeds
  * `Sinks.assignTrainingShards`-style export downstream of the sink.
  */
object DocStreams {

  /** Stateless score-and-scrub: quality-filter at `minQuality`, then
    * project language-ID, token count, hashed-linear classifier score
    * (on the ORIGINAL text, before scrubbing — the model saw unredacted
    * training data), and PII-redacted text. Works identically on a
    * batch frame and a `readStream` frame. */
  def curateStream(docs: DataFrame, minQuality: Double): DataFrame =
    docs
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .where(col("quality") >= minQuality)
      .select(col("doc_id"), col("ts"), round(col("quality"), 6).as("quality"),
        TextFunctions.langId(TextFunctions.tokens(col("text"))).as("pred_lang"),
        TextFunctions.tokenCount(col("text")).as("n_tok"),
        TextFunctions.hashedLinearScore(col("text"), 262144).as("clf_score"),
        TextFunctions.redactPii(col("text")).as("text"))

  /** Curation + content dedup: [[curateStream]] then
    * first-occurrence-wins on the xxhash64 digest of the REDACTED
    * text within the watermark horizon (dedup after scrubbing, so two
    * docs differing only in their PII spans collapse — the same
    * normalize-then-digest order a batch pipeline uses). */
  def curateDedupStream(docs: DataFrame, minQuality: Double,
                        watermark: String = "30 minutes"): DataFrame =
    EventStreams.dedupStream(
      curateStream(docs, minQuality).withColumn("digest", xxhash64(col("text"))),
      Seq("digest"), watermark).drop("digest")

  /** Trained-classifier serving on a stream: score documents with the
    * micro-unit weights trained in batch by [[graft.operators
    * .Training]] — the train-in-batch / serve-on-stream contract. The
    * weight array rides the task closure (dim+1 longs); scoring is
    * ONE stateless native feature pass + codegen'd fold per row — no
    * state, no shuffle, bit-identical on a batch frame and a
    * `readStream` frame (StreamingSpec pins it). Retraining swaps the
    * array on the next query restart; the plan shape never changes
    * (the same swap-in contract as `hashedLinearScoreTrained`). */
  def classifyStream(docs: DataFrame, wMicro: Array[Long]): DataFrame = {
    val (pq, keep) = graft.operators.Training.scoreLogReg(col("text"), wMicro)
    docs.select(col("doc_id"), col("ts"), pq.as("pq"), keep.as("pred_keep"))
  }

  /** Streaming INCREMENTAL dedup: drop stream rows whose md5 text
    * digest already exists in a persisted [[graft.operators.Dedup
    * .writeDigestIndex]] corpus index (stream-static anti-join — the
    * static side is re-readable per micro-batch, so appending to the
    * index between batches tightens the filter without restarting the
    * query), then first-occurrence-wins WITHIN the stream under the
    * watermark horizon. The streaming face of
    * [[graft.operators.Dedup.incrementalNewUniques]]: a continuous
    * crawl dedups against the historical corpus the moment documents
    * arrive, state bounded by (watermark-horizon distinct digests),
    * never by corpus size. */
  def incrementalDedupStream(docs: DataFrame, index: DataFrame,
                             watermark: String = "30 minutes"): DataFrame =
    EventStreams.dedupStream(
      docs.withColumn("digest", md5(col("text").cast("binary")))
        .join(index, Seq("digest"), "left_anti"),
      Seq("digest"), watermark).drop("digest")
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus vocabulary building and per-document keyword extraction —
  * the term-statistics stage of a training-data pipeline (tokenizer
  * vocab candidates, document keywords, corpus-frequency features).
  *
  * Scale shape: both operators are explode → hash-aggregate pipelines.
  * The token aggregation gets map-side partial aggregation for free
  * (a 100 TB corpus has ~10^6–10^8 distinct tokens, so the partials
  * collapse hard before the shuffle); `vocabulary`'s top-N is a
  * TakeOrderedAndProject (per-partition heap + driver merge of N×P
  * rows), never a full sort; `topTerms`' per-document top-k is a
  * window rank that Spark 4 executes as WindowGroupLimit (per-group
  * heap pushed below the final sort). */
object TfIdf {

  /** Global token frequencies, top `topN` by (count DESC, token ASC).
    * The full ordering is deterministic — `token` is unique after the
    * aggregate — so the selected set is engine-independent. */
  def vocabulary(docs: DataFrame, textCol: String, topN: Int): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(topN)

  /** Per-document out-of-vocabulary rate under the corpus's own
    * top-`vocabSize` [[vocabulary]] — the coverage signal that sizes a
    * tokenizer vocabulary (what share of running tokens would fall to
    * byte/unk fallback). The vocab is a ≤`vocabSize`-row broadcast;
    * the OOV count is a broadcast anti-join on the token stream, so
    * the only shuffle is the per-doc count aggregation (map-side
    * partials). Docs with zero non-empty tokens produce no row (they
    * have no coverage to measure). */
  def vocabCoverage(docs: DataFrame, idCol: String, textCol: String,
                    vocabSize: Int): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
    val vocab = vocabulary(docs, textCol, vocabSize).select("token")
    val perDoc = toks.groupBy(idCol).agg(count(lit(1)).as("n_tok"))
    val oov = toks.join(broadcast(vocab), Seq("token"), "left_anti")
      .groupBy(idCol).agg(count(lit(1)).as("oov_n"))
    perDoc.join(oov, Seq(idCol), "left")
      .select(col(idCol), col("n_tok"),
        coalesce(col("oov_n"), lit(0L)).as("n_oov"),
        round(coalesce(col("oov_n"), lit(0L)) / col("n_tok"), 6).as("oov_rate"))
  }

  /** Top-`k` terms per document by tf-idf.
    *
    * The default idf is the RATIONAL form `(N + 1) / (df + 1)`: every
    * step (long→double widening, one add, one divide, one multiply) is
    * a single correctly-rounded IEEE-754 operation, so scores — and
    * therefore ranks — are bit-identical across engines, which is what
    * lets the driver hash-gate this path. `lnIdf = true` switches to
    * the textbook `ln((N+1)/(df+1))` (same ranking when tf = 1;
    * spec-checked, not driver-gated: `ln` is correctly rounded on
    * neither engine and a 1-ulp disagreement could flip a rank).
    *
    * Ties (equal tf AND equal df give exactly equal doubles) break on
    * token ASC, so the emitted set is deterministic. */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int,
               lnIdf: Boolean = false): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"), explode(TextFunctions.tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    // Corpus size as a broadcast 1-row frame: keeps the whole operator
    // one lazy plan (no driver-side count() action).
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val rawScore = col("tf") * (col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))
    val score = if (lnIdf) col("tf") * log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0)))
                else rawScore
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("token").asc)
    tf.join(df, "token")
      .crossJoin(broadcast(n))
      .withColumn("score", score)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("doc_id"), col("token"), col("tf"),
        round(col("score"), 6).as("score"), col("rk"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level n-gram language-model scoring for quality filtering —
  * the CCNet-style "perplexity bucket" signal: documents whose tokens
  * are improbable under a LM trained on the corpus itself score high
  * (gibberish, boilerplate soup), probable text scores low. Here the LM
  * is the exact unigram MLE over the corpus's own whitespace tokens;
  * the score is average surprisal in bits per token.
  *
  * Reference anchor: the reference engine distributes work then reduces
  * locally before shipping (/root/reference/src/mapreduce.jl:218-231,
  * per-worker fold then tree reduce); here the same discipline appears
  * as map-side partial counts per token and per (doc, token) before
  * either shuffle.
  *
  * Determinism: floating-point addition is not associative, so a
  * distributed sum of raw `log2 p` values would hash-differently run to
  * run. Instead each token's log-prob is quantized ONCE to an integer
  * (round(log2(p) * 1e9)) and all aggregation is integer arithmetic —
  * order-independent, so the 6-dp score is cross-engine exact.
  *
  * Scale shape (100 TB): token counts and (doc, token) counts both
  * partial-aggregate map-side, so hot stopword keys ship one row per
  * partition; the vocab-side join is keyed on token with the DISTINCT
  * per-doc token set (not every occurrence), and AQE may broadcast the
  * vocab when it fits. No driver-side collection anywhere.
  */
object LanguageModel {

  /** (idCol, n_tok, bits_per_token): average unigram surprisal of each
    * document under the corpus MLE unigram model. */
  def unigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol),
      explode(split(trim(col(textCol)), "\\s+")).as("token"))
    val cnt = tok.groupBy("token").agg(count(lit(1)).as("c"))
    val total = cnt.agg(sum(col("c")).as("total"))
    // one quantized log-prob per vocab entry; total is a 1-row frame
    val lp = cnt.crossJoin(broadcast(total)).select(col("token"),
      round(log2(col("c") / col("total")) * 1e9, 0).cast("long").as("li"))
    val docTok = tok.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("nt"))
    docTok.join(lp, "token")
      .groupBy(col(idCol))
      .agg(sum(col("nt")).as("n_tok"), sum(col("nt") * col("li")).as("s"))
      .select(col(idCol), col("n_tok"),
        round(-col("s") / 1e9 / col("n_tok"), 6).as("bits_per_token"))
  }
}

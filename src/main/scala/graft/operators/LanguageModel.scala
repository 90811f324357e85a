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
      graft.functions.Quantize.quantize(log2(col("c") / col("total")), 9).as("li"))
    val docTok = tok.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("nt"))
    docTok.join(lp, "token")
      .groupBy(col(idCol))
      .agg(sum(col("nt")).as("n_tok"), sum(col("nt") * col("li")).as("s"))
      .select(col(idCol), col("n_tok"),
        round(-col("s") / 1e9 / col("n_tok"), 6).as("bits_per_token"))
  }

  /** (idCol, n_bigrams, bits_per_bigram): average CONDITIONAL bigram
    * surprisal −1/(n−1) Σ log₂ p(wᵢ | wᵢ₋₁) under the corpus's own
    * exact bigram MLE, p(w₂|w₁) = c(w₁w₂) / Σ_w c(w₁w) — the
    * next-order CCNet-style LM signal above [[unigramSurprisal]]
    * (repetitive templates score near 0 bits; token soup scores high).
    * The normalizer is the bigram-PREFIX count, so per-prefix
    * probabilities sum to exactly 1 and in-corpus scoring meets no
    * zero probability — no smoothing knob to pick or reproduce.
    * Documents with fewer than two tokens have no bigrams and drop out.
    *
    * Same determinism law as [[unigramSurprisal]]: each conditional
    * log-prob is quantized once to an integer (round(log₂ p · 1e9)) so
    * every distributed sum is order-independent and the 6-dp score is
    * cross-engine exact.
    *
    * Scale shape: the bigram explode is one `posexplode` pass over the
    * token array (w₂ = element_at(ws, pos+2), plain codegen'd
    * expressions — no interpreted higher-order lambda, no self-join,
    * no window over positions). Scoring sums `li` directly over
    * occurrences — Σ_occurrences li ≡ Σ_pairs nt·li, so no
    * per-(doc,bigram) distinct aggregation exists at all; the one
    * occurrence-sized aggregate is keyed by the LONG doc id and
    * partial-aggregates map-side to ~one row per doc. (The first shape
    * grouped occurrences by (doc, w₁, w₂) — a string-keyed shuffle of
    * nearly every occurrence, measured 20 s of a 40 s sf3 pass; this
    * shape cut the whole query to ~27 s.) The model side is keyed on
    * distinct (w₁,w₂): AQE broadcasts it while it fits and falls back
    * to a shuffle join beyond — at which point the occurrence frame
    * was shipping through a shuffle either way. */
  def bigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    def big = df.select(col(idCol), split(trim(col(textCol)), "\\s+").as("ws"))
      .select(col(idCol), col("ws"), posexplode(col("ws")))
      .where(col("pos") < size(col("ws")) - 1)
      .select(col(idCol), col("col").as("w1"),
        element_at(col("ws"), col("pos") + 2).as("w2"))
    val cb = big.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = cb.groupBy("w1").agg(sum(col("c2")).as("c1"))
    val lp = cb.join(c1, "w1").select(col("w1"), col("w2"),
      graft.functions.Quantize.quantize(log2(col("c2") / col("c1")), 9).as("li"))
    big.join(lp, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("li")).as("s"))
      .select(col(idCol), col("n_bigrams"),
        round(-col("s") / 1e9 / col("n_bigrams"), 6).as("bits_per_bigram"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Full-text retrieval: BM25 top-k scoring of a small query set
  * against the document corpus — the lexical-search counterpart of the
  * embedding ANN tier (`Similarity`), and the standard first stage of
  * hybrid retrieval / hard-negative mining over a training corpus.
  *
  * Scoring law (Robertson/Lucene BM25, the `ln(1 + ...)` non-negative
  * idf form): for query q and doc d,
  * `score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))`
  * with `idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))`.
  *
  * Determinism: per-term contributions are quantized to integer
  * micro-units (`round(c·1e6)` as long) and summed as longs, so the
  * score is independent of term order and partitioning (the same
  * trick as [[LanguageModel]]'s quantized log-probs); `avgdl` is
  * derived from the EXACT long token-count sum (one double division),
  * never a float `avg` whose summation order varies by engine.
  *
  * Scale shape (small query set — the hard-negative / eval-retrieval
  * case): the corpus is NEVER shuffled for scoring. Global stats (N,
  * Σdl) are one partial-aggregated 1-row frame; per-term df aggregates
  * only tokens that survive a broadcast semi-join against the query
  * vocabulary (≤|Q| keys, map-side partials); scoring is a per-row
  * loop over the broadcast term array (O(|q terms| · dl) per doc, all
  * codegen'd builtins); the only row-count shuffle is the per-query
  * top-k window over |Q|·N (query_id, doc, score) rows, which Spark 4
  * executes as WindowGroupLimit — a per-partition k-heap BEFORE the
  * exchange, so ~|Q|·k·P rows move, not |Q|·N. For |Q| in the
  * millions one would flip to the postings-join (explode + shuffle on
  * token) plan instead; that regime is [[TfIdf]]'s shape. */
object Search {

  /** Top-`k` docs per query by BM25. `queries` is a SMALL frame
    * `(query_id: long, terms: array<string>)` (it is broadcast and its
    * distinct terms drive a broadcast semi-join; hundreds of queries,
    * not millions). Ties break to the lower doc id. Output:
    * `(query_id, doc_id, rank, score)`. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val ws = TextFunctions.tokens(col(textCol))
    val base = docs.select(col(idCol), ws.as("ws"),
      size(ws).cast("long").as("dl"))

    // Global stats: exact long sum of doc lengths -> one double divide.
    val stats = base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))

    // Per-term document frequency, restricted to the query vocabulary
    // by a broadcast semi-join before the aggregate.
    val qterms = queries.select(explode(col("terms")).as("token")).distinct()
    val dfc = base.select(explode(array_distinct(col("ws"))).as("token"))
      .join(broadcast(qterms), Seq("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
    val termIdf = dfc.crossJoin(broadcast(stats))
      .select(col("token"),
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          .as("idf"))

    // Re-assemble each query as a rank-ordered array of (term, idf)
    // structs; a term absent from the corpus contributes idf 0 (its tf
    // is 0 everywhere anyway).
    val qExploded = queries.select(col("query_id"),
        posexplode(col("terms")).as(Seq("pos", "token")))
      .join(broadcast(termIdf), Seq("token"), "left")
      .select(col("query_id"), col("pos"), col("token"),
        coalesce(col("idf"), lit(0.0)).as("idf"))
    val qPacked = qExploded.groupBy("query_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("token"), col("idf"))))
        .as("qts"))

    // Score every (doc, query) pair row-locally against the broadcast
    // query array; quantized-long term sum for order independence.
    val dlNorm = lit(k1) * (lit(1.0) - lit(b) +
      lit(b) * col("dl").cast("double") / (col("sum_dl").cast("double") / col("n_docs")))
    def contrib(t: Column): Column = {
      val tf = size(filter(col("ws"), w => w === t.getField("token"))).cast("double")
      round(t.getField("idf") * tf * lit(k1 + 1.0) / (tf + col("_dl_norm")) * 1e6, 0)
        .cast("long")
    }
    val scored = base.crossJoin(broadcast(stats))
      .withColumn("_dl_norm", dlNorm)
      .crossJoin(broadcast(qPacked))
      .select(col("query_id"), col(idCol),
        (aggregate(col("qts"), lit(0L), (acc, t) => acc + contrib(t)) / 1e6)
          .as("score"))

    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col(idCol).asc)
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col("query_id"), col(idCol), col("rnk"),
        round(col("score"), 6).as("score"))
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{Dedup, Multimodal, Similarity}

/** Training-data-pipeline queries over `documents` and `embeddings`:
  * text analysis, deduplication, similarity search, multimodal
  * plumbing. SQL-expressible ops carry an exact DuckDB oracle; the
  * LSH/SimHash/multimodal ops are rows-only here and get brute-force
  * oracles in the ScalaTest specs instead.
  */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def embs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting + quality scoring (whitespace + ratio features).
    "txt_tokens" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        length(col("text")).as("len"))),

    "txt_quality" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextFunctions.avgWordLen(col("text")).as("avg_word_len"),
        TextFunctions.stopwordRatio(TextFunctions.tokens(col("text"))).as("stop_ratio"),
        TextFunctions.qualityScore(col("text")).as("quality"))),

    // BPE-ish token counting: letter runs / digit runs / single
    // punctuation — the GPT-2-style pre-tokenizer approximation.
    "txt_tokens_bpe" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        size(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)"))
          .as("n_bpe_tokens"))),

    // Winnowing (rolling-hash) fingerprint — shared hash => shared long
    // substring; rows-only (native expr; spec checks the law).
    "fp_winnow" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        size(graft.functions.NativeExprs.winnowFingerprintNative(col("text"))).as("n_grams"))),

    // End-to-end training-data prep: quality-filter then per-language
    // corpus stats — the composition a real pipeline runs.
    "q_quality_filter" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("quality", TextFunctions.qualityScore(col("text")))
        .where(col("quality") >= 0.3)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text")).cast("long")).as("total_tokens"),
          round(avg("quality"), 6).as("avg_quality"))),

    // Language-ID heuristic (stopword profiles, deterministic argmax).
    "txt_langid" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextFunctions.langId(TextFunctions.tokens(col("text"))).as("pred_lang"))),

    // Document fingerprint (1-perm MinHash over 8-gram shingles).
    "fp_minhash1" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextFunctions.minhashFingerprint(col("text"), 8).as("fp"))),

    // Exact dedup: representative + count per distinct text.
    "dd_exact" -> ((s, dir) =>
      Dedup.exact(docs(s, dir), "doc_id", "text")),

    // Fingerprint-blocked exact token-Jaccard near-dup pairs.
    "dd_fp_jaccard" -> ((s, dir) =>
      Dedup.fingerprintJaccardPairs(docs(s, dir), "doc_id", "text", 8)),

    // MinHash + LSH near-dup pairs (rows-only; spec has brute-force oracle).
    "dd_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashNearDupPairs(docs(s, dir), "doc_id", "text",
        threshold = 0.35, numHashes = 128, bands = 32, rowsPerBand = 4)),

    // SimHash near-dup pairs (rows-only; spec has brute-force oracle).
    "dd_simhash" -> ((s, dir) =>
      Dedup.simhashNearDupPairs(docs(s, dir), "doc_id", "text", maxHamming = 4)),

    // Embedding near-dup: cosine >= 0.4 within label blocks.
    "dd_embed_cosine" -> ((s, dir) =>
      Dedup.embeddingNearDupPairs(embs(s, dir), "vec_id", "embedding",
        "label", threshold = 0.4)),

    // Full dedup: minhash pairs -> connected components -> survivors.
    // Rows-only (spec holds the BFS oracle); output is the surviving
    // doc ids with their cluster count.
    "dd_survivors" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.minhashNearDupPairs(d, "doc_id", "text", threshold = 0.5)
      graft.operators.ConnectedComponents.dropNearDuplicates(d, "doc_id", pairs)
        .agg(count(lit(1)).as("n_survivors"), min("doc_id").as("min_id"),
          max("doc_id").as("max_id"))
    }),

    // Embedding near-dup blocked by hyperplane-LSH buckets (the scale
    // path: no label needed; rows-only, recall checked in spec).
    "dd_embed_lsh" -> ((s, dir) => {
      val e = embs(s, dir).withColumn("bkt",
        Similarity.hyperplaneBucket(col("embedding"), dim = 64, bits = 6))
      Dedup.embeddingNearDupPairs(e, "vec_id", "embedding", "bkt", threshold = 0.3)
    }),

    // Brute-force exact cosine top-5 for the first 10 vectors.
    "knn_cosine" -> ((s, dir) => {
      val e = embs(s, dir)
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("vec"))
      val c = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.cosineTopK(q, c, k = 5)
        .select(col("qid"), col("id"), col("rk"))
    }),

    // ANN (hyperplane-LSH) top-3 — rows-only; spec checks recall vs exact.
    "knn_ann" -> ((s, dir) => {
      val e = embs(s, dir)
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("vec"))
      val c = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.annTopK(q, c, k = 3, dim = 64, bits = 4)
        .select(col("qid"), col("id"), col("rk"))
    }),

    // Per-label embedding centroid via the typed VectorMean Aggregator
    // (map-side partial aggregation; one buffer per label/partition).
    // First four dims exposed for the oracle.
    "emb_centroid" -> ((s, dir) => {
      val cent = embs(s, dir)
        .select(col("label"), col("embedding").cast("array<double>").as("v"))
        .groupBy("label")
        .agg(graft.functions.VectorAgg.vectorMean(col("v")).as("c"),
          count(lit(1)).as("n"))
      cent.select(col("label"), col("n"),
        round(element_at(col("c"), 1), 6).as("c1"),
        round(element_at(col("c"), 2), 6).as("c2"),
        round(element_at(col("c"), 3), 6).as("c3"),
        round(element_at(col("c"), 4), 6).as("c4"))
    }),

    // Multimodal plumbing: binary payload → stub decode → aggregate.
    "mm_decode_stats" -> ((s, dir) => {
      val media = Multimodal.fromDocuments(docs(s, dir), "doc_id", "text", "source")
      Multimodal.decodeImages(media)
        .groupBy(col("meta.source").as("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("width").cast("long")).as("sum_w"),
          sum(col("height").cast("long")).as("sum_h"))
    }))

  val oracleSql: Map[String, String] = Map(
    "txt_tokens" ->
      """SELECT doc_id, CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_tokens,
        |       CAST(length(text) AS INT) AS len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "txt_quality" ->
      """SELECT doc_id,
        |  round(CAST(length(regexp_replace(trim(text), '\s+', '', 'g')) AS DOUBLE)
        |        / len(regexp_split_to_array(trim(text), '\s+')), 6) AS avg_word_len,
        |  round(CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |        t -> t IN ('the','a','an','of','and','in','to','is'))) AS DOUBLE)
        |        / len(regexp_split_to_array(trim(text), '\s+')), 6) AS stop_ratio,
        |  round(least(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE), 200.0) / 200.0 *
        |        (1.0 - CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |        t -> t IN ('the','a','an','of','and','in','to','is'))) AS DOUBLE)
        |        / len(regexp_split_to_array(trim(text), '\s+'))), 6) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_quality_filter" ->
      """WITH q AS (
        |  SELECT doc_id, lang,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS n_tok,
        |    round(least(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE), 200.0) / 200.0 *
        |          (1.0 - CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |          t -> t IN ('the','a','an','of','and','in','to','is'))) AS DOUBLE)
        |          / len(regexp_split_to_array(trim(text), '\s+'))), 6) AS quality
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
        |  round(avg(quality), 6) AS avg_quality
        |FROM q WHERE quality >= 0.3 GROUP BY 1 ORDER BY 1""".stripMargin,

    "txt_tokens_bpe" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]', 0)) AS INT) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "txt_langid" ->
      """WITH sc AS (
        |  SELECT doc_id,
        |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |        t -> t IN ('the','a','of','and','in','to','is'))) AS s_en,
        |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |        t -> t IN ('der','die','das','und','ist','ein'))) AS s_de,
        |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |        t -> t IN ('le','la','les','et','est','un'))) AS s_fr
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN greatest(s_en, s_de, s_fr) = 0 THEN 'und'
        |       WHEN s_en = greatest(s_en, s_de, s_fr) THEN 'en'
        |       WHEN s_de = greatest(s_en, s_de, s_fr) THEN 'de'
        |       ELSE 'fr' END AS pred_lang
        |FROM sc ORDER BY doc_id""".stripMargin,

    "fp_minhash1" ->
      """SELECT doc_id,
        |  list_min(list_transform(
        |    list_distinct(list_transform(range(1, greatest(length(text) - 7, 1) + 1),
        |                                 i -> substr(text, i, 8))),
        |    s -> md5(s))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "dd_exact" ->
      """SELECT md5(text) AS h, CAST(min(doc_id) AS BIGINT) AS keep_id, count(*) AS n
        |FROM documents GROUP BY text ORDER BY h""".stripMargin,

    "dd_fp_jaccard" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    list_min(list_transform(
        |      list_distinct(list_transform(range(1, greatest(length(text) - 7, 1) + 1),
        |                                   i -> substr(text, i, 8))),
        |      s -> md5(s))) AS fp,
        |    list_distinct(regexp_split_to_array(trim(text), '\s+')) AS toks
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |        / len(list_distinct(list_concat(a.toks, b.toks))), 6) AS jaccard
        |FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |ORDER BY 1, 2""".stripMargin,

    "emb_centroid" ->
      """SELECT label, count(*) AS n,
        |  round(AVG(embedding[1]::DOUBLE), 6) AS c1,
        |  round(AVG(embedding[2]::DOUBLE), 6) AS c2,
        |  round(AVG(embedding[3]::DOUBLE), 6) AS c3,
        |  round(AVG(embedding[4]::DOUBLE), 6) AS c4
        |FROM embeddings GROUP BY 1 ORDER BY 1""".stripMargin,

    "dd_embed_cosine" ->
      """WITH v AS (
        |  SELECT vec_id, label, embedding,
        |    sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
        |  FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_sum(list_transform(range(1, len(a.embedding) + 1),
        |        i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) / (a.nrm * b.nrm), 6) AS sim
        |FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE round(list_sum(list_transform(range(1, len(a.embedding) + 1),
        |        i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) / (a.nrm * b.nrm), 6) >= 0.4
        |ORDER BY 1, 2""".stripMargin,

    "knn_cosine" ->
      """WITH v AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
        |  FROM embeddings),
        |pairs AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS id,
        |    round(list_sum(list_transform(range(1, len(q.embedding) + 1),
        |          i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)) / (q.nrm * c.nrm), 9) AS sim
        |  FROM v q JOIN v c ON q.vec_id < 10 AND c.vec_id != q.vec_id)
        |SELECT qid, id, CAST(rk AS INT) AS rk FROM (
        |  SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id) AS rk
        |  FROM pairs) WHERE rk <= 5 ORDER BY qid, rk""".stripMargin)
}

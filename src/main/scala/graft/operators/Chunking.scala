package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Passage chunking: split each document into fixed-size token windows
  * with overlap — the retrieval/context-window preparation stage of a
  * training-data pipeline (RAG passage extraction, long-doc splitting
  * for a fixed-context model, embedding-input windows).
  *
  * Chunk law (deterministic, engine-independent): with `ws` the
  * whitespace tokens of the trimmed text (n = |ws|), chunk `i`
  * (0-based) covers tokens `[i*stride, min(i*stride + window, n))`;
  * the number of chunks is `1 + max(0, ceildiv(n - window, stride))`,
  * so every document yields at least one chunk, every token is covered
  * (stride <= window), and the final chunk may be short but always
  * reaches the tail. With window=64 / stride=48 adjacent chunks share
  * a 16-token overlap.
  *
  * Scale shape: pure map — tokenize, `posexplode` over the chunk
  * index range, `slice` per chunk — all codegen'd builtins, no
  * shuffle, no state. On a 100 TB corpus this runs at scan speed and
  * partitions by input split; the only output-size consideration is
  * the ~window/stride duplication factor (1.33x here), which is the
  * operator's contract, not an artifact. Emitting the md5 of the
  * joined chunk (not the chunk text) keeps downstream shuffles (e.g.
  * chunk-level dedup) at 32 B/row rather than re-shipping text. */
object Chunking {

  /** One row per (doc, chunk): id, chunk_id, start token offset, token
    * count, md5 fingerprint of the space-joined chunk. */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  window: Int, stride: Int): DataFrame =
    chunked(docs, idCol, textCol, window, stride) { chunk =>
      Seq(md5(concat_ws(" ", chunk).cast("binary")).as("chunk_hash"))
    }

  /** [[chunkTokens]] carrying the chunk TEXT (space-joined tokens)
    * instead of its fingerprint — the passage-extraction form whose
    * output feeds retrieval/embedding directly. Output duplicates
    * ~window/stride of the corpus text by contract; prefer
    * [[chunkTokens]] when downstream only needs chunk identity. */
  def chunkTokensWithText(docs: DataFrame, idCol: String, textCol: String,
                          window: Int, stride: Int): DataFrame =
    chunked(docs, idCol, textCol, window, stride) { chunk =>
      Seq(concat_ws(" ", chunk).as("chunk_text"))
    }

  private def chunked(docs: DataFrame, idCol: String, textCol: String,
                      window: Int, stride: Int)
                     (payload: Column => Seq[Column]): DataFrame = {
    require(window >= 1, "window must be >= 1")
    require(stride >= 1 && stride <= window,
      "stride must be in [1, window] (stride > window would skip tokens)")
    // ceildiv(n - window, stride) via integral `div` (Column `/` is
    // double division — exact only below 2^53); greatest(0) guards
    // short docs (n <= window -> exactly one chunk).
    val lastChunk = greatest(lit(0L),
      expr(s"(cast(size(ws) as bigint) - $window + $stride - 1) div $stride"))
    val chunk = slice(col("ws"), (col("chunk_id") * stride + 1).cast("int"), lit(window))
    docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("ws"))
      .select(col(idCol), col("ws"),
        explode(sequence(lit(0L), lastChunk)).as("chunk_id"))
      .select(Seq(col(idCol), col("chunk_id"),
        (col("chunk_id") * stride).as("tok_start"),
        size(chunk).cast("long").as("n_tok")) ++ payload(chunk): _*)
  }
}

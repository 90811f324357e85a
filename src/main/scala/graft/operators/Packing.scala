package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign documents to
  * fixed token-budget training sequences.
  *
  * This is the standard "concatenate the token stream, then chunk every
  * `budget` tokens" formulation (what most LLM pre-training preps do):
  * deterministic given the ordering key, one range-partitioned sort —
  * no driver loop, no per-bin state. Each document gets the sequence
  * index its FIRST token lands in plus its offset inside that sequence;
  * a document longer than the budget simply spans sequences (the
  * consumer slices it), so nothing is dropped and bins have zero
  * fragmentation by construction.
  *
  * Scale: the only wide operation is the global sort behind the window
  * cumsum (range partitioning). At 100 TB, pre-partition by a coarse
  * shard column and pack per shard (`packBy`) — sequence ids are then
  * (shard, seq) pairs and the sort is shard-local.
  */
object Packing {

  /** (docs + seq, seq_offset) for a global contiguous packing ordered
    * by `orderCol`. `seq` = 0-based sequence index of the document's
    * first token; `seq_offset` = its token offset inside that sequence. */
  def contiguousPack(docs: DataFrame, tokenCol: String, budget: Long,
                     orderCol: String): DataFrame =
    packed(docs, tokenCol, budget, Window.orderBy(col(orderCol)), Nil)

  /** Shard-local packing: the sort (and the resulting sequence ids)
    * live inside each value of `shardCol` — the scale path. */
  def packBy(docs: DataFrame, tokenCol: String, budget: Long,
             orderCol: String, shardCol: String): DataFrame =
    packed(docs, tokenCol, budget,
      Window.partitionBy(col(shardCol)).orderBy(col(orderCol)), Seq(shardCol))

  private def packed(docs: DataFrame, tokenCol: String, budget: Long,
                     w: org.apache.spark.sql.expressions.WindowSpec,
                     shardCols: Seq[String]): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val before = coalesce(
      sum(col(tokenCol)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L)).cast("long")
    docs
      .withColumn("tok_before", before)
      .withColumn("seq", (col("tok_before") / budget).cast("long"))
      .withColumn("seq_offset", col("tok_before") % budget)
      .drop("tok_before")
  }

  /** Per-sequence summary: how many documents and tokens each packed
    * sequence holds (every sequence except the last is exactly full
    * when counting spanned tokens — this counts DOC-START tokens, the
    * usual packing-efficiency report). */
  def packStats(packedDocs: DataFrame, tokenCol: String,
                shardCols: Seq[String] = Nil): DataFrame = {
    val keys: Seq[Column] = shardCols.map(col) :+ col("seq")
    packedDocs.groupBy(keys: _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).cast("long").as("n_tokens"),
        min(col("seq_offset")).as("first_offset"))
  }
}

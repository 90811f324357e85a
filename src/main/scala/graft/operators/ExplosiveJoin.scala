package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The library's single most important scale idiom, in one place: the
  * countermeasures for OUTPUT-EXPLOSIVE bucket joins — joins whose
  * shuffle input is corpus-sized but whose output is
  * sum-of-bucket-size² pairs (LSH band pairing, fingerprint blocks,
  * hyperplane buckets, k-NN candidate generation).
  *
  * AQE plans exchanges by their shuffle-INPUT byte volume, which for
  * these joins is a wild under-estimate of the work downstream: it
  * coalesces the modest bucket rows into a handful of tasks that then
  * each materialize millions of join rows serially, and a hot bucket
  * is one indivisible hash key no re-plan can split. Two
  * countermeasures, both required (measured 16 s -> 2.6 s at 20k
  * vectors / 32 cores; knn_join sf3 92 -> 7.3 s):
  *
  *  1. Sub-block CHUNKING: the probe side replicates each row over
  *     `chunks` sub-chunk keys while the build side hashes each row
  *     into exactly one, so every (probe, build) pair still meets in
  *     exactly one chunk but a hot bucket's quadratic work spreads
  *     over `chunks`× more join keys.
  *  2. An EXPLICIT `repartition(n, keys)` on both sides: a user-pinned
  *     partition count is the one exchange shape AQE does not coalesce
  *     away.
  */
object ExplosiveJoin {

  /** Partition count pinned against AQE coalescing, for any exchange
    * feeding output-explosive work: 2× the session's shuffle
    * partitions (headroom for the expansion), floored at `floor`. */
  def pinnedParts(df: DataFrame, floor: Int = 1): Int =
    math.max(df.sparkSession.sessionState.conf.numShufflePartitions * 2, floor)

  /** Inner-join `probe` and `build` on `keys` with the chunk +
    * pinned-repartition countermeasures applied. Every (probe, build)
    * row pair that matches on `keys` appears EXACTLY once in the
    * output (the chunk invariant: the probe row carries all `chunks`
    * sub-chunk keys, the build row exactly one, so each pair meets in
    * precisely the build row's chunk). The transient `cj` chunk column
    * is dropped from the result.
    *
    * `buildHashCol` picks the build-side column whose hash assigns the
    * sub-chunk — use the build side's id column: distinct ids spread a
    * hot bucket's rows across all `chunks` keys. The PROBE side is the
    * replicated one (`chunks`× its row count rides the exchange) —
    * pass the side with the narrower payload, or the smaller corpus in
    * asymmetric (cross-corpus) joins, as `probe`. */
  def explosiveBucketJoin(probe: DataFrame, build: DataFrame,
                          keys: Seq[String], buildHashCol: String,
                          chunks: Int): DataFrame = {
    require(chunks >= 1, s"chunks=$chunks")
    val parts = pinnedParts(probe, floor = chunks)
    val chunkKeys = (keys :+ "cj").map(col)
    val p = probe.withColumn("cj", explode(sequence(lit(0), lit(chunks - 1))))
      .repartition(parts, chunkKeys: _*)
    val b = build
      .withColumn("cj", pmod(xxhash64(col(buildHashCol)), lit(chunks)).cast("int"))
      .repartition(parts, chunkKeys: _*)
    p.join(b, keys :+ "cj").drop("cj")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass data profiling — the Deequ-style validation primitive
  * every ingest pipeline runs before training data is trusted: per
  * numeric column the row count, null count, exact distinct count, and
  * min/max, emitted in long format (one row per column).
  *
  * Scale shape: ONE aggregation job over the table produces every
  * non-distinct stat (count/nulls/min/max partial-aggregate map-side to
  * a single row); the exact distinct counts ride the same `agg` call —
  * Spark plans multi-`countDistinct` as one Expand (rows × |cols|) with
  * partial aggregation, so the shuffle carries distinct values, not
  * rows. For wide tables where exact distincts are not worth the
  * Expand, [[Sketches.hllRegistersGrouped]] per column is the sketch
  * alternative; this operator keeps exactness so the driver can
  * hash-gate it. The 1-row wide result is melted to long format on the
  * driver side of the aggregate (stack over one row — no extra
  * shuffle). */
object Profile {

  /** Profile `cols` (numeric) of `df`: one row per column of
    * (col_name, n, n_null, n_distinct, min_v, max_v), doubles for the
    * value bounds.
    *
    * Plan shape: the non-distinct stats (count/nulls/min/max) stay ONE
    * map-side-partial aggregation job; each exact distinct count runs
    * as its OWN two-phase aggregate (partial distinct per partition →
    * distinct values exchanged → count) and broadcast-joins back onto
    * the melted stats by col_name. Putting the countDistincts in the
    * same `agg` call planned a single Expand (rows × (|cols|+1)
    * duplicated through the shuffle, keyed on ALL profiled columns at
    * once — §2.3 "shuffle fewer bytes"): measured the suite's worst
    * A/B task divergence in every r14 bench (q_profile noisy-flagged
    * 4/4 runs, 2-10 task CPU-s on a 150k-row table). Per-column
    * aggregates exchange only each column's distinct values under a
    * single-column key. Same results: countDistinct semantics
    * (non-null exact distinct) are unchanged, one row per column. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("_n")) ++ cols.flatMap { c =>
        Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_null_$c"),
          min(col(c)).cast("double").as(s"_min_$c"),
          max(col(c)).cast("double").as(s"_max_$c"))
      }
    // forCompute on the pruned projection: the partial aggregate is the
    // dense map stage and otherwise runs on the scan's partitioning
    // (one task on a single-file table by the jobs probe); the narrow
    // typed columns exchange cheaply. No-op on multi-split scans.
    val wide = Repartition.forCompute(df.select(cols.map(col): _*))
      .agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("col_name"), col("_n").as("n"),
        col(s"_null_$c").as("n_null"),
        col(s"_min_$c").as("min_v"), col(s"_max_$c").as("max_v"))
    }
    val melted = wide.select(explode(array(stacked: _*)).as("p")).select("p.*")
    val nds = cols.map { c =>
      df.select(col(c)).agg(countDistinct(col(c)).as("n_distinct"))
        .select(lit(c).as("col_name"), col("n_distinct"))
    }.reduce(_ unionAll _)
    melted.join(broadcast(nds), Seq("col_name"))
      .select(col("col_name"), col("n"), col("n_null"), col("n_distinct"),
        col("min_v"), col("max_v"))
  }

  /** Equal-width histogram of a numeric column: `buckets` buckets
    * spanning [min, max] (top bucket closed), plus the bucket bounds.
    * Two scans — an O(1) min/max all-reduce broadcast into a counting
    * pass that partial-aggregates map-side — never a global sort,
    * never a per-row driver round trip. The bucket arithmetic is kept
    * in one IEEE evaluation order (`(x - mn) / ((mx - mn) / buckets)`)
    * so an independent engine reproduces identical bucket boundaries.
    * Empty buckets are emitted (dense output, stable shape); a
    * constant column collapses into bucket 0. */
  def histogram(df: DataFrame, valueCol: String, buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets=$buckets")
    val x = col(valueCol).cast("double")
    val mm = df.where(x.isNotNull).agg(min(x).as("mn"), max(x).as("mx"))
    val counts = df.where(x.isNotNull).select(x.as("x"))
      .crossJoin(broadcast(mm))
      .select(when(col("mx") === col("mn"), lit(0L))
        .otherwise(least(
          floor((col("x") - col("mn")) / ((col("mx") - col("mn")) / buckets)).cast("long"),
          lit(buckets - 1L))).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
    df.sparkSession.range(buckets).select(col("id").as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .crossJoin(broadcast(mm))
      .select(col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"),
        round(col("mn") + col("bucket") * ((col("mx") - col("mn")) / buckets), 6).as("lo"),
        round(col("mn") + (col("bucket") + 1) * ((col("mx") - col("mn")) / buckets), 6).as("hi"))
  }

  /** Categorical companion to [[profile]]: per string column the row
    * count, null count, exact distinct count, and the mode (most
    * frequent value, ties to the smallest value — deterministic, so
    * the driver can hash-gate it) with its frequency. One
    * count-per-(column, value) aggregation per column over a union —
    * each leg partial-aggregates map-side to ≤|distinct| rows, and the
    * mode is a 1-row TakeOrdered per leg, never a global sort. */
  def profileCategorical(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileCategorical needs at least one column")
    cols.map { c =>
      val counts = df.groupBy(col(c).as("v"))
        .agg(count(lit(1)).as("cnt"))
      val mode = counts.where(col("v").isNotNull)
        .orderBy(col("cnt").desc, col("v")).limit(1)
        .select(col("v").as("top_value"), col("cnt").as("top_n"))
      val stats = counts.agg(
        sum("cnt").as("n"),
        coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L)).as("n_null"),
        count(when(col("v").isNotNull, lit(1))).as("n_distinct"))
      stats.crossJoin(mode) // both sides are 1 row
        .select(lit(c).as("col_name"), col("n"), col("n_null"),
          col("n_distinct"), col("top_value"), col("top_n"))
    }.reduce(_ unionAll _)
  }

  /** Expectation check on a profile: not-null / unique / bounds per
    * column, one row per violated expectation (empty = all pass).
    * `bounds` maps column → (lo, hi) inclusive. */
  def violations(profiled: DataFrame, notNull: Seq[String] = Nil,
                 unique: Seq[String] = Nil,
                 bounds: Map[String, (Double, Double)] = Map.empty): DataFrame = {
    val nn = when(col("col_name").isin(notNull: _*) && col("n_null") > 0,
      lit("not_null"))
    val uq = when(col("col_name").isin(unique: _*) && col("n_distinct") < col("n"),
      lit("unique"))
    val bd = bounds.foldLeft(lit(null).cast("string")) { case (acc, (c, (lo, hi))) =>
      when(col("col_name") === c && (col("min_v") < lo || col("max_v") > hi),
        lit("bounds")).otherwise(acc)
    }
    profiled
      .select(col("col_name"), explode(array(nn, uq, bd)).as("violation"))
      .where(col("violation").isNotNull)
  }

  /** Per-source dataset card — the one-pass corpus summary a data
    * release ships: docs, exact token totals, 6-dp mean quality,
    * language spread, and the exact-duplicate footprint (docs whose
    * text occurs elsewhere in the WHOLE corpus, attributed to their
    * source). Determinism: quality is pre-rounded to 6 dp and
    * quantized to integer micro-units before the distributed sum
    * (order-independent — the unigram-LM trick), so the mean is
    * hash-exact cross-engine.
    *
    * Scale shape: one map-side-combined aggregate over the corpus
    * keyed by source (a handful of groups), plus the dup side: a
    * digest-keyed count (16-byte keys, map-side partials), a
    * ≥2-filter, and a digest semi-join back — the exact-dedup plan
    * re-used for accounting. No window, no text shuffle. */
  def sourceReport(docs: DataFrame, idCol: String, textCol: String,
                   sourceCol: String, langCol: String): DataFrame = {
    import graft.functions.TextFunctions
    val perDoc = docs.select(col(sourceCol).as("source"), col(idCol),
      col(langCol).as("lang"),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tok"),
      // qualityScore is already 6-dp, so this quantization is exact
      // (no second rounding can move the value off its grid point)
      graft.functions.Quantize.quantize(
        TextFunctions.qualityScore(col(textCol)), 6).as("q_micro"),
      md5(col(textCol).cast("binary")).as("digest"))
    val stats = perDoc.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tok")).as("n_tokens"),
      sum(col("q_micro")).as("q_sum"),
      countDistinct(col("lang")).as("n_langs"))
    val dupDigests = perDoc.groupBy("digest")
      .agg(count(lit(1)).as("n")).where(col("n") >= 2).select("digest")
    val dupPerSource = perDoc.join(dupDigests, Seq("digest"), "left_semi")
      .groupBy("source").agg(count(lit(1)).as("n_dup"))
    stats.join(dupPerSource, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("q_sum").cast("double") / col("n_docs") / 1e6, 6)
          .as("avg_quality"),
        col("n_langs"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        round(coalesce(col("n_dup"), lit(0L)).cast("double") / col("n_docs"), 6)
          .as("dup_rate"))
  }
}

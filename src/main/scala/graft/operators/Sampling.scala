package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and data mixing for training pipelines.
  *
  * Decisions derive from the MD5 of the KEY, not an RNG: the same row
  * gets the same decision in every run, on every engine, under every
  * partitioning — so samples are reproducible, join-stable (sample two
  * tables by the same key and the join survives), and monotone (a
  * higher rate's sample is a superset of a lower rate's, because the
  * decision is `bucket < threshold` on the same bucket). The sampling
  * bucket is the first 16 md5 bits mod 1000 — per-mille rate
  * granularity, exactly reproducible in ANSI SQL. */
object Sampling {

  /** Per-mille sampling bucket (0..999) of a key column. */
  def hashBucket(key: Column): Column =
    (conv(substring(md5(key.cast("string").cast("binary")), 1, 4), 16, 10)
      .cast("int") % 1000)

  /** Keep rows whose key bucket falls under `rate` (rounded to whole
    * per-mille). */
  /** Deterministic train/val/test assignment by hash bucket: per-mille
    * cut points (e.g. 980/10/10) over [[hashBucket]], so the split is
    * reproducible from the key alone — any engine, any partitioning,
    * any rerun assigns every document identically (the property that
    * makes eval-set contamination auditable). Pure map, no shuffle. */
  def datasetSplit(df: DataFrame, keyCol: String,
                   trainPerMille: Int, valPerMille: Int): DataFrame = {
    require(trainPerMille >= 0 && valPerMille >= 0 &&
      trainPerMille + valPerMille <= 1000, "per-mille cuts must fit in 1000")
    val b = hashBucket(col(keyCol))
    df.withColumn("split",
      when(b < trainPerMille, lit("train"))
        .when(b < trainPerMille + valPerMille, lit("val"))
        .otherwise(lit("test")))
  }

  def hashSample(df: DataFrame, keyCol: String, rate: Double): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, "rate must be in [0, 1]")
    df.where(hashBucket(col(keyCol)) < lit(math.round(rate * 1000).toInt))
  }

  /** Quality-weighted sampling: keep probability = rate · w(row), with
    * w ∈ [0,1] a per-row weight column (e.g.
    * [[graft.functions.TextFunctions.qualityScore]]) — the curation
    * move that keeps more of the good data and less of the bad WITHOUT
    * a hard threshold. Decision: md5₃₂(key) < ⌊rate·w·2³²⌋ — same
    * determinism laws as [[hashSample]] (reproducible, join-stable)
    * plus monotone in BOTH rate and weight: raising either only ADDS
    * rows. The full 32-bit hash gives ~2⁻³² rate granularity so
    * fine-grained weights act faithfully.
    *
    * Weights outside [0,1] are clamped (w>1 keeps at most `rate`, w<0
    * keeps nothing) and a NULL/NaN weight keeps nothing — without the
    * clamp a w>1 silently RAISES the keep probability above the
    * documented `rate·w` ceiling and a NULL row's fate depends on SQL
    * three-valued logic instead of a stated rule. */
  def weightedHashSample(df: DataFrame, keyCol: String, weight: Column,
                         rate: Double): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, "rate must be in [0, 1]")
    // NULL/NaN screened BEFORE the clamp: Spark orders NaN above every
    // double, so least(greatest(NaN, 0), 1) would silently clamp NaN
    // to 1.0 instead of dropping the row.
    val wd = weight.cast("double")
    val wSafe = when(wd.isNull || isnan(wd), lit(0.0))
      .otherwise(least(greatest(wd, lit(0.0)), lit(1.0)))
    val threshold =
      floor(wSafe * lit(rate) * lit(4294967296.0)).cast("long")
    df.where(Sketches.md5Hash32(col(keyCol)) < threshold)
  }

  /** Deterministic ~`cap`-row subset: the per-mille hash-bucket filter
    * with the smallest rate whose EXPECTED yield still reaches `cap`
    * (ceil(cap·1000/n) per-mille; the whole frame when n <= cap).
    * Same determinism laws as [[hashSample]] — the subset depends only
    * on md5(key), so it is partitioning-invariant, reproducible in
    * ANSI SQL, and stable across engines. This is the training-sample
    * primitive: iterative trainers (k-means, PQ codebooks) run their
    * Lloyd loops over this bounded frame and touch the full corpus
    * exactly once for the final encode/assign — at 100 TB the
    * alternative is one full read PER ITERATION for a codebook whose
    * quality needs only a sample. Runs one count() job on `df`. */
  def hashSampleToCap(df: DataFrame, keyCol: String, cap: Long): DataFrame = {
    require(cap > 0, "cap must be positive")
    val n = df.count()
    if (n <= cap) df
    else {
      val permille = math.min(1000L, (cap * 1000L + n - 1) / n).toInt
      df.where(hashBucket(col(keyCol)) < lit(permille))
    }
  }

  /** Data mixing: per-stratum sampling rates (e.g. downweight one
    * language or source), `defaultRate` for unlisted strata. */
  def stratifiedHashSample(df: DataFrame, keyCol: String, stratumCol: String,
                           rates: Map[String, Double],
                           defaultRate: Double = 1.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      "rates must be in [0, 1]")
    val threshold = rates.foldLeft(lit(math.round(defaultRate * 1000).toInt)) {
      case (acc, (stratum, rate)) =>
        when(col(stratumCol) === stratum, lit(math.round(rate * 1000).toInt)).otherwise(acc)
    }
    df.where(hashBucket(col(keyCol)) < threshold)
  }

  /** Deterministic Gumbel-top-k: EXACTLY `k` rows sampled WITHOUT
    * replacement with P ∝ exp(weightMicro / 1e6) — the resampling
    * half of DSIR (Xie et al. 2023: importance weights from
    * [[Curation.dsirLogWeights]], then Gumbel-top-k draws the
    * training subset; Gumbel-max is the exact, parallelizable way to
    * sample ∝ softmax without normalizing). Divide `weightMicro` by a
    * temperature BEFORE passing it to sharpen/flatten the draw.
    *
    * The Gumbel noise derives from md5(key), not an RNG — the same
    * determinism contract as every sampler here (reproducible,
    * partitioning-invariant, join-stable): `u = (md5₆₀(key) mod
    * (2⁵³−1) + 0.5) / 2⁵³`. The modulus is 2⁵³−1, NOT 2⁵³: with the
    * power-of-two modulus the residue 2⁵³−1 makes (x+0.5)/2⁵³ round to
    * exactly 1.0 in IEEE doubles and ln(0) diverges (NULL in Spark,
    * −inf in DuckDB — an engine/oracle split). With 2⁵³−1 the residue
    * tops out at 2⁵³−2, x+0.5 rounds to at most 2⁵³−1, and u is
    * provably inside (0,1) AFTER rounding, so the double log never
    * hits ±∞. `g = −ln(−ln u)` quantized to integer micro-units (the
    * [[graft.functions.Quantize]] law) so the ranking key
    * `weightMicro + g_micro` is integer and the selection totally
    * ordered by (key desc, id asc) — ANSI-SQL-reproducible.
    *
    * Scale shape: one stateless map pass + global top-k, which Spark
    * plans as TakeOrdered (per-partition heaps + driver merge of k) —
    * never a global sort. Output: the selected rows + `samp_micro`. */
  def gumbelTopK(df: DataFrame, keyCol: String, weightMicro: Column,
                 k: Int): DataFrame = {
    require(k > 0, s"k=$k")
    val two53 = 9007199254740992.0 // 2^53: exact in a double
    // Modulus 2^53-1 (not 2^53): see the docstring's rounding proof.
    val v = conv(substring(md5(col(keyCol).cast("string").cast("binary")),
      1, 15), 16, 10).cast("long")
    val u = (pmod(v, lit(9007199254740991L)).cast("double") + 0.5) / lit(two53)
    val gMicro = graft.functions.Quantize.quantize(-log(-log(u)), 6)
    df.withColumn("samp_micro", weightMicro.cast("long") + gMicro)
      .orderBy(col("samp_micro").desc, col(keyCol))
      .limit(k)
  }

  /** Token-budget mixing — [[stratifiedHashSample]] with the rates
    * DERIVED from the data: stratum `s` with a budget samples at
    * per-mille ⌊budgetₛ·1000 / tokensₛ⌋ (its expected kept-token count
    * lands at-or-under the budget; a stratum already within budget, or
    * without one, keeps everything). The per-row decision is the same
    * md5 per-mille bucket as every sampler here, so the kept set is
    * reproducible, partitioning-invariant, and monotone in the budget
    * (raising a budget only ADDS rows).
    *
    * Scale shape: one map-side-combined aggregate derives per-stratum
    * token totals (strata = languages/sources, a tiny frame), the
    * per-mille rates broadcast back, and the filter itself is
    * shuffle-free. All-INTEGER rate arithmetic (`div`, not double
    * division + floor — a double quotient can land epsilon under an
    * integer and misfloor) so any SQL engine reproduces the exact
    * kept set. */
  def mixToTokenBudget(df: DataFrame, keyCol: String, stratumCol: String,
                       tokensCol: Column, budgets: Map[String, Long]): DataFrame = {
    require(budgets.values.forall(_ >= 0), "budgets must be >= 0")
    val budgetCol = budgets.foldLeft(lit(null).cast("long")) {
      case (acc, (s, b)) => when(col(stratumCol) === s, lit(b)).otherwise(acc)
    }
    val rates = df.groupBy(stratumCol)
      .agg(sum(tokensCol.cast("long")).as("toks"))
      .withColumn("b", budgetCol)
      .selectExpr(stratumCol,
        "CASE WHEN b IS NULL OR toks <= b THEN 1000 " +
          "ELSE CAST((b * 1000) DIV toks AS INT) END AS pm")
    df.join(broadcast(rates), Seq(stratumCol))
      .where(hashBucket(col(keyCol)) < col("pm"))
      .drop("pm")
  }

  /** Temperature-flattened mixture sampling — the multilingual-LM
    * `share ∝ tokens^α` law (XLM-R / mC4 sampling, public),
    * downsample-only and anchored at the SMALLEST stratum (which
    * keeps everything): rate_s = (min_t toks_t / toks_s)^(1-α), so
    * kept token mass per stratum is ~ min^(1-α)·toks^α. α = 1 is the
    * natural mixture (keep all); α → 0 flattens toward uniform.
    * A stratum more than ~1000^(1/(1-α))× the smallest floors to
    * pm = 0 and drops entirely — per-mille granularity, documented
    * edge.
    *
    * Determinism: rates quantize to per-mille and the kept set is the
    * md5 [[hashBucket]] filter (reproducible, partitioning-invariant,
    * monotone in α). α = 0.5 — the common choice — computes via IEEE
    * `sqrt`, which is CORRECTLY ROUNDED in every engine, so the
    * per-mille boundary is bit-reproducible cross-engine and the kept
    * set is oracle-exact; other α go through `pow` (deterministic
    * within an engine, last-ulp portability not guaranteed).
    *
    * Scale shape: mixToTokenBudget's temperature sibling — one
    * map-side-combined aggregate for per-stratum totals, a 1-row min
    * broadcast-joined onto the (tiny) strata frame, rates broadcast
    * back, shuffle-free filter. */
  def temperatureMix(df: DataFrame, keyCol: String, stratumCol: String,
                     tokensCol: Column, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha=$alpha must be in (0, 1]")
    val toks = df.groupBy(stratumCol).agg(sum(tokensCol.cast("long")).as("toks"))
    val mn = toks.agg(min("toks").as("mn"))
    val ratio = col("mn").cast("double") / col("toks").cast("double")
    val p = if (alpha == 0.5) sqrt(ratio) else pow(ratio, 1.0 - alpha)
    val rates = toks.join(broadcast(mn))
      .select(col(stratumCol), floor(lit(1000.0) * p).cast("int").as("pm"))
    df.join(broadcast(rates), Seq(stratumCol))
      .where(hashBucket(col(keyCol)) < col("pm"))
      .drop("pm")
  }
}

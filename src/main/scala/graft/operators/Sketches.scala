package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog cardinality sketch as a first-class distributed
  * aggregate (Flajolet et al. 2007, the public HLL paper).
  *
  * Why not `approx_count_distinct`: Spark's builtin HLL++ sketch is
  * engine-internal — its estimate can't be reproduced by another
  * engine, so a result built on it is unverifiable and unportable.
  * This operator keeps the sketch OPEN: the register table
  * (register id → max rho) is a plain DataFrame any engine can
  * compute from the same hash, merge (elementwise max), and turn
  * into the same estimate.
  *
  * Determinism at any parallelism: per-register `max` is commutative
  * (partial aggregation map-side, a ≤2^p-row shuffle regardless of
  * input size — the 100 TB story), and for hashes ≤32 bits the
  * harmonic sum is computed in SCALED INTEGER form
  * (S0 = Σ 2^(C−rho_j), C = hashBits−p+12, exact in a long), so the
  * estimate is one fixed-order double expression — bit-identical
  * across engines and partitionings, which is what lets the driver
  * hash-compare it against DuckDB. Hashes >32 bits fall back to a
  * double harmonic sum (estimates only, ulp-order-sensitive — fine
  * for use, not for a hash-equality oracle).
  *
  * The hash column is pluggable: production uses `xxhash64` (64-bit,
  * spec-checked for accuracy); the oracle gate uses `md5Hash32` — the
  * first 8 md5 hex chars — which DuckDB reproduces verbatim.
  */
object Sketches {

  /** First 32 bits of md5 of the value's string form, as a long in
    * [0, 2^32) — the cross-engine-reproducible hash (same idiom as
    * `Sampling`'s per-mille bucket, 8 hex chars instead of 4). */
  def md5Hash32(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long")

  /** Register table: one row per non-empty register, `reg` in
    * [0, 2^p), `r` = max over rows of rho (1 + leading zeros of the
    * low hashBits−p bits; w+1 when they're all zero). The rho of the
    * binary string form keeps the arithmetic integer-exact and maps
    * 1:1 onto DuckDB's lpad/bin/instr. */
  def hllRegisters(df: DataFrame, hashCol: Column, p: Int,
                   hashBits: Int = 32): DataFrame = {
    require(p >= 4 && p <= 16, s"p=$p out of range")
    require(hashBits > p && hashBits <= 64, s"hashBits=$hashBits")
    val w = hashBits - p
    val h = hashCol.cast("long")
    val reg = shiftrightunsigned(h, w).as("reg")
    val low = h.bitwiseAND(lit((1L << w) - 1))
    val firstOne = instr(lpad(bin(low), w, "0"), "1")
    val rho = when(firstOne === 0, lit(w + 1)).otherwise(firstOne)
    // null hashes (null keys) carry no cardinality information and
    // would otherwise materialize a null register row
    df.where(hashCol.isNotNull).select(reg, rho.as("rho"))
      .groupBy("reg").agg(max("rho").as("r"))
  }

  /** Merge two sketches: elementwise max — the HLL merge law. */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionAll(b).groupBy("reg").agg(max("r").as("r"))

  /** HLL set algebra over two register tables: |A|, |B|, |A∪B| (union
    * = the elementwise-max merge — estimated WITHOUT rescanning any
    * data), and |A∩B| by inclusion–exclusion on the 6-dp estimates —
    * the audience-overlap / corpus-intersection measurement that makes
    * mergeable sketches worth persisting. Callers holding expensive
    * register pipelines should cache them (each side is read twice:
    * its own estimate + the merge). Intersection error compounds the
    * three ±1.04/√m estimates, the standard inclusion–exclusion
    * caveat. */
  def hllSetOps(ra: DataFrame, rb: DataFrame, p: Int,
                hashBits: Int = 32): DataFrame = {
    val ea = hllEstimate(ra, p, hashBits).select(col("est").as("est_a"))
    val eb = hllEstimate(rb, p, hashBits).select(col("est").as("est_b"))
    val eu = hllEstimate(hllMerge(ra, rb), p, hashBits)
      .select(col("est").as("est_union"))
    ea.crossJoin(eb).crossJoin(eu)
      .withColumn("est_intersect",
        round(col("est_a") + col("est_b") - col("est_union"), 6))
  }

  /** [[hllRegisters]] with the md5-32 hash FUSED into one native
    * per-row pass ([[graft.functions.NativeExprs.HllRegRhoExpr]]):
    * same registers bit-for-bit as
    * `hllRegisters(df, md5Hash32(key), p)` — the hex parse comes off
    * the digest bytes and rho is integer bit math instead of the
    * bin/lpad/instr string chain (which stays in the API above as
    * the oracle-shaped reference form). */
  def hllRegistersMd5(df: DataFrame, keyCol: Column, p: Int): DataFrame =
    df.where(keyCol.isNotNull)
      .select(graft.functions.NativeExprs
        .hllRegRhoNative(keyCol.cast("string"), p).as("rr"))
      .select(col("rr.reg").as("reg"), col("rr.rho").as("rho"))
      .groupBy("reg").agg(max("rho").as("r"))

  /** Grouped sibling of [[hllRegistersMd5]] — fused per-row pass,
    * identical output to `hllRegistersGrouped(df, groupCols,
    * md5Hash32(key), p)`. */
  def hllRegistersGroupedMd5(df: DataFrame, groupCols: Seq[String],
                             keyCol: Column, p: Int): DataFrame =
    df.where(keyCol.isNotNull)
      .select(groupCols.map(col) :+ graft.functions.NativeExprs
        .hllRegRhoNative(keyCol.cast("string"), p).as("rr"): _*)
      .select(groupCols.map(col) :+ col("rr.reg").as("reg") :+ col("rr.rho").as("rho"): _*)
      .groupBy((groupCols :+ "reg").map(col): _*).agg(max("rho").as("r"))

  /** Per-GROUP register tables: (group, reg, r) — approximate distinct
    * per group, the workhorse OLAP sketch shape. Still bounded: the
    * shuffle is ≤|groups|·2^p rows per partition at ANY input size,
    * and a coarser rollup is just `groupBy(fewer cols, reg).max(r)` on
    * the OUTPUT — re-aggregating sketches, never rescanning rows
    * (PipelineOpsSpec pins rollup-of-sketches == sketch-of-rollup). */
  def hllRegistersGrouped(df: DataFrame, groupCols: Seq[String], hashCol: Column,
                          p: Int, hashBits: Int = 32): DataFrame = {
    require(p >= 4 && p <= 16, s"p=$p out of range")
    require(hashBits > p && hashBits <= 64, s"hashBits=$hashBits")
    val w = hashBits - p
    val h = hashCol.cast("long")
    val reg = shiftrightunsigned(h, w).as("reg")
    val low = h.bitwiseAND(lit((1L << w) - 1))
    val firstOne = instr(lpad(bin(low), w, "0"), "1")
    val rho = when(firstOne === 0, lit(w + 1)).otherwise(firstOne)
    df.where(hashCol.isNotNull)
      .select(groupCols.map(col) :+ reg :+ rho.as("rho"): _*)
      .groupBy((groupCols :+ "reg").map(col): _*).agg(max("rho").as("r"))
  }

  /** Per-group estimates from a grouped register table: one row per
    * group of (group cols..., regs_hit, est) — same scaled-integer
    * harmonic sum as [[hllEstimate]], grouped. */
  def hllEstimateGrouped(regs: DataFrame, groupCols: Seq[String], p: Int,
                         hashBits: Int = 32): DataFrame = {
    val m = 1 << p
    val w = hashBits - p
    require(hashBits <= 32, "grouped estimate keeps the exact-integer path")
    val c = w + 12
    val scale = math.pow(2.0, c)
    regs.groupBy(groupCols.map(col): _*)
      .agg(
        coalesce(sum(expr(s"cast(power(2.0, $c - r) as bigint)")), lit(0L))
          .as("s_hit"),
        count(lit(1)).as("nhit"))
      .select(groupCols.map(col) :+
        col("nhit").as("regs_hit") :+
        round(alphaExpr(m) * lit(m.toDouble * m) * lit(scale) /
          (col("s_hit") + (lit(m.toLong) - col("nhit")) * lit(scale.toLong)),
          6).as("est"): _*)
  }

  /** alpha_m bias constant, built from the same literal arithmetic on
    * both engines (constant-folded to the identical IEEE double). */
  private def alphaExpr(m: Int): Column =
    if (m >= 128) lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    else if (m == 64) lit(0.709)
    else if (m == 32) lit(0.697)
    else lit(0.673)

  /** Raw HLL estimate from a register table: one row
    * (regs_hit, est). Valid for n ≳ 2.5·2^p (no small-range
    * correction — by design: the correction's `ln` is the one step
    * libm implementations may disagree on). */
  def hllEstimate(regs: DataFrame, p: Int, hashBits: Int = 32): DataFrame = {
    val m = 1 << p
    val w = hashBits - p
    if (hashBits <= 32) {
      // Scaled-integer harmonic sum: C−rho in [C−w−1, C], terms and
      // the empty-register block fit a long for hashBits ≤ 32, p ≥ 4.
      val c = w + 12
      val scale = math.pow(2.0, c) // exact power of two
      regs.agg(
        coalesce(sum(expr(s"cast(power(2.0, $c - r) as bigint)")), lit(0L))
          .as("s_hit"),
        count(lit(1)).as("nhit"))
        .select(
          col("nhit").as("regs_hit"),
          round(alphaExpr(m) * lit(m.toDouble * m) * lit(scale) /
            (col("s_hit") + (lit(m.toLong) - col("nhit")) * lit(scale.toLong)),
            6).as("est"))
    } else {
      regs.agg(
        coalesce(sum(expr("power(2.0, -r)")), lit(0.0)).as("s_hit"),
        count(lit(1)).as("nhit"))
        .select(
          col("nhit").as("regs_hit"),
          round(alphaExpr(m) * lit(m.toDouble * m) /
            (col("s_hit") + (lit(m.toDouble) - col("nhit"))), 6).as("est"))
    }
  }

  /** df + hash column → one-row (regs_hit, est). */
  def hllCardinality(df: DataFrame, hashCol: Column, p: Int,
                     hashBits: Int = 32): DataFrame =
    hllEstimate(hllRegisters(df, hashCol, p, hashBits), p, hashBits)

  // ---- Equi-width histogram quantile sketch ---------------------------

  /** Histogram sketch over [lo, hi]: `bins` equal-width buckets, one
    * row per non-empty bucket (bin, cnt). The open-state quantile
    * companion to the HLL sketch: counts are exact longs, merge = sum
    * by bin, the shuffle is ≤`bins` rows per partition at any input
    * size, and the binning expression is plain double arithmetic any
    * engine reproduces bit-for-bit. (A t-digest gives tighter tails but
    * its centroids depend on input order and merge schedule — it can
    * never be hash-verified across engines; an equi-width histogram is
    * the deterministic trade.) Values outside [lo, hi] clamp to the
    * edge buckets. */
  def histSketch(df: DataFrame, value: Column, lo: Column, hi: Column,
                 bins: Int): DataFrame =
    histSketchGrouped(df, Seq.empty, value, lo, hi, bins)

  /** Merge two histogram sketches: per-bin count sum. */
  def histMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionAll(b).groupBy("bin").agg(sum("cnt").as("cnt"))

  /** Per-group [[histSketch]]: `(groupCols…, bin, cnt)` — the same
    * equi-width deterministic law, keyed by group; merge is the same
    * per-(group, bin) count sum, so sketches roll up across
    * partitions, days, or sources without rescanning (the grouped
    * face of the HLL rollup-of-sketches law). Shuffle is
    * ≤ |groups|·bins rows at any input size. */
  def histSketchGrouped(df: DataFrame, groupCols: Seq[String],
                        value: Column, lo: Column, hi: Column,
                        bins: Int): DataFrame = {
    require(bins >= 2 && bins <= 65536, s"bins=$bins")
    val v = value.cast("double")
    val bin = least(greatest(
      floor((v - lo) / (hi - lo) * lit(bins.toDouble)), lit(0.0)),
      lit((bins - 1).toDouble)).cast("long")
    df.where(v.isNotNull)
      .select(groupCols.map(col) :+ bin.as("bin"): _*)
      .groupBy((groupCols :+ "bin").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-group [[histQuantiles]]: `(groupCols…, q, est)`. The
    * cumulative window partitions by group (≤bins rows each), the
    * group totals join on the same key the window partitioned by, and
    * the interpolation is the identical fixed-order double expression
    * — engine- and partitioning-deterministic per group. */
  def histQuantilesGrouped(hist: DataFrame, groupCols: Seq[String],
                           lo: Column, hi: Column, bins: Int,
                           qs: Seq[Double]): DataFrame = {
    // Ungrouped (the histQuantiles delegate): a constant partition key
    // — the frame is ≤bins rows — keeps WindowExec's single-partition
    // warning out of the logs; the 1-row total rides a cross join.
    val partCols = if (groupCols.isEmpty) Seq(lit(0)) else groupCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partCols: _*).orderBy("bin")
      .rowsBetween(Long.MinValue, 0)
    val totals = hist.groupBy(groupCols.map(col): _*).agg(sum("cnt").as("n"))
    val width = (hi - lo) / lit(bins.toDouble)
    val cum = hist.withColumn("cum", sum("cnt").over(w))
    val joined =
      if (groupCols.isEmpty) cum.crossJoin(totals) // 1-row broadcast
      else cum.join(totals, groupCols)
    joined
      .withColumn("q", explode(array(qs.map(lit): _*)))
      .withColumn("target", col("q") * col("n"))
      .where(col("cum") >= col("target") &&
        (col("cum") - col("cnt")) < col("target"))
      .select(groupCols.map(col) :+ col("q") :+
        round(lo + (col("bin") +
          (col("target") - (col("cum") - col("cnt"))) / col("cnt")) * width,
          6).as("est"): _*)
  }

  // ---- Count-min frequency sketch -------------------------------------

  /** Count-min sketch (Cormode–Muthukrishnan, public): `d` hash rows ×
    * `w` buckets of exact long counters. The frequency member of the
    * sketch family: counters are integers end-to-end (no FP anywhere),
    * merge = cell-wise sum, and the shuffle is ≤d·w cells per
    * partition at any input size. Row i's hash is the md5-slice of
    * "key:i" — reproducible by any engine, same idiom as the gates'
    * other hashes. */
  def cmSketch(df: DataFrame, key: Column, d: Int = 4,
               w: Int = 1024): DataFrame = {
    require(d >= 1 && d <= 8 && w >= 2, s"d=$d w=$w")
    val rows = array((0 until d).map { i =>
      struct(lit(i).as("i"),
        (md5Hash32(concat(key.cast("string"), lit(":"), lit(i.toString)))
          % w).as("bucket"))
    }: _*)
    df.where(key.isNotNull).select(explode(rows).as("e"))
      .select(col("e.i").as("i"), col("e.bucket").as("bucket"))
      .groupBy("i", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Merge two count-min sketches: cell-wise counter sum. */
  def cmMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionAll(b).groupBy("i", "bucket").agg(sum("cnt").as("cnt"))

  /** Point-estimate frequencies for a candidate key set: min over the
    * d counters each key hashes to (never under-estimates; over-
    * estimate bounded by collisions). The probe is a broadcast equijoin
    * on (i, bucket) — candidates × d rows against ≤d·w cells. */
  def cmEstimate(sketch: DataFrame, candidates: DataFrame, key: Column,
                 d: Int = 4, w: Int = 1024): DataFrame = {
    val probes = candidates
      .select(key.as("k"),
        explode(array((0 until d).map { i =>
          struct(lit(i).as("i"),
            (md5Hash32(concat(key.cast("string"), lit(":"), lit(i.toString)))
              % w).as("bucket"))
        }: _*)).as("e"))
      .select(col("k"), col("e.i").as("i"), col("e.bucket").as("bucket"))
    probes.join(broadcast(sketch), Seq("i", "bucket"))
      .groupBy("k").agg(min("cnt").as("n_est"))
  }

  /** Quantile estimates from a histogram sketch: one row per q of
    * (q, est), est = linear interpolation inside the bucket holding
    * rank q·N. Cumulative counts come from a window over ≤`bins` rows
    * ordered by the integer bin id — exact longs in a deterministic
    * order — and the final interpolation is one fixed-order double
    * expression, so the estimate is engine- and partitioning-
    * deterministic (6-dp rounded like every gate double). */
  def histQuantiles(hist: DataFrame, lo: Column, hi: Column, bins: Int,
                    qs: Seq[Double]): DataFrame =
    histQuantilesGrouped(hist, Seq.empty, lo, hi, bins, qs)

  // ---- Bloom membership sketch (join pruning) -------------------------

  /** Open bloom bit table, md5/oracle face: the DISTINCT set positions
    * of an m-bit, k-probe bloom filter over `key`, as plain rows any
    * engine reproduces. Double hashing from one 32-bit md5 slice:
    * h1 = h ≫ 16, h2 = 2·(h mod 2^16)+1 (odd), pos_i = (h1 + i·h2)
    * mod m. Like [[hllRegisters]], the sketch state is kept OPEN —
    * a DataFrame, mergeable by union+distinct — which is what lets
    * the driver hash-compare it against DuckDB. The production path
    * ([[bloomBuild]]) packs the same idea into 64-bit words with
    * XXH64 hashing instead. */
  def bloomBitsMd5(df: DataFrame, key: Column, m: Int, k: Int): DataFrame = {
    require(m >= 64 && (m & (m - 1)) == 0, s"m=$m must be a power of two")
    require(k >= 1 && k <= 16, s"k=$k out of range")
    val h = md5Hash32(key)
    val h1 = shiftrightunsigned(h, 16)
    val h2 = h.bitwiseAND(lit(0xffffL)) * lit(2L) + lit(1L)
    val poss = array((0 until k).map(i =>
      (h1 + lit(i.toLong) * h2) % lit(m.toLong)): _*)
    df.where(key.isNotNull)
      .select(explode(poss).as("pos"))
      .distinct()
  }

  /** Distributed packed bloom build over a long key column: k probe
    * positions per key ([[graft.functions.NativeExprs.BloomPositionsExpr]]
    * — XXH64 double hashing, the SAME implementation the probe
    * expression uses), OR-folded into m/64 words. Partial aggregation
    * caps the shuffle at ≤m/64 rows per partition REGARDLESS of input
    * size, and the driver collects exactly m/64 longs (m = 2^20 →
    * 128 KiB) — the 100 TB story: filter size is chosen, not grown.
    * Probe side: [[graft.functions.NativeExprs.bloomMightContainNative]]
    * binds the words as one broadcast reference object inside codegen,
    * so the membership test lands directly on the scan it prunes.
    * False positives possible (rate ≈ (1−e^{−kn/m})^k), false
    * negatives impossible — callers needing exactness re-verify with
    * the equijoin the bloom pre-pruned (see q_bloom_prune). */
  def bloomBuild(df: DataFrame, key: Column, m: Int, k: Int): Array[Long] = {
    require(m >= 64 && m % 64 == 0, s"m=$m must be a multiple of 64")
    val rows = bloomWordTable(df, key, m, k).collect()
    val words = new Array[Long](m / 64)
    rows.foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    words
  }

  /** The open word table behind [[bloomBuild]]: one row per non-zero
    * 64-bit word, (word, bits). `bit_or` is an algebraic aggregate, so
    * the SAME operator runs unchanged as a streaming groupBy (update/
    * complete mode) — the filter accretes bits monotonically as
    * batches arrive, which is what makes a live membership filter over
    * an unbounded key stream possible (StreamingSpec pins streamed ==
    * batch). */
  def bloomWordTable(df: DataFrame, key: Column, m: Int, k: Int): DataFrame = {
    require(m >= 64 && m % 64 == 0, s"m=$m must be a multiple of 64")
    df.where(key.isNotNull)
      .select(explode(
        graft.functions.NativeExprs.bloomPositionsNative(key, m.toLong, k)).as("pos"))
      .select(shiftrightunsigned(col("pos"), 6).as("word"),
        expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))").as("bit"))
      .groupBy("word").agg(bit_or(col("bit")).as("bits"))
  }
}

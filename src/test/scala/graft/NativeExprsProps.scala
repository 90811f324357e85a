package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.NativeExprs

/** ScalaCheck laws for the native expressions — the reference's testing
  * contract upgraded from bounded sweeps to properties (SURVEY §5). */
object NativeExprsProps extends Properties("NativeExprs") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("native-exprs-props")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val token: Gen[String] = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(12))
  private val tokensGen: Gen[List[String]] = Gen.nonEmptyListOf(token).map(_.take(30))
  private val vecGen: Gen[List[Double]] =
    Gen.nonEmptyListOf(Gen.chooseNum(-5.0, 5.0)).map(_.take(24))

  private def evalSimhash(tokens: Seq[String]): Long =
    spark.range(1).select(NativeExprs.simhashMd5Native(
      array(tokens.map(lit): _*))).collect().head.getLong(0)

  property("simhashMd5 is invariant under token order (multiset semantics)") =
    forAll(tokensGen) { toks =>
      evalSimhash(toks) == evalSimhash(scala.util.Random.shuffle(toks))
    }

  property("jaccard is symmetric, bounded in [0,1], and 1 on self") =
    forAll(tokensGen, tokensGen) { (a, b) =>
      val row = spark.range(1).select(
        NativeExprs.jaccardNative(array(a.map(lit): _*), array(b.map(lit): _*)).as("ab"),
        NativeExprs.jaccardNative(array(b.map(lit): _*), array(a.map(lit): _*)).as("ba"),
        NativeExprs.jaccardNative(array(a.map(lit): _*), array(a.map(lit): _*)).as("aa"))
        .collect().head
      val (ab, ba, aa) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
      ab == ba && ab >= 0.0 && ab <= 1.0 && aa == 1.0
    }

  property("hyperplane bucket is invariant under positive scaling, bounded by bits") =
    forAll(vecGen, Gen.chooseNum(0.1, 10.0)) { (v, scale) =>
      val row = spark.range(1).select(
        NativeExprs.hyperplaneBucketLcgNative(array(v.map(lit): _*), 5, 42L).as("b"),
        NativeExprs.hyperplaneBucketLcgNative(array(v.map(x => lit(x * scale)): _*), 5, 42L).as("bs"))
        .collect().head
      val (b, bs) = (row.getLong(0), row.getLong(1))
      b == bs && b >= 0 && b < 32
    }

  property("winnow selects the rightmost min of EVERY window; positions strictly increase") =
    forAll(Gen.chooseNum(1, 60), Gen.long) { (len, seed) =>
      val rnd = new scala.util.Random(seed)
      val text = Seq.fill(len)(('a' + rnd.nextInt(3)).toChar).mkString // ties likely
      val sel = spark.range(1).select(NativeExprs.winnowMd5Native(lit(text), 8, 4))
        .collect().head.getSeq[org.apache.spark.sql.Row](0)
        .map(g => (g.getInt(0), g.getString(1)))
      val md = java.security.MessageDigest.getInstance("MD5")
      val m = math.max(1, text.length - 7)
      val hs = (0 until m).map { i =>
        md.reset()
        md.digest(text.substring(i, math.min(i + 8, text.length)).getBytes("UTF-8"))
          .map(x => f"${x & 0xff}%02x").mkString
      }
      val positions = sel.map(_._1)
      val coverOk = (0 until math.max(1, m - 3)).forall { s =>
        val e = math.min(s + 4, m)
        val mn = (s until e).map(hs).min
        positions.contains((s until e).filter(j => hs(j) == mn).max)
      }
      coverOk &&
        positions == positions.sorted && positions.distinct == positions &&
        sel.forall { case (p, h) => hs(p) == h }
    }

  private val keySetGen: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)).map(_.take(200))

  property("bloom: zero false negatives for every inserted key, any key set") =
    forAll(keySetGen) { keys =>
      import spark.implicits._
      val words = graft.operators.Sketches.bloomBuild(
        keys.toDF("k"), col("k"), m = 1 << 12, k = 4)
      val hits = keys.distinct.toDF("k")
        .where(NativeExprs.bloomMightContainNative(col("k"), words, 4))
        .count()
      hits == keys.distinct.size
    }

  property("char entropy: 0 <= H <= log2(distinct code points); 0 iff <=1 distinct") =
    forAll(Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c', 'd', 'x')).map(_.mkString.take(60))) { s =>
      val h = spark.range(1).select(
        NativeExprs.charEntropyNative(lit(s))).collect().head.getDouble(0)
      val d = s.toSet.size
      val hi = math.log(d.toDouble) / math.log(2.0)
      h >= -1e-12 && h <= hi + 1e-9 && ((d <= 1) == (math.abs(h) < 1e-12))
    }

  property("argminCentroid equals the naive argmin under the same score law") =
    forAll(Gen.chooseNum(1, 12), Gen.listOfN(6, vecGen)) { (k, vs) =>
      val dim = 8
      val cents: Seq[Seq[Double]] = (0 until k).map(j =>
        (0 until dim).map(d => ((j * 31 + d * 7) % 11 - 5).toDouble / 3.0))
      def naive(v: Seq[Double]): Int = {
        val scores = cents.map { c =>
          val dcc = c.foldLeft(0.0)((a, x) => a + x * x)
          val dot = v.zip(c).map { case (a, b) => a * b }.sum
          dcc - 2.0 * dot
        }
        scores.zipWithIndex.minBy { case (s, cid) => (s, cid) }._2
      }
      val padded = vs.map(v => (v ++ Seq.fill(dim)(0.0)).take(dim))
      val got = spark.range(1).select(
        padded.zipWithIndex.map { case (v, i) =>
          NativeExprs.argminCentroidNative(
            array(v.map(lit): _*), cents).as(s"c$i")
        }: _*).collect().head
      padded.zipWithIndex.forall { case (v, i) => got.getInt(i) == naive(v) }
    }

  property("weighted sampling: monotone in rate for any weight assignment") =
    forAll(Gen.chooseNum(0.0, 1.0), Gen.chooseNum(0.0, 1.0)) { (r1, r2) =>
      import spark.implicits._
      val (lo, hi) = (math.min(r1, r2), math.max(r1, r2))
      val df = spark.range(0, 500).select(col("id"),
        ((col("id") % 7).cast("double") / 7.0).as("w"))
      def keep(rate: Double) =
        graft.operators.Sampling.weightedHashSample(df, "id", col("w"), rate)
          .select("id").collect().map(_.getLong(0)).toSet
      keep(lo).subsetOf(keep(hi))
    }

  property("chunk law: count, tiling, tail coverage for any (window, stride, n)") =
    forAll(Gen.chooseNum(1, 12), Gen.chooseNum(1, 12), Gen.chooseNum(0, 60)) {
      (w0, s0, n) =>
        import spark.implicits._
        val window = math.max(w0, s0)
        val stride = math.min(w0, s0) // stride <= window by construction
        val text = (0 until n).map(i => s"t$i").mkString(" ")
        val got = graft.operators.Chunking
          .chunkTokens(Seq((1L, text)).toDF("doc_id", "text"),
            "doc_id", "text", window, stride)
          .select("chunk_id", "tok_start", "n_tok")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .sortBy(_._1)
        // n=0 -> split("") = [""] -> 1 token; the law sees dl >= 1
        val dl = math.max(n, 1)
        val expChunks = 1 + math.max(0, (dl - window + stride - 1) / stride)
        got.length == expChunks &&
          got.zipWithIndex.forall { case ((cid, start, ntok), i) =>
            cid == i && start == i.toLong * stride &&
              ntok == math.min(window, dl - i * stride)
          } &&
          (got.last._2 + got.last._3 == dl) // tail reached exactly
    }

  private val edString: Gen[String] =
    Gen.listOf(Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString.take(40))

  property("posQGramTokens: count = max(0, len-q+1), all distinct, deterministic, edit destroys <= q tokens") =
    forAll(edString, Gen.chooseNum(1, 4), Gen.chooseNum(0, 39)) { (s, q, p0) =>
      def toks(x: String): Seq[Long] =
        spark.range(1).select(NativeExprs.posQGramTokensNative(lit(x), q))
          .collect().head.getSeq[Long](0)
      val t1 = toks(s)
      // one substitution at a valid position (identity when s is short)
      val mutated =
        if (s.isEmpty) s
        else { val p = p0 % s.length; s.updated(p, if (s(p) == 'a') 'b' else 'a') }
      val t2 = toks(mutated)
      t1.length == math.max(0, s.length - q + 1) &&
        t1.distinct.length == t1.length && // occurrence numbering: no dups
        t1 == toks(s) &&                   // deterministic
        // the count-filter law the ED-Join prefix rests on: one edit
        // removes at most q multiset tokens
        (t1.toSet -- t2.toSet).size <= q
    }

  private val docGen: Gen[String] =
    Gen.listOf(Gen.frequency(5 -> token, 2 -> Gen.const(" "), 1 -> Gen.const("\t")))
      .map(_.mkString(" ").take(200))

  property("ngramBuckets: count = max(0, tokens-n+1), bounded by dim, ws-normalization invariant") =
    forAll(docGen, Gen.chooseNum(1, 4), Gen.oneOf(64, 4096)) { (s, n, dim) =>
      def buckets(x: String): Seq[Long] =
        spark.range(1).select(NativeExprs.ngramBucketsNative(lit(x), n, dim))
          .collect().head.getSeq[Long](0)
      val b = buckets(s)
      val nTok = s.trim.split("\\s+").count(_.nonEmpty)
      // the gram is built from TOKENS joined by one space, so any
      // whitespace shape with the same token sequence hashes identically
      val renormed = s.trim.split("\\s+").filter(_.nonEmpty).mkString("  \t ")
      b.length == math.max(0, nTok - n + 1) &&
        b.forall(v => v >= 0 && v < dim) &&
        buckets(renormed) == b
    }

  property("ngramWeightSum = sum of lam over ngramBuckets; zero-weight array scores 0") =
    forAll(docGen, Gen.chooseNum(1, 3)) { (s, n) =>
      val dim = 512
      val lam = Array.tabulate(dim)(i => (i * 31L) % 997 - 498)
      val row = spark.range(1).select(
        NativeExprs.ngramWeightSumNative(lit(s), n, lam).as("w"),
        NativeExprs.ngramWeightSumNative(lit(s), n, new Array[Long](dim)).as("z"),
        NativeExprs.ngramBucketsNative(lit(s), n, dim).as("b"))
        .collect().head
      row.getLong(0) == row.getSeq[Long](2).map(b => lam(b.toInt)).sum &&
        row.getLong(1) == 0L
    }

  // small alphabet (affix sharing likely) + multi-byte and astral code
  // points, so the ASCII fast path, the codepoint fallback, and the
  // prefix/suffix strip all get exercised against the builtin
  private val edPiece: Gen[String] = Gen.frequency(
    (12, Gen.oneOf("a", "b", "c", "ab", "ba")),
    (2, Gen.oneOf("é", "中")),
    (1, Gen.const(new String(Character.toChars(0x10348)))))
  private val edStr: Gen[String] =
    Gen.listOf(edPiece).map(_.mkString.take(40))

  // texts with mixed whitespace (tab/newline — the regex-split edge the
  // space-only trim leaves in), unicode and repeats
  private val wsDoc: Gen[String] = Gen.listOf(Gen.frequency(
    (8, Gen.oneOf("tok", "a1", "b2", "líne", "中文")),
    (3, Gen.oneOf(" ", "  ", "\t", "\n")),
    (1, Gen.const("")))).map(_.mkString(" ").take(120))

  property("segmentKeys == struct(xxhash64, crc32) over the split/slice segment chain") =
    forAll(wsDoc, Gen.chooseNum(1, 4)) { (s, w) =>
      val words = split(trim(lit(s)), "\\s+")
      val nseg = greatest(
        ceil(size(words).cast("double") / w).cast("int"), lit(1))
      val segs = transform(sequence(lit(0), nseg - 1),
        i => array_join(slice(words, i * w + 1, lit(w)), " "))
      def keys(c: org.apache.spark.sql.Column): Seq[(Long, Long)] =
        spark.range(1).select(c.as("k")).collect().head
          .getSeq[org.apache.spark.sql.Row](0).map(r => (r.getLong(0), r.getLong(1)))
      keys(transform(segs, g => struct(xxhash64(g).as("xx"), crc32(g).as("crc")))) ==
        keys(NativeExprs.segmentKeysNative(lit(s), w))
    }

  property("windowKeys == struct(xxhash64, crc32) over the substr window chain") =
    forAll(wsDoc, Gen.chooseNum(2, 12), Gen.chooseNum(1, 5)) { (s, width, stride) =>
      val len = length(lit(s))
      val nWin = when(len >= width,
        floor((len - width).cast("double") / stride).cast("long") + 1L)
        .otherwise(lit(0L))
      val wins = when(nWin > 0,
        transform(sequence(lit(0L), nWin - 1),
          j => lit(s).substr((j * stride + 1).cast("int"), lit(width))))
        .otherwise(array().cast("array<string>"))
      def keys(c: org.apache.spark.sql.Column): Seq[(Long, Long)] =
        spark.range(1).select(c.as("k")).collect().head
          .getSeq[org.apache.spark.sql.Row](0).map(r => (r.getLong(0), r.getLong(1)))
      keys(transform(wins, g => struct(xxhash64(g).as("xx"), crc32(g).as("crc")))) ==
        keys(NativeExprs.windowKeysNative(lit(s), width, stride))
    }

  property("levenshteinBanded == builtin levenshtein(l, r, k) incl. -1 above-threshold") =
    forAll(edStr, edStr, Gen.chooseNum(0, 6)) { (a, b, k) =>
      val row = spark.range(1).select(
        levenshtein(lit(a), lit(b), k).as("ref"),
        NativeExprs.levenshteinBandedNative(lit(a), lit(b), k).as("got"))
        .collect().head
      row.getInt(0) == row.getInt(1)
    }

  property("argminCentroid offset form == argmin over the explicit slice") =
    forAll(Gen.listOfN(12, Gen.chooseNum(-3.0, 3.0)),
           Gen.chooseNum(0, 2), Gen.chooseNum(2, 5)) { (v, sub, k) =>
      val subDim = 4
      val rnd = new scala.util.Random(k * 31 + sub)
      val cb = IndexedSeq.fill(k)(IndexedSeq.fill(subDim)(
        math.floor(rnd.nextDouble() * 1000) / 1000))
      val arr = array(v.map(lit): _*)
      val row = spark.range(1).select(
        NativeExprs.argminCentroidNative(arr, cb, offset = sub * subDim).as("off"),
        NativeExprs.argminCentroidNative(
          slice(arr, sub * subDim + 1, subDim), cb).as("sl"))
        .collect().head
      row.getInt(0) == row.getInt(1)
    }
}

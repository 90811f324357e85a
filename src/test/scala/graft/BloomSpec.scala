package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.NativeExprs
import graft.operators.Sketches

/** Bloom filter laws: zero false negatives by construction, false-
  * positive rate near theory, and the probe actually PRUNES — the
  * whole point of the sketch is that rows which miss the filter never
  * reach the join. The pruned-then-verified result must equal the
  * plain semijoin (q_bloom_prune's oracle contract). */
class BloomSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("bloom-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val m = 1 << 14
  private val k = 5
  private val keys = (0L until 2000L).map(_ * 7919L + 13L)

  private lazy val words =
    Sketches.bloomBuild(keys.toDF("key"), col("key"), m, k)

  test("no false negatives: every inserted key passes the probe") {
    val hits = keys.toDF("key")
      .where(NativeExprs.bloomMightContainNative(col("key"), words, k))
      .count()
    assert(hits == keys.size)
  }

  test("false-positive rate is within 3x of theory") {
    val n = keys.size.toDouble
    val theory = math.pow(1.0 - math.exp(-k * n / m), k)
    val probes = 20000
    // Disjoint from the member keys (which are ≡ 13 mod 7919).
    val nonMembers = (0L until probes.toLong).map(_ * 7919L + 14L)
    val fp = nonMembers.toDF("key")
      .where(NativeExprs.bloomMightContainNative(col("key"), words, k))
      .count()
    val measured = fp.toDouble / probes
    assert(measured <= 3.0 * theory + 0.005,
      s"measured FPR $measured vs theory $theory")
  }

  test("build and probe share the hash: positions of a key are all set") {
    val pos = keys.toDF("key")
      .select(explode(NativeExprs.bloomPositionsNative(col("key"), m.toLong, k)).as("pos"))
      .collect().map(_.getLong(0))
    pos.foreach { p =>
      assert((words((p >>> 6).toInt) & (1L << (p & 63L).toInt)) != 0L)
    }
    assert(pos.forall(p => p >= 0 && p < m))
  }

  test("int keys: interpreted eval (constant folding) agrees with the long-key path") {
    // A foldable child makes the optimizer evaluate the expression
    // interpreted (ConstantFolding calls eval()) — without declared
    // inputTypes an IntegerType key ClassCastExceptioned there while
    // working fine under codegen. lit(13) is IntegerType; keys.head=13.
    val row = spark.range(1).select(
      NativeExprs.bloomMightContainNative(lit(13), words, k).as("hit_int"),
      NativeExprs.bloomMightContainNative(lit(13L), words, k).as("hit_long"),
      NativeExprs.bloomPositionsNative(lit(13), m.toLong, k).as("pos_int"),
      NativeExprs.bloomPositionsNative(lit(13L), m.toLong, k).as("pos_long"))
      .collect()(0)
    assert(row.getBoolean(0) && row.getBoolean(1))
    assert(row.getSeq[Long](2) == row.getSeq[Long](3))
    // int COLUMN keys probe identically to the same values as longs
    val ints = spark.range(0, 500).select(col("id").cast("int").as("key"))
    val gotInt = ints.where(NativeExprs.bloomMightContainNative(col("key"), words, k))
      .collect().map(_.getInt(0)).toSet
    val gotLong = spark.range(0, 500).toDF("key")
      .where(NativeExprs.bloomMightContainNative(col("key"), words, k))
      .collect().map(_.getLong(0).toInt).toSet
    assert(gotInt == gotLong)
  }

  test("pruned-then-verified equals the plain semijoin on testdata") {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val dimKeys = orders.where(col("o_totalprice") > 400000.0)
      .select(col("o_orderkey"))
    val w = Sketches.bloomBuild(dimKeys, col("o_orderkey"), 1 << 17, 5)

    val total = li.count()
    val passed = li.where(
      NativeExprs.bloomMightContainNative(col("l_orderkey"), w, 5)).count()
    assert(passed < total, "bloom probe must prune the scan")

    val pruned = li
      .where(NativeExprs.bloomMightContainNative(col("l_orderkey"), w, 5))
      .join(dimKeys, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val exact = li
      .join(dimKeys, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(pruned == exact)
    assert(exact.nonEmpty, "threshold must select a non-empty key set")
  }

  test("probe runs inside whole-stage codegen on the scan") {
    val df = spark.range(100).toDF("key")
      .where(NativeExprs.bloomMightContainNative(col("key"), words, k))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bloommightcontain"),
      s"probe expression missing from plan:\n$plan")
    // The filter must sit inside a whole-stage-codegen span (the
    // `*(n)` prefix in the plan string), not fall back to
    // interpreted evaluation.
    assert(plan.linesIterator.exists(l =>
      l.contains("Filter bloommightcontain") && l.trim.startsWith("+- *(")), plan)
  }

  test("md5 bloom bit table matches a driver-side recomputation") {
    val df = Seq(1L, 2L, 42L, 99999L, 123456789L).toDF("key")
    val got = Sketches.bloomBitsMd5(df, col("key"), m = 8192, k = 4)
      .collect().map(_.getLong(0)).toSet
    val want = Seq(1L, 2L, 42L, 99999L, 123456789L).flatMap { v =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(v.toString.getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      val h = java.lang.Long.parseLong(hex, 16)
      val h1 = h >>> 16
      val h2 = (h & 0xffffL) * 2 + 1
      (0 until 4).map(i => (h1 + i * h2) % 8192)
    }.toSet
    assert(got == want)
  }
}

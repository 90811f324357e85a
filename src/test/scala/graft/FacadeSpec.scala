package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.ParallelUtilities._

/** Doctest goldens driven through the public facade — the API a
  * reference user would migrate to (FIXTURES.md §5). */
class FacadeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("facade-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("flagship doctest: pmapreduce(x -> x^2, +, 1:100_000)") {
    val got = pmapreduce(spark, IndexedSeq(range(1, 100000)), 8)(
      v => v(0).toLong * v(0).toLong, commutative[Long](_ + _))
    assert(got == 333338333350000L)
  }

  test("ProductSplit doctest rows and point queries") {
    val ps = productSplit(IndexedSeq(range(1, 5), range(2, 4), range(1, 3)), 7, 3)
    assert(ps.toVector.map(_.map(_.toLong)) == Vector(
      Vector(5L, 4L, 1L), Vector(1L, 2L, 2L), Vector(2L, 2L, 2L), Vector(3L, 2L, 2L),
      Vector(4L, 2L, 2L), Vector(5L, 2L, 2L), Vector(1L, 3L, 2L)))
    assert((1 to 3).map(ps.nElements(_)) == Seq(5, 3, 2))
    assert(ps.dropLeading.toVector.map(_.map(_.toLong)) ==
      Vector(Vector(4L, 1L), Vector(2L, 2L), Vector(3L, 2L)))
  }

  test("whichproc / localindex doctests") {
    assert(whichProc(IndexedSeq(range(1, 4), range(2, 3)),
      IndexedSeq(2.0, 3.0), 2).contains(2))
    assert(whichProcLocalIndex(IndexedSeq(range(1, 4), range(2, 8)),
      IndexedSeq(2.0, 4.0), 10).contains((4, 1)))
    assert(whichProc(IndexedSeq(range(1, 10), range(4, 6), range(1, 4)),
      IndexedSeq(100.0, 100.0, 100.0), 1).isEmpty)
  }

  test("procrange_recast doctest: split 5 rank 2 -> np=10 == (3,4)") {
    val iters = IndexedSeq(range(1, 10), range(4, 6), range(1, 4))
    val sl = productSplit(iters, 5, 2)
    assert(procRangeRecast(iters, sl, 10).contains((3, 4)))
  }

  test("pmapreduce_productsplit collect in reverse-lex order (docs doctest)") {
    val got = pmapreduceProductSplit(spark, IndexedSeq(range(1, 3), range(1, 2)), 3)(
      sl => sl.toVector.map(_.map(_.toLong)), op[Vector[IndexedSeq[Long]]](_ ++ _))
    assert(got == Vector(
      IndexedSeq(1L, 1L), IndexedSeq(2L, 1L), IndexedSeq(3L, 1L),
      IndexedSeq(1L, 2L), IndexedSeq(2L, 2L), IndexedSeq(3L, 2L)))
  }

  test("zippedDF + productDF facade") {
    assert(productDF(spark, IndexedSeq(range(1, 3), range(1, 2)), 2).count() == 6)
    assert(zippedDF(spark, IndexedSeq(range(1, 10), steppedRange(2, 2, 20)), 2).count() == 10)
    assert(sectionDF(spark, IndexedSeq(range(1, 3), range(4, 6)), 5, 8).count() == 4)
  }

  test("halve / halveZip / segmented reduce / typed DS facade") {
    val sl = productSplit(IndexedSeq(range(1, 5), range(2, 4)), 2, 1)
    val (a, b) = halve(sl)
    assert(a.length == sl.length / 2 && a.length + b.length == sl.length)
    assert(halveZip(10, 7) == ((10L, 3L), (13L, 4L)))
    val total = pmapreduceSegmented(spark, IndexedSeq(range(1, 100)), 8)(
      t => t(0).toLong, commutative[Long](_ + _), segments = Some(3))
    assert(total == 5050L)
    val ds = productDS(spark, IndexedSeq(range(1, 3), range(1, 2)), 2)
    assert(ds.collect().map(_.dims.sum).sum == 21.0)
  }

  test("loadEvents guards: UTC required, explicit TimestampType, scoped nanos flag") {
    import org.apache.spark.sql.types.TimestampType
    val dir = "/root/testdata/sf0.001"
    val tzKey = "spark.sql.session.timeZone"
    val typeKey = "spark.sql.timestampType"
    val prevTz = spark.conf.get(tzKey)
    try {
      // (a) a non-UTC session must be rejected, not silently shifted
      spark.conf.set(tzKey, "America/New_York")
      val e = intercept[IllegalArgumentException] {
        graft.GraftSession.loadEvents(spark, dir)
      }
      assert(e.getMessage.contains("UTC"))
      // (b) under UTC, ts decodes to TimestampType (LTZ) even when the
      // session's default timestamp type is repointed to NTZ — the
      // cast targets the explicit type object, not the "timestamp"
      // keyword that resolves through this config
      spark.conf.set(tzKey, "UTC")
      spark.conf.set(typeKey, "TIMESTAMP_NTZ")
      try {
        val ev = graft.GraftSession.loadEvents(spark, dir)
        assert(ev.schema("ts").dataType == TimestampType)
        assert(ev.selectExpr("count(ts)").first.getLong(0) > 0)
      } finally spark.conf.unset(typeKey)
    } finally spark.conf.set(tzKey, prevTz)
  }
}

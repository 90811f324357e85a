package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.sources.Sinks

/** Sort-on-write data skipping must actually skip: after writeSorted,
  * a range filter on the sort key has to touch a small fraction of the
  * table — visible in the scan's output-row metric (rows the parquet
  * reader produced AFTER row-group min/max pruning) and in the pushed
  * filters on the scan node. */
class SortedScanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("sorted-scan-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val total = 300000L
  private val dir = sys.props("java.io.tmpdir") + "/graft_sorted_scan_spec"

  test("range filter on the sort key skips most row groups") {
    // Pseudo-random key spread so the pre-write order is NOT sorted —
    // the skip must come from writeSorted's layout, not luck.
    val df = spark.range(total)
      .select((col("id") * 48271L % 300007L).as("key"),
        concat(lit("payload-"), col("id")).as("payload"))
    Sinks.writeSorted(df, dir, Seq("key"), rowGroupBytes = 64L * 1024)

    val back = spark.read.parquet(dir).where(col("key").between(0L, 999L))
    val rows = back.collect()
    assert(rows.nonEmpty && rows.forall { r =>
      val k = r.getLong(0); k >= 0L && k <= 999L
    })

    val finalPlan = back.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = finalPlan.collect { case f: FileSourceScanExec => f }.head
    assert(scan.metadata("PushedFilters").contains("GreaterThanOrEqual(key,0)"),
      scan.metadata("PushedFilters"))
    val scanned = scan.metrics("numOutputRows").value
    assert(scanned < total / 4,
      s"scan produced $scanned of $total rows - row groups were not skipped")
  }

  test("sorted layout yields multiple files with disjoint key ranges") {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
    assert(files.length > 1, s"expected multiple files, got ${files.length}")
    val ranges = files.map { f =>
      val d = spark.read.parquet(f.getAbsolutePath)
        .agg(min("key"), max("key")).collect()(0)
      (d.getLong(0), d.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2,
        s"file ranges overlap: $hi > $lo2")
      case _ =>
    }
  }

  test("zorder2 interleaves bits; writeZOrdered yields files with disjoint code ranges") {
    import spark.implicits._
    // serial Morton oracle on a grid
    def morton(x: Long, y: Long): Long =
      (0 until 21).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val grid = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val df = grid.toDF("x", "y")
    val got = df.select(col("x"), col("y"),
        Sinks.zorder2(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == morton(x, y), s"($x,$y)") }
    // locality: the clustered write produces multiple files whose
    // z-code ranges are pairwise disjoint, so a point/range predicate
    // on either key prunes most files by stats
    val zdir = sys.props("java.io.tmpdir") + "/graft_zorder_spec"
    Sinks.writeZOrdered(df, zdir, "x", "y", numFiles = 8)
    val files = new java.io.File(zdir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length > 1, s"expected multiple files, got ${files.length}")
    val zr = files.map { f =>
      val d = spark.read.parquet(f.getAbsolutePath)
        .select(Sinks.zorder2(col("x"), col("y")).as("z"))
        .agg(min("z"), max("z")).collect()(0)
      (d.getLong(0), d.getLong(1))
    }.sortBy(_._1)
    zr.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2,
        s"z ranges overlap: $hi > $lo2")
      case _ =>
    }
  }
}

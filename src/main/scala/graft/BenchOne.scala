package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time one or more named catalog queries against a testdata
  * dir without running the whole Bench sweep.
  * Usage: runMain graft.BenchOne <sfDir> <query> [query ...]
  * Warm min-of-3 per query (reps consecutive, caches cleared between
  * queries only), same methodology and noop-sink forcing as
  * [[Bench]]. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchOne <sfDir> <query> [query ...]")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt, "graft-bench-one")
    spark.sparkContext.setLogLevel("WARN")
    val meter = new TaskTimeMeter(spark.sparkContext)
    args.drop(1).foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): (Double, Double) = {
        val c0 = meter.snapshotSec()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9, meter.snapshotSec() - c0)
      }
      val ts = (1 to 3).map(_ => once())
      spark.catalog.clearCache()
      println(f"BENCHONE $name%-20s min=${ts.map(_._1).min}%.2f s  task=${ts.map(_._2).min}%.2f s" +
        f"  (wall ${ts.map(t => f"${t._1}%.2f").mkString(" ")} | task ${ts.map(t => f"${t._2}%.2f").mkString(" ")})")
    }
    spark.stop()
  }
}

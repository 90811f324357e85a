package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time one or more named catalog queries against a testdata
  * dir without running the whole Bench sweep.
  * Usage: runMain graft.BenchOne <sfDir> <query> [query ...]
  * Two passes per query (min reported), same noop-sink forcing as
  * [[Bench]]. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchOne <sfDir> <query> [query ...]")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt, "graft-bench-one")
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val (a, b) = (once(), once())
      println(f"BENCHONE $name%-20s min=${math.min(a, b)}%.2f s  (p1=$a%.2f p2=$b%.2f)")
    }
    spark.stop()
  }
}

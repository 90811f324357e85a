package graft

/** Dev tool: dump the FORMATTED physical plan of one or more named
  * catalog queries to files — the per-gate evidence the optimization
  * rounds commit under `plans/rNN/<gate>_{before,after}.txt`.
  * Usage: runMain graft.ExplainOne <sfDir> <outDir> <suffix> <query> [query ...]
  * writes `<outDir>/<query>_<suffix>.txt` per query. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: ExplainOne <sfDir> <outDir> <suffix> <query> [query ...]")
    val (sfDir, outDir, suffix) = (args(0), args(1), args(2))
    // validate every name up front: a typo mid-list used to throw a bare
    // NoSuchElementException after earlier files were already written
    val unknown = args.drop(3).filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")}; valid gates: " +
        SparkEntry.queries.keySet.toSeq.sorted.mkString(", "))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt, "graft-explain-one")
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    args.drop(3).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), txt + "\n")
      println(s"[explain-one] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}

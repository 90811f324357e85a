package graft

/** Dev tool: dump ONE gate query's result to parquet (Verify does all
  * of them) — for fast oracle-parity iteration on a single query:
  * `sbt "runMain graft.VerifyOne <sfDir> <outDir> <query>"`. */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, name) = args
    val spark = GraftSession.build("local[8]", 8, "graft-verify-one")
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, sfDir).coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/$name")
    spark.stop()
  }
}

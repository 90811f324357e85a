package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory with the engine's recommended configuration:
  * shuffle parallelism sized to cores (not the 200 default), AQE with
  * skew-join handling (on by default in Spark 4, pinned here
  * explicitly), UTC, and the Graft Catalyst extensions
  * (native functions + RangePruneRule). */
object GraftSession {

  def build(master: String, cores: Int, appName: String = "graft"): SparkSession =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // let cached plans keep AQE's coalesced output partitioning —
      // off by default, which pins tiny cached frames (LSH signature
      // tables) at the full shuffle-partition count
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()

  /** Register every test table of `dir` as a temp view (events with the
    * nanos-normalized ts), enabling the pure-SQL surface:
    * `spark.sql("SELECT ... FROM lineitem JOIN ...")`. */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    names.foreach { n =>
      spark.read.parquet(s"$dir/$n.parquet").createOrReplaceTempView(n)
    }
    // integral `div`, not `/`: double division corrupts ns-scale longs
    // (see RelationalQueries.t).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .createOrReplaceTempView("events")
  }
}

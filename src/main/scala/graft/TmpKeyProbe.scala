package graft

object TmpKeyProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32, "keyprobe")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def t(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      spark.catalog.clearCache()
      graft.operators.ExplosiveJoin.clearSizingMemo()
      println(f"[ab] $label min=${ts.min}%.2f (${ts.map(x => f"$x%.2f").mkString(" ")})")
    }
    def fp(chunks: Int, target: Long): Unit = {
      // mirror fingerprintJaccardPairs but with explicit knobs
      import graft.operators.{ExplosiveJoin, Repartition}
      val f0 = Repartition.forCompute(docs)
        .select(col("doc_id"),
          graft.functions.TextFunctions.minhashFingerprint(col("text"), 8).as("fp"),
          col("text").as("__t")).cache()
      val f = f0.join(
        broadcast(f0.groupBy("fp").agg(count(lit(1)).as("bsz"))
          .where(col("bsz") > 1000).select("fp")),
        Seq("fp"), "left_anti")
      val a = f.select(col("doc_id").as("id_a"), col("fp"), col("__t").as("__ta"))
      val b = f.select(col("doc_id").as("id_b"), col("fp"), col("__t").as("__tb"))
      ExplosiveJoin.explosiveBucketJoin(a, b, Seq("fp"), "id_b", chunks, target)
        .where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(graft.functions.NativeExprs.jaccardTokenSetsNative(
            col("__ta"), col("__tb")), 6).as("jaccard"))
        .write.format("noop").mode("overwrite").save()
    }
    t("fp chunks=4 (r10 fixed)")(fp(4, 4000000L))
    t("fp chunks=1")(fp(1, 4000000L))
    t("fp AUTO target=4M")(fp(0, 4000000L))
    t("fp AUTO target=50k")(fp(0, 50000L))
    t("fp AUTO target=25k")(fp(0, 25000L))
    spark.stop()
  }
}

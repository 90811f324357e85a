package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.AsofJoin
import graft.plans.AsofJoinNative

/** The native as-of operator (AsofJoinNode/AsofJoinExec) must be
  * result-interchangeable with the union+window composition — same
  * rows, same tie-breaks — while planning as one merge over
  * co-partitioned sorted children (no WindowExec, no union). */
class AsofNativeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // the strategy arrives via GraftExtensions: build our own session
    // rather than inheriting whichever one another suite created
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    GraftSession.build("local[4]", 4, "asof-native-spec")
  }

  import spark.implicits._

  private lazy val rnd = new scala.util.Random(47)

  private def randomSides(n: Int, users: Int) = {
    val left = (0 until n).map { i =>
      (i.toLong, rnd.nextInt(users).toLong, rnd.nextInt(1000).toLong)
    }.toDF("event_id", "user_id", "ts")
    val right = (0 until n).map { i =>
      // duplicate (user, ts) pairs on purpose: the tie-break must match
      (10000L + i, rnd.nextInt(users).toLong, rnd.nextInt(500).toLong * 2)
    }.toDF("signup_event", "user_id", "ts")
    (left, right)
  }

  test("native == composition on random data incl. (key, ts) ties and missing keys") {
    val (left, right) = randomSides(2000, 37)
    val native = AsofJoinNative.backward(left, right, "user_id", "ts", "ts",
      Seq("signup_event"))
      .select("event_id", "user_id", "ts", "signup_event")
    val composed = AsofJoin.backward(left,
      right.select(col("user_id"), col("ts"), col("signup_event")),
      "user_id", "ts", "ts", Seq("signup_event"))
      .select("event_id", "user_id", "ts", "signup_event")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    val n = rows(native)
    val c = rows(composed)
    assert(n == c, s"native minus composed: ${n.diff(c).take(5)}; " +
      s"composed minus native: ${c.diff(n).take(5)}")
    assert(n.size == 2000)
    assert(n.exists(_._4 >= 0) && n.exists(_._4 == -1L),
      "fixture must exercise both matched and unmatched rows")
  }

  test("native == composition on the events table at sf0.001") {
    val ev = graft.GraftSession.loadEvents(spark, "/root/testdata/sf0.001")
      .withColumn("ts", unix_micros(col("ts")))
    val purchases = ev.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val signups = ev.where(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id").as("signup_event"))
    val native = AsofJoinNative.backward(purchases, signups,
      "user_id", "ts", "ts", Seq("signup_event"))
      .select("event_id", "signup_event")
    val composed = AsofJoin.backward(purchases, signups,
      "user_id", "ts", "ts", Seq("signup_event"))
      .select("event_id", "signup_event")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(rows(native) == rows(composed))
  }

  test("forward mode: native == composition on random data") {
    val (left, right) = randomSides(2000, 37)
    val native = AsofJoinNative.forward(left, right, "user_id", "ts", "ts",
      Seq("signup_event"))
      .select("event_id", "user_id", "ts", "signup_event")
    val composed = AsofJoin.forward(left,
      right.select(col("user_id"), col("ts"), col("signup_event")),
      "user_id", "ts", "ts", Seq("signup_event"))
      .select("event_id", "user_id", "ts", "signup_event")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    val n = rows(native)
    assert(n == rows(composed))
    assert(n.exists(_._4 >= 0) && n.exists(_._4 == -1L))
  }

  test("multi-key backward: native == composition") {
    val extraL = (0 until 1500).map { i =>
      (i.toLong, rnd.nextInt(7).toLong, rnd.nextInt(3).toLong, rnd.nextInt(400).toLong)
    }.toDF("event_id", "k1", "k2", "ts")
    val extraR = (0 until 1500).map { i =>
      (20000L + i, rnd.nextInt(7).toLong, rnd.nextInt(3).toLong, rnd.nextInt(400).toLong)
    }.toDF("signup_event", "k1", "k2", "ts")
    val native = AsofJoinNative.backwardKeys(extraL, extraR, Seq("k1", "k2"),
      "ts", "ts", Seq("signup_event"))
      .select("event_id", "signup_event")
    val composed = AsofJoin.backwardKeys(extraL,
      extraR.select(col("k1"), col("k2"), col("ts"), col("signup_event")),
      Seq("k1", "k2"), "ts", "ts", Seq("signup_event"))
      .select("event_id", "signup_event")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(rows(native) == rows(composed))
  }

  test("plan: one exchange + sort per side, a single AsofJoinExec, no window/union") {
    val (left, right) = randomSides(500, 11)
    val df = AsofJoinNative.backward(left, right, "user_id", "ts", "ts",
      Seq("signup_event"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Union"), plan)
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges:\n$plan")
  }

  test("output keeps the left side's partitioning for downstream per-key reuse") {
    val (left, right) = randomSides(500, 11)
    // groupBy on the as-of key directly downstream must NOT add a
    // third exchange: the operator reports its output partitioning.
    val df = AsofJoinNative.backward(left, right, "user_id", "ts", "ts",
      Seq("signup_event"))
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    df.collect()
    // AQE's executed-plan string prints Final AND Initial sections;
    // count only the final one.
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 2, s"expected 2 exchanges (asof inputs only), got $exchanges:\n$plan")
  }

  test("empty right side yields all-null payload") {
    val (left, _) = randomSides(100, 5)
    val right = Seq.empty[(Long, Long, Long)].toDF("signup_event", "user_id", "ts")
      .select("user_id", "ts", "signup_event")
    val out = AsofJoinNative.backward(left, right, "user_id", "ts", "ts",
      Seq("signup_event"))
    assert(out.count() == 100)
    assert(out.where(col("signup_event").isNotNull).count() == 0)
  }
}

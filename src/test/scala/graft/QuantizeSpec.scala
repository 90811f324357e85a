package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Quantize

/** Pins THE quantization law ([[graft.functions.Quantize]]): the
  * Column form (Spark `round(x·10^k, 0)` → long) and the JVM form
  * (BigDecimal HALF_UP on the shortest-decimal of the double) must be
  * bit-identical on every input — including the negative half-grid
  * points where `floor(x+0.5)` (the deliberately-separate Training
  * law) diverges — because operators mix the two forms inside one
  * distributed sum (native expressions quantize JVM-side, Column
  * plans quantize in codegen; a 1-ulp disagreement breaks the
  * hash-exact oracle contract). */
class QuantizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("quantize-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("Column quantize == JVM quantizeDouble bit-for-bit, incl. negative half-grid points") {
    import spark.implicits._
    val halfGrids = for {
      k <- Seq(0, 3, 6, 9)
      m <- Seq(1L, 3L, 1234567L)
      s <- Seq(1, -1)
    } yield s * (m + 0.5) / math.pow(10.0, k) // exactly representable? not necessarily — that's the point
    val edges = Seq(0.0, -0.0, 1.0, -1.0, 0.5, -0.5, 2.5, -2.5,
      0.49999999999999994, -0.49999999999999994, // x+0.5 rounds UP to 1.0: floor(x+0.5) law would differ
      1e-12, -1e-12, math.Pi, -math.E, 123.456789, -123.456789,
      987654.321987, -987654.321987)
    val fuzz = (1 to 200).map(i => math.sin(i.toDouble) * math.pow(10.0, i % 9 - 4))
    val xs = (halfGrids ++ edges ++ fuzz).distinct
    for (k <- Seq(0, 3, 6, 9)) {
      val got = xs.toDF("x").select(Quantize.quantize(col("x"), k))
        .as[Long].collect().toSeq
      val want = xs.map(Quantize.quantizeDouble(_, k))
      assert(got == want, s"k=$k: Column and JVM quantize disagree at " +
        got.zip(want).zip(xs).collect { case ((g, w), x) if g != w => s"x=$x: $g vs $w" }
          .take(5).mkString("; "))
    }
  }

  test("dequantize round-trips the grid and matches the 6-dp output contract") {
    import spark.implicits._
    val qs = Seq(0L, 1L, -1L, 499999L, -500001L, 123456789L, -987654321L)
    val got = qs.toDF("q").select(Quantize.dequantize(col("q"), 6))
      .as[Double].collect().toSeq
    val want = qs.map(q => BigDecimal(q / 1e6).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got == want)
  }

  test("quantizeDecimal survives the long-overflow seam where quantize fails loudly") {
    import spark.implicits._
    // 1.5e10 · 10^9 = 1.5e19 > Long.MaxValue (~9.22e18): under ANSI
    // (the session default) the long cast THROWS — an overflowing
    // quantize seam must fail the job, never truncate silently — while
    // the decimal(38,0) form carries the value exactly.
    val xs = Seq(1.5e10, -1.5e10)
    val dec = xs.toDF("x").select(Quantize.quantizeDecimal(col("x"), 9).cast("string"))
      .as[String].collect().toSeq
    assert(dec == Seq("15000000000000000000", "-15000000000000000000"), dec)
    val e = intercept[Exception] {
      xs.toDF("x").select(Quantize.quantize(col("x"), 9)).as[Long].collect()
    }
    assert(e.getMessage.contains("CAST_OVERFLOW") ||
      e.getCause != null && e.getCause.getMessage.contains("CAST_OVERFLOW"), e.getMessage)
    // and inside long range the two forms agree exactly
    val in = Seq(0.123456, -0.123456, 4.9999995, -4.9999995)
    val a = in.toDF("x").select(Quantize.quantize(col("x"), 6).cast("decimal(38,0)").cast("string"))
      .as[String].collect().toSeq
    val b = in.toDF("x").select(Quantize.quantizeDecimal(col("x"), 6).cast("string"))
      .as[String].collect().toSeq
    assert(a == b)
  }
}

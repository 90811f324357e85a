package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.NativeExprs

/** The native expressions must be BIT-IDENTICAL to the builtin
  * higher-order-function forms they replace — that equivalence is what
  * makes swapping them into oracle-checked queries safe. */
class NativeExprsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("native-exprs-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private lazy val rnd = new scala.util.Random(31)

  test("jaccardNative == size(array_intersect)/size(array_union) on random token arrays") {
    val vocab = Vector("a", "b", "c", "dd", "ee", "fff", "gg", "h", "ii", "jj")
    val rows = (0 until 300).map { i =>
      (i.toLong,
        Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))),
        Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))))
    }
    val df = rows.toDF("id", "ta", "tb")
      .select(col("id"),
        array_distinct(col("ta")).as("a"), array_distinct(col("tb")).as("b"))
    val cmp = df.select(
      NativeExprs.jaccardNative(col("a"), col("b")).as("native"),
      (size(array_intersect(col("a"), col("b"))).cast("double") /
        size(array_union(col("a"), col("b")))).as("builtin"))
      .collect()
    cmp.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("dotNative == aggregate(zip_with) bit-for-bit on random vectors") {
    val rows = (0 until 200).map(i => (i.toLong,
      Array.fill(37)(rnd.nextDouble() * 2 - 1), Array.fill(37)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("id", "a", "b")
    val cmp = df.select(
      NativeExprs.dotNative(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("builtin"))
      .collect()
    cmp.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("minMd5ShingleNative == array_min(transform(charShingles, md5))") {
    import graft.functions.TextFunctions
    val texts = (0 until 100).map { i =>
      val len = 1 + rnd.nextInt(60)
      (i.toLong, Seq.fill(len)(('a' + rnd.nextInt(26)).toChar).mkString)
    }
    val df = texts.toDF("id", "text")
    val cmp = df.select(
      NativeExprs.minMd5ShingleNative(col("text"), 8).as("native"),
      array_min(transform(TextFunctions.charShingles(col("text"), 8),
        s => md5(s.cast("binary")))).as("builtin"))
      .collect()
    cmp.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("native expressions handle nulls like builtins (null in -> null out)") {
    val df = Seq((1L, null.asInstanceOf[Seq[String]], Seq("x"))).toDF("id", "a", "b")
    val r = df.select(
      NativeExprs.jaccardNative(col("a"), col("b")).isNull.as("jn"),
      NativeExprs.simhash64Native(col("a")).isNull.as("sn"))
      .collect().head
    assert(r.getBoolean(0) && r.getBoolean(1))
  }
}

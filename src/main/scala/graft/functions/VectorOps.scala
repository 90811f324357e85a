package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding compression for large-scale similarity pipelines: int8
  * symmetric quantization — 4× smaller than float32, 8× smaller than
  * the double arrays Spark's higher-order functions prefer, with a
  * bounded reconstruction error (|err| ≤ scale/2 per component).
  *
  * Pure builtin Columns (codegen-friendly; vectors are short, so the
  * interpreted-HOF penalty that justifies the native dedup expressions
  * doesn't bite here). Rounding is `floor(x + 0.5)` explicitly, which
  * both the JVM and ANSI SQL engines evaluate identically (library
  * `round()` half-away/half-even conventions differ across engines).
  */
object VectorOps {

  /** Per-vector symmetric int8 quantization:
    * `struct(scale double, q array<int>)` with
    * scale = max(|v|)/127 (floored at 1e-12 for zero vectors) and
    * q_i = floor(v_i/scale + 0.5) ∈ [-127, 127]. */
  def int8Quantize(vec: Column): Column = {
    val v = vec.cast("array<double>")
    val scale = greatest(
      aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x))), lit(1e-12)) / 127.0
    struct(scale.as("scale"),
      transform(v, x => floor(x / scale + 0.5).cast("int")).as("q"))
  }

  /** Inverse of [[int8Quantize]]: q_i * scale as array<double>. */
  def int8Dequantize(quantized: Column): Column =
    transform(quantized.getField("q"),
      q => q.cast("double") * quantized.getField("scale"))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE quantization seam, in one place: every operator that turns a
  * double into an integer before a distributed sum (the
  * order-independence trick used by BM25, the language models,
  * profiling, and curation) goes through these helpers, so the law —
  * HALF_UP onto the 10^k grid — is defined once and pinned by one
  * spec (QuantizeSpec).
  *
  * The Column forms compile to Spark's `round(x · 10^k, 0)` (HALF_UP
  * for the doubles these seams carry); the JVM form is the
  * BigDecimal HALF_UP equivalent used inside native expressions and
  * per-partition loops. `math.pow(10, k)` is exact for |k| ≤ 15, so
  * `· 10^k` is the same literal multiply the inlined `· 1e6`/`· 1e9`
  * forms performed.
  *
  * NOT this law (kept deliberately separate): [[graft.operators
  * .Training]]'s `floor(x + 0.5)` weight updates — that is the
  * gradient-descent replay law the oracle CTEs reproduce verbatim,
  * and `floor(x+0.5)` differs from HALF_UP on negative half-grid
  * points. */
object Quantize {

  /** `x` quantized HALF_UP onto the 10^k integer grid, as long:
    * `round(x · 10^k, 0)` cast to long. */
  def quantize(x: Column, k: Int): Column =
    round(x * lit(math.pow(10.0, k)), 0).cast("long")

  /** [[quantize]] with an unbounded-width result (decimal(38,0)) for
    * seams whose sums can overflow a long (e.g. corpus-wide
    * bits-per-token totals). */
  def quantizeDecimal(x: Column, k: Int): Column =
    round(x * lit(math.pow(10.0, k)), 0).cast("decimal(38,0)")

  /** Inverse seam: a quantized long back to a double on the 10^k
    * grid, rounded to `dp` decimal places (the 6-dp output contract
    * every gate uses). */
  def dequantize(q: Column, k: Int, dp: Int = 6): Column =
    round(q / lit(math.pow(10.0, k)), dp)

  /** JVM-side HALF_UP quantization — bit-identical to [[quantize]]
    * on the same double (Spark's `round(double, 0)` is BigDecimal
    * HALF_UP under the hood). For native expressions and
    * per-partition loops. */
  def quantizeDouble(x: Double, k: Int): Long =
    java.math.BigDecimal.valueOf(x * math.pow(10.0, k))
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
}

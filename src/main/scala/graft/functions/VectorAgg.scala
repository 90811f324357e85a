package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator`s over vector (array<double>) columns — the
  * engine's UDAF surface for group-wise array reduction (SURVEY §2.4:
  * the reference's elementwise ops as aggregation functions). The
  * buffer is a mutable primitive array: Spark aggregation buffers are
  * naturally in-place, mirroring the reference's `elementwisesum!`
  * allocation-avoidance (/root/reference/src/reductionfunctions.jl:84).
  *
  * Use case at scale: per-group embedding centroids (class prototypes,
  * cluster means) over billions of rows — partial aggregation runs
  * map-side, one accumulator per group per partition crosses the wire.
  */
object VectorAgg {

  private val len = (a: Array[Double]) => a.length

  /** Elementwise sum; empty buffer adopts the first row's length. */
  class VectorSum extends Aggregator[Array[Double], Array[Double], Array[Double]] {
    def zero: Array[Double] = Array.empty
    def reduce(buf: Array[Double], row: Array[Double]): Array[Double] =
      if (row == null) buf
      else if (buf.isEmpty) row.clone()
      else {
        var i = 0
        while (i < buf.length) { buf(i) += row(i); i += 1 }
        buf
      }
    def merge(a: Array[Double], b: Array[Double]): Array[Double] =
      if (a.isEmpty) b else if (b.isEmpty) a else reduce(a, b)
    def finish(buf: Array[Double]): Array[Double] = buf
    def bufferEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Elementwise mean (centroid): (sum array, count) buffer. */
  class VectorMean extends Aggregator[Array[Double], (Array[Double], Long), Array[Double]] {
    def zero: (Array[Double], Long) = (Array.empty, 0L)
    def reduce(buf: (Array[Double], Long), row: Array[Double]): (Array[Double], Long) =
      if (row == null) buf
      else if (buf._1.isEmpty) (row.clone(), 1L)
      else {
        val a = buf._1
        var i = 0
        while (i < a.length) { a(i) += row(i); i += 1 }
        (a, buf._2 + 1)
      }
    def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) =
      if (a._1.isEmpty) b
      else if (b._1.isEmpty) a
      else {
        var i = 0
        while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
        (a._1, a._2 + b._2)
      }
    def finish(buf: (Array[Double], Long)): Array[Double] =
      if (buf._2 == 0) Array.empty else buf._1.map(_ / buf._2)
    def bufferEncoder: Encoder[(Array[Double], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
    def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Column-API entry points (usable in groupBy().agg()). */
  def vectorSum(col: Column): Column = udaf(new VectorSum).apply(col)
  def vectorMean(col: Column): Column = udaf(new VectorMean).apply(col)
}

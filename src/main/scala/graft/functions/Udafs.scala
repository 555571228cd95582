package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` examples — the engine's custom-reduction extension
  * point mirroring the reference's `custom_resample_method` callable
  * (reference: core_functions.py:354,387,405-406). Each is a full
  * partial-aggregation citizen: Catalyst plans map-side reduce + merge,
  * so they shuffle one buffer per group, not the rows.
  */
object Udafs {

  /** Root-mean-square: sqrt(avg(x^2)) with null-skipping semantics. */
  case class MomentBuf(var sumSq: Double, var n: Long)

  val rmsAgg: Aggregator[java.lang.Double, MomentBuf, java.lang.Double] =
    new Aggregator[java.lang.Double, MomentBuf, java.lang.Double] {
      def zero: MomentBuf = MomentBuf(0.0, 0L)
      def reduce(b: MomentBuf, x: java.lang.Double): MomentBuf = {
        if (x != null) { b.sumSq += x * x; b.n += 1 }
        b
      }
      def merge(a: MomentBuf, b: MomentBuf): MomentBuf = {
        a.sumSq += b.sumSq; a.n += b.n; a
      }
      def finish(b: MomentBuf): java.lang.Double =
        if (b.n == 0) null else math.sqrt(b.sumSq / b.n)
      def bufferEncoder: Encoder[MomentBuf] = Encoders.product[MomentBuf]
      def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
    }

  /** Column-level RMS, usable anywhere a built-in aggregate is. */
  val rms = udaf(rmsAgg)

  /** Geometric mean via log-sum (null- and nonpositive-skipping). */
  case class GeoBuf(var sumLog: Double, var n: Long)

  val geomeanAgg: Aggregator[java.lang.Double, GeoBuf, java.lang.Double] =
    new Aggregator[java.lang.Double, GeoBuf, java.lang.Double] {
      def zero: GeoBuf = GeoBuf(0.0, 0L)
      def reduce(b: GeoBuf, x: java.lang.Double): GeoBuf = {
        if (x != null && x > 0.0) { b.sumLog += math.log(x); b.n += 1 }
        b
      }
      def merge(a: GeoBuf, b: GeoBuf): GeoBuf = {
        a.sumLog += b.sumLog; a.n += b.n; a
      }
      def finish(b: GeoBuf): java.lang.Double =
        if (b.n == 0) null else math.exp(b.sumLog / b.n)
      def bufferEncoder: Encoder[GeoBuf] = Encoders.product[GeoBuf]
      def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
    }

  val geomean = udaf(geomeanAgg)
}

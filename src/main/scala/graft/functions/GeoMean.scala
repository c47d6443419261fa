package graft.functions

import org.apache.spark.sql.expressions.Aggregator

/** Geometric mean as a typed [[Aggregator]] registered through
  * `functions.udaf` — the UNTYPED/SQL-callable face of the typed
  * aggregation API (the [[SnapshotAggregator]] / KMV twins cover the
  * typed `Dataset` face; this is the rung that makes a custom aggregate
  * a first-class SQL function usable from `spark.sql` text).
  *
  * State is (Σ ln x, n) over strictly-positive inputs — decomposable, so
  * Spark plans it with map-side partial aggregation like any built-in
  * (merge = component-wise add). Non-positive and null inputs are
  * ignored (documented contract, mirrored by the oracle's WHERE). The
  * finished value is a double of order-dependent ln-sums, so gated
  * outputs round to the suite's standard 2dp envelope.
  */
object GeoMean extends Aggregator[java.lang.Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), a: java.lang.Double): (Double, Long) =
    if (a == null || a.doubleValue <= 0.0) b
    else (b._1 + math.log(a.doubleValue), b._2 + 1)
  override def merge(b1: (Double, Long), b2: (Double, Long)): (Double, Long) =
    (b1._1 + b2._1, b1._2 + b2._2)
  override def finish(r: (Double, Long)): Double =
    if (r._2 == 0) Double.NaN else math.exp(r._1 / r._2)
  override def bufferEncoder = org.apache.spark.sql.Encoders.tuple(
    org.apache.spark.sql.Encoders.scalaDouble,
    org.apache.spark.sql.Encoders.scalaLong)
  override def outputEncoder = org.apache.spark.sql.Encoders.scalaDouble
}

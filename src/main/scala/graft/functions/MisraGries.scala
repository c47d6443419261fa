package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items summary as a typed mergeable `Aggregator` —
  * the third tier of the vocabulary-counting family: `vocab_topk` is the
  * exact shuffle (state = full vocabulary), `vocab_cms` the fixed-width
  * sketch (estimates any key, overestimates), and this the HEAVY-HITTER
  * summary: at most k counters of state, every item with true frequency
  * above n/(k+1) guaranteed present, and estimates that UNDERestimate by
  * at most n/(k+1) (the mirror image of CMS's one-sided overestimate).
  *
  * Mergeability is the scale property: partial summaries combine
  * associatively (add counts, then decrement all by the (k+1)-largest
  * count and drop non-positives — Agarwal et al., "Mergeable Summaries",
  * PODS'12), so the plan is an ordinary partial/final typed aggregate:
  * map-side state is k counters per task regardless of vocabulary size,
  * and the shuffle moves k rows per partition. The same summary works as
  * `mapGroupsWithState` state for the streaming rendition.
  *
  * The k-counter invariant makes `reduce` O(1) amortized: the decrement
  * path touches k counters but can run at most n/k times.
  */
object MisraGries {

  /** Summary state: token → counter, at most k entries. */
  type Summary = Map[String, Long]

  final case class HeavyHitter(token: String, est_count: Long)

  /** Shrink a combined counter map back to ≤ k entries: subtract the
    * (k+1)-largest count from everything, keep positives. Equivalent to
    * running the decrement step as many times as needed at once.
    */
  private def shrink(m: Map[String, Long], k: Int): Map[String, Long] =
    if (m.size <= k) m
    else {
      val kth = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      m.collect { case (t, c) if c > kth => t -> (c - kth) }
    }

  /** One observed token (the streaming-state entry point — the same
    * update `mapGroupsWithState` applies per element). */
  def add(b: Summary, token: String, k: Int): Summary =
    b.get(token) match {
      case Some(c)            => b.updated(token, c + 1L)
      case None if b.size < k => b.updated(token, 1L)
      case None               => // decrement-all step, drop zeros
        b.collect { case (t, c) if c > 1L => t -> (c - 1L) }
    }

  /** Combine two partial summaries (mergeable-summaries rule). */
  def combine(a: Summary, b: Summary, k: Int): Summary =
    shrink(b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }, k)

  def aggregator(k: Int): Aggregator[String, Summary, Seq[HeavyHitter]] =
    new Aggregator[String, Summary, Seq[HeavyHitter]] {
      override def zero: Summary = Map.empty

      override def reduce(b: Summary, token: String): Summary = add(b, token, k)

      override def merge(a: Summary, b: Summary): Summary = combine(a, b, k)

      override def finish(b: Summary): Seq[HeavyHitter] =
        b.toSeq.sortBy { case (t, c) => (-c, t) }
          .map { case (t, c) => HeavyHitter(t, c) }

      override def bufferEncoder: Encoder[Summary] = {
        import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
        ExpressionEncoder[Map[String, Long]]()
      }

      override def outputEncoder: Encoder[Seq[HeavyHitter]] = {
        import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
        ExpressionEncoder[Seq[HeavyHitter]]()
      }
    }
}

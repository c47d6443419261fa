package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.operators.{LexiconOps, OrderingOps, WindowsAndStats}

/** Round-6 data-prep operators: winsorize, sliding windows, diversified
  * top-k, OOV-rate — semantic invariants beyond the exact oracle.
  */
class DataPrepOpsSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("winsorize: clipping tightens the mean toward the center, counts bound 5% tails") {
    WindowsAndStats.winsorize(spark, sfDir).collect().foreach { r =>
      val n = r.getAs[Long]("n")
      // each tail clips at most ~5% of rows (interpolated quantile → ±1)
      assert(r.getAs[Long]("n_clipped_lo") <= n / 20 + 1)
      assert(r.getAs[Long]("n_clipped_hi") <= n / 20 + 1)
    }
  }

  test("sliding windows: every event lands in exactly span/hop windows") {
    val ev = graft.engine.Tables.events(spark, sfDir)
    val total = ev.count()
    val windowed = WindowsAndStats.w7SlidingWindow(spark, sfDir)
      .agg(sum("n_events")).head.getLong(0)
    assert(windowed === 2 * total, "6h window / 3h hop must duplicate each event exactly twice")
    // window starts sit on the 3-hour grid
    val offGrid = WindowsAndStats.w7SlidingWindow(spark, sfDir)
      .filter(col("win_start_us") % (3L * 3600 * 1000000L) =!= 0).count()
    assert(offGrid === 0)
  }

  test("diversified top-k: no source exceeds its cap and selection is globally best-first") {
    val rows = OrderingOps.diversifiedTopk(spark, sfDir).collect()
    assert(rows.length === 20)
    val bySource = rows.groupBy(_.getAs[String]("source"))
    assert(bySource.values.forall(_.length <= 2), "a source exceeded the diversity cap")
    // scores are non-increasing in output order
    val scores = rows.map(_.getAs[Long]("n_chars"))
    assert(scores.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("oov rate: rates in [0,1]; a top-100 vocab on a zipf-ish corpus covers most tokens") {
    val rows = LexiconOps.vocabOovRate(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rate = r.getAs[Double]("oov_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("n_oov") <= r.getAs[Long]("n_tokens"))
    }
    // the whole point of a frequency-ranked vocab: it covers the bulk
    val overall = rows.map(r => (r.getAs[Long]("n_oov"), r.getAs[Long]("n_tokens")))
    val rate = overall.map(_._1).sum.toDouble / overall.map(_._2).sum
    assert(rate < 0.9, s"top-100 vocab covers almost nothing (oov=$rate) — tokenization broken?")
  }

  test("oov rate tokenizes the corpus ONCE at runtime (vocab branch reuses the exchange)") {
    // the static plan duplicates the tokenize subtree under both the vocab
    // and the tagging branch; AQE's ReuseExchange must collapse them so the
    // regex pass over the text runs once — the property that matters when
    // the text is 100 TB
    val df = LexiconOps.vocabOovRate(spark, sfDir)
    df.collect() // materialize so AQE finalizes the plan (ADVICE r6: match
    // tree nodes on the final plan, not toString regexes that double-count
    // the "Initial Plan" section)
    val plan = df.queryExecution.executedPlan
    val reused = collectWithSubqueries(plan) {
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r
    }
    assert(reused.nonEmpty, "vocab branch no longer reuses the (source, token) exchange")
    val generates = collectWithSubqueries(plan) {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }
    assert(generates.length === 1,
      s"corpus is tokenized ${generates.length} times in the final plan (want 1)")
  }

  test("w9_range_frame: time-range semantics differ from rows, self always in-frame") {
    val rows = graft.operators.WindowsAndStats.w9RangeFrame(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // the current row is always its own peer: count >= 1 everywhere
    assert(rows.forall(_.getLong(4) >= 1L), "range frame lost the current row")
    // the 6h window must actually vary with event density — if every
    // count were identical the time-range semantics would be vacuously
    // indistinguishable from a constant rows frame on this fixture
    assert(rows.map(_.getLong(4)).distinct.length > 1,
      "constant frame population — fixture can't distinguish RANGE from ROWS")
    // brute recompute for one user: count of that user's events within
    // [ts-6h, ts] must match exactly
    val u = rows.head.getLong(1)
    val mine = rows.filter(_.getLong(1) == u).map(r => (r.getLong(2), r.getLong(4)))
    val ts = mine.map(_._1).sorted
    mine.foreach { case (t, n) =>
      val want = ts.count(x => x >= t - 6L * 3600 * 1000000 && x <= t)
      assert(n == want, s"user $u at $t: frame count $n != brute $want")
    }
  }
}

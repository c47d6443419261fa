package graft

import java.sql.Timestamp

import org.apache.spark.sql.SaveMode
import org.scalacheck.{Gen, Prop}

import graft.operators.EventLifecycleOps

/** ScalaCheck properties for the event-lifecycle family: randomized small
  * event streams checked against independent brute-force Scala references
  * (not against another Spark plan), so a shared dataflow mistake can't
  * self-confirm. Complements `EventLifecycleSpec`'s fixture invariants
  * with adversarial shapes: duplicate timestamps, single-event users,
  * funnel steps out of order, multi-day gaps.
  */
class LifecyclePropertiesSpec extends SparkSpec {

  import spark.implicits._


  private val usPerDay = 86400000000L
  private val base = 1700000000000L // ms

  private case class Ev(eventId: Long, tsMs: Long, userId: Long, tpe: String, value: Double)

  private val evGen: Gen[List[Ev]] = for {
    n <- Gen.choose(30, 70)
    rows <- Gen.listOfN(n, for {
      u <- Gen.choose(0L, 5L)
      // coarse 6h grain makes equal timestamps actually occur; the ~50-day
      // span lets a user's quiet stretch exceed the 28-day MAU horizon
      slot <- Gen.choose(0L, 200L)
      t <- Gen.oneOf("view", "click", "purchase", "error", "signup")
      v <- Gen.choose(0, 10000)
      // values live on the 2^-7 dyadic grid so per-day SUMS are exact in
      // double regardless of addition order — the gapfill property compares
      // a rounded sum exactly, and Spark's aggregation order differs from
      // the driver fold's; a non-dyadic sum within an ulp of a .005
      // boundary flips a cent and falsifies spuriously (observed once in
      // a full-suite run; same order-insensitivity discipline as the
      // emb_kmeans grid snap)
    } yield (u, base + slot * 6L * 3600 * 1000, t, v / 128.0))
  } yield rows.zipWithIndex.map { case ((u, ts, t, v), i) => Ev(i.toLong, ts, u, t, v) }

  private def stage(evs: List[Ev]): String = {
    val dir = tmpDir("graft-lifecycle-prop")
    evs.map(e => (e.eventId, new Timestamp(e.tsMs), e.userId, e.tpe, e.value))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")
    dir
  }

  private def round2(x: Double): Double = math.floor(x * 100 + 0.5) / 100

  test("funnel_steps matches a brute-force per-user walk") {
    checkProp(minTests = 6, p = Prop.forAll(evGen) { evs =>
      val dir = stage(evs)
      val got = EventLifecycleOps.funnelSteps(spark, dir)
        .orderBy("step").collect().map(_.getLong(1)).toSeq
      val byUser = evs.groupBy(_.userId)
      def step(u: Long): (Option[Long], Option[Long], Option[Long]) = {
        val es = byUser(u)
        val t1 = es.filter(_.tpe == "view").map(_.tsMs).minOption
        val t2 = t1.flatMap(a => es.filter(e => e.tpe == "click" && e.tsMs > a).map(_.tsMs).minOption)
        val t3 = t2.flatMap(b => es.filter(e => e.tpe == "purchase" && e.tsMs > b).map(_.tsMs).minOption)
        (t1, t2, t3)
      }
      // .keys is a SET — mapping it directly would DEDUPE users whose
      // (t1,t2,t3) tuples coincide (two users, views at the same
      // coarse-grain ts) and undercount the expectation. This was the
      // r19 one-shot "falsification": the ENGINE was right; the brute
      // force collapsed twin users (r20 forensics, seed
      // 7owKNorqgw1X-To5fLCi7GJ21MFGOjG1yPXWBN0A4cJ=).
      val steps = byUser.keys.toSeq.map(step)
      val expect = Seq(steps.count(_._1.isDefined).toLong,
        steps.count(_._2.isDefined).toLong, steps.count(_._3.isDefined).toLong)
      got == expect
    })
  }

  test("scd2_intervals matches a brute-force run-length collapse") {
    checkProp(minTests = 6, p = Prop.forAll(evGen) { evs =>
      val dir = stage(evs)
      val got = EventLifecycleOps.scd2Intervals(spark, dir)
        .orderBy("user_id", "version").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      val expect = evs.groupBy(_.userId).toSeq.flatMap { case (u, es) =>
        val ordered = es.sortBy(e => (e.tsMs, e.eventId))
        val changes = ordered.zip(Option.empty[String] +: ordered.map(e => Some(e.tpe)))
          .collect { case (e, prev) if !prev.contains(e.tpe) => e }
        changes.zipWithIndex.map { case (e, i) =>
          (u, (i + 1).toLong, e.tpe, e.tsMs * 1000L)
        }
      }.sortBy(t => (t._1, t._2))
      got.toSeq == expect
    })
  }

  test("ts_gapfill matches a brute-force daily resample with forward-fill") {
    checkProp(minTests = 6, p = Prop.forAll(evGen) { evs =>
      val dir = stage(evs)
      val got = EventLifecycleOps.tsGapfill(spark, dir)
        .orderBy("user_id", "day").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      val expect = evs.groupBy(_.userId).toSeq.flatMap { case (u, es) =>
        val daily = es.groupBy(e => e.tsMs * 1000L / usPerDay)
          .map { case (d, g) => d -> (g.size.toLong, round2(g.map(_.value).sum)) }
        val (d0, d1) = (daily.keys.min, daily.keys.max)
        var ff = 0.0
        (d0 to d1).map { d =>
          daily.get(d) match {
            case Some((n, v)) => ff = v; (u, d, n, 0L, v)
            case None         => (u, d, 0L, 1L, ff)
          }
        }
      }.sortBy(t => (t._1, t._2))
      got.toSeq == expect
    })
  }

  test("rolling_active_users matches brute-force trailing-window distinct counts") {
    checkProp(minTests = 6, p = Prop.forAll(evGen) { evs =>
      val dir = stage(evs)
      val got = EventLifecycleOps.rollingActiveUsers(spark, dir)
        .orderBy("day").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val act = evs.map(e => (e.userId, e.tsMs * 1000L / usPerDay)).toSet
      val (d0, d1) = (act.map(_._2).min, act.map(_._2).max)
      def distinctIn(d: Long, k: Long): Long =
        act.collect { case (u, ad) if ad <= d && ad > d - k => u }.size.toLong
      // days where NO user was active in the trailing 28 days produce no
      // row at all (nothing fans out to them) — mirror that, don't expect
      // zero-rows (a >27-day corpus-wide quiet gap is row-free)
      val expect = (d0 to d1)
        .map(d => (d, distinctIn(d, 1), distinctIn(d, 7), distinctIn(d, 28)))
        .filter(_._4 > 0)
      got.toSeq == expect
    })
  }

  test("cohort_retention matches a brute-force purchase-cohort matrix") {
    checkProp(minTests = 6, p = Prop.forAll(evGen) { evs =>
      val dir = stage(evs)
      val got = EventLifecycleOps.cohortRetention(spark, dir)
        .orderBy("cohort_day", "day_offset").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val pd = evs.filter(_.tpe == "purchase")
        .map(e => (e.userId, e.tsMs * 1000L / usPerDay)).distinct
      val cohort = pd.groupBy(_._1).map { case (u, ds) => u -> ds.map(_._2).min }
      val expect = pd.groupBy { case (u, d) => (cohort(u), d - cohort(u)) }
        .map { case ((c, o), g) => (c, o, g.map(_._1).distinct.size.toLong) }
        .toSeq.sortBy(t => (t._1, t._2))
      // streams with no purchases produce an empty matrix on both sides
      got.toSeq == expect
    })
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.SetOps

/** Pins for [[graft.plans.RewriteRunningDistinct]]: the naive
  * `size(collect_set() OVER running-rows)` spelling must be re-planned as
  * the first-seen-flag + cumulative-sum topology (O(1) window state), be
  * value-identical to the hand-written plan, honor collect_set's
  * drop-NULLs semantics, and leave every non-rewritable shape untouched.
  */
class RunningDistinctRewriteSpec extends SparkSpec {

  private def runningW = Window.partitionBy(col("u")).orderBy(col("o"))
    .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  private def nullFixture = {
    import spark.implicits._
    Seq((1L, 1L, "a"), (1L, 2L, null), (1L, 3L, "a"), (1L, 4L, "b"),
      (2L, 1L, null), (2L, 2L, "z")).toDF("u", "o", "x")
  }

  test("naive running size(collect_set) is re-planned: no set-valued state, row_number + sum") {
    val naive = SetOps.runningDistinctNaive(spark, sfDir)
    val opt = naive.queryExecution.optimizedPlan.toString.toLowerCase
    assert(!opt.contains("collect_set"),
      "rewrite did not fire — the window still materializes the distinct set per row")
    assert(opt.contains("row_number"),
      "rewritten plan lost the first-seen row_number stage")
    assert(naive.collect().toSeq === SetOps.runningDistinct(spark, sfDir).collect().toSeq,
      "rewritten plan disagrees with the hand-written first-seen-flag plan")
  }

  test("NULLs are dropped exactly like collect_set drops them") {
    val got = nullFixture
      .select(col("u"), col("o"), size(collect_set(col("x")).over(runningW)).as("d"))
      .orderBy("u", "o").collect().map(r => (r.getLong(0), r.getInt(2))).toSeq
    assert(got === Seq((1L, 1), (1L, 1), (1L, 1), (1L, 2), (2L, 0), (2L, 1)),
      "null x must not count; pre-first-value rows must read 0")
  }

  test("whole-partition collect_set (no running frame) is NOT rewritten") {
    val whole = Window.partitionBy(col("u"))
    val df = nullFixture.select(col("o"), size(collect_set(col("x")).over(whole)).as("d"))
    assert(df.queryExecution.optimizedPlan.toString.toLowerCase.contains("collect_set"),
      "a genuine whole-frame distinct-set request must keep its set semantics")
  }

  test("nondeterministic collect_set input stays single-evaluation sound") {
    // the rule guards on WindowExpression.deterministic so a
    // nondeterministic x never gets re-evaluated across the row_number
    // spec, the flag, and the projections. Through the DataFrame API the
    // guard is unreachable belt-and-suspenders: the analyzer's
    // PullOutNondeterministic materializes rand() in a project BELOW the
    // window first, so the rule sees a deterministic attribute and the
    // rewrite references the once-computed value. This pin asserts that
    // end-to-end soundness: concat(x, rand) values are a.s. distinct, so
    // the running distinct count must equal the running non-null count.
    val df = nullFixture.select(col("u"), col("o"),
      size(collect_set(concat(col("x"), rand(42).cast("string"))).over(runningW)).as("d"))
    val got = df.orderBy("u", "o").collect().map(r => (r.getLong(0), r.getInt(2))).toSeq
    assert(got == Seq((1L, 1), (1L, 1), (1L, 2), (1L, 3), (2L, 0), (2L, 1)),
      "nondeterministic input must behave as if evaluated exactly once per row")
  }

  test("rewritten size attribute stays non-nullable like the original") {
    val df = nullFixture.select(col("o"),
      size(collect_set(col("x")).over(runningW)).as("d"))
    val attr = df.queryExecution.optimizedPlan.output.find(_.name == "d").get
    assert(!attr.nullable,
      "size(collect_set) was non-nullable; the rewrite must not loosen it")
  }

  test("selecting the array itself keeps the set AND its values") {
    val df = nullFixture.select(col("o"),
      collect_set(col("x")).over(runningW).as("s"),
      size(collect_set(col("x")).over(runningW)).as("d"))
    assert(df.queryExecution.optimizedPlan.toString.toLowerCase.contains("collect_set"),
      "the array projection still needs the real collect_set")
    val rows = df.orderBy("o").collect()
    rows.foreach { r =>
      val set = r.getSeq[String](1)
      assert(set.distinct.size == set.size, "array column lost set semantics")
      assert(r.getInt(2) == set.size, "size column disagrees with its own array")
    }
  }

  test("driver-shape parity: naive and explicit spellings share one oracle") {
    assert(SparkEntry.oracleSql("w8_running_distinct_naive") ===
      SparkEntry.oracleSql("w8_running_distinct"))
  }

  test("property: TIED order keys stay in-contract (>=1 for own value, exact end state)") {
    // the original spelling is tie-order-dependent, but ALWAYS includes
    // the current row's own value (>=1 for non-null x) and always ends a
    // partition at the exact distinct count — the r9 review found the
    // unpatched rewrite could emit 0 under ties (two independently-sorted
    // windows); the shared tiebreak id must make these invariants hold
    import org.scalacheck.{Gen, Prop}
    import spark.implicits._
    val rows: Gen[List[(Long, Long, Long, Option[String])]] = for {
      n <- Gen.choose(20, 50)
      rs <- Gen.listOfN(n, for {
        u <- Gen.choose(0L, 2L)
        o <- Gen.choose(0L, 3L) // VERY coarse → heavy ties
        x <- Gen.frequency(4 -> Gen.oneOf("a", "b").map(Some(_)),
          1 -> Gen.const(None))
      } yield (u, o, x))
    } yield rs.zipWithIndex.map { case ((u, o, x), i) => (u, o, i.toLong, x) }
    checkProp(minTests = 8, p = Prop.forAll(rows) { rs =>
      val df = rs.toDF("u", "o", "id", "x")
      val w = Window.partitionBy(col("u")).orderBy(col("o")) // ties NOT broken
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val got = df.select(col("u"), col("x"),
          size(collect_set(col("x")).over(w)).as("d")).collect()
      val okMin = got.forall(r => r.isNullAt(1) || r.getInt(2) >= 1)
      val endOk = got.groupBy(_.getLong(0)).forall { case (u, g) =>
        val want = rs.filter(_._1 == u).flatMap(_._4).distinct.size
        g.map(_.getInt(2)).max == want
      }
      okMin && endOk
    })
  }

  test("property: rewrite equals a brute-force reference on adversarial inputs") {
    // randomized groups, duplicate order keys broken by a unique id, ~25%
    // null values — checked against plain Scala (not another Spark plan)
    import org.scalacheck.{Gen, Prop}
    import spark.implicits._
    val rows: Gen[List[(Long, Long, Long, Option[String])]] = for {
      n <- Gen.choose(20, 60)
      rs <- Gen.listOfN(n, for {
        u <- Gen.choose(0L, 4L)
        o <- Gen.choose(0L, 9L) // coarse → real duplicate order keys
        x <- Gen.frequency(3 -> Gen.oneOf("a", "b", "c", "d").map(Some(_)),
          1 -> Gen.const(None))
      } yield (u, o, x))
    } yield rs.zipWithIndex.map { case ((u, o, x), i) => (u, o, i.toLong, x) }
    checkProp(minTests = 8, p = Prop.forAll(rows) { rs =>
      val df = rs.toDF("u", "o", "id", "x")
      val w = Window.partitionBy(col("u")).orderBy(col("o"), col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val got = df.select(col("u"), col("id"),
          size(collect_set(col("x")).over(w)).as("d"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      // brute force: walk each group in (o, id) order with a growing set
      val want = rs.groupBy(_._1).flatMap { case (_, g) =>
        val sorted = g.sortBy(t => (t._2, t._3))
        var seen = Set.empty[String]
        sorted.map { case (u, _, id, x) =>
          x.foreach(v => seen += v)
          (u, id) -> seen.size
        }
      }
      got == want
    })
  }
}

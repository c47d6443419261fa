package graft

import graft.operators.SetOps

/** Plan + semantics pins for the relational-edge family (SetOps). Each
  * test pins the property its operator's scaladoc claims: decorrelation
  * actually happened, NOT IN kept its null-aware (broadcast-only) shape
  * while NOT EXISTS kept its shuffle-able one, the bag set ops stayed in
  * the count-and-replicate cost class, and the running-DISTINCT curve
  * carries no set-valued window state.
  */
class SetOpsSpec extends SparkSpec {

  test("correlated_above_avg is decorrelated: one aggregate + equi-join, no per-row subquery") {
    val df  = SetOps.correlatedAboveAvg(spark, sfDir)
    val opt = df.queryExecution.optimizedPlan.toString
    // RewriteCorrelatedScalarSubquery must have replaced the per-outer-row
    // subquery with Aggregate(o_custkey) + Join; a surviving scalar
    // subquery in the optimized plan means O(orders^2/customers) work
    assert(!opt.contains("scalar-subquery"),
      "correlated subquery survived optimization — decorrelation regressed")
    assert(opt.contains("Aggregate") && opt.contains("Join"),
      "decorrelated plan should be an aggregate joined back to orders")
    val rows = df.collect()
    assert(rows.nonEmpty, "no orders above 1.5x their customer average — vacuous fixture")
    assert(rows.map(_.getLong(0)).toSeq == rows.map(_.getLong(0)).sorted.toSeq)
  }

  test("not_in_null_trap: NOT IN plans null-aware broadcast anti; NOT EXISTS a plain anti") {
    val df   = SetOps.notInNullTrap(spark, sfDir)
    val phys = df.queryExecution.executedPlan.toString
    // NOT IN with a nullable list REQUIRES every probe row to see every
    // NULL -> Spark can only plan it as a broadcast hash join in
    // null-aware anti mode (BroadcastHashJoinExec's trailing
    // isNullAwareAntiJoin=true flag in the plan string). NOT EXISTS
    // carries no such obligation and stays an ordinary LeftAnti that may
    // shuffle at any list size.
    assert(phys.contains("LeftAnti, BuildRight, true"),
      "NOT IN lost its null-aware anti join — ANSI three-valued logic at risk")
    assert(phys.contains("LeftAnti"), "NOT EXISTS lost its anti-join shape")
    val r = df.collect().head
    val (nIn, nNotIn, nNotExists, nNulls) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nNulls > 0, "probe list lost its NULLs — the trap is vacuous")
    assert(nNotIn == 0L, "NOT IN over a NULL-bearing list must return zero rows (ANSI)")
    assert(nNotExists > 0L && nIn > 0L)
    val total = graft.engine.Tables.customer(spark, sfDir).count()
    assert(nIn + nNotExists == total,
      "IN + NOT EXISTS must partition the customer table")
  }

  test("bag_intersect_except: count-and-replicate plan, no sort-based pairwise compare") {
    val df   = SetOps.bagIntersectExcept(spark, sfDir)
    val opt  = df.queryExecution.optimizedPlan.toString
    val phys = df.queryExecution.executedPlan.toString
    // Spark plans INTERSECT ALL / EXCEPT ALL as per-side count aggregates
    // + Generate(replicate) — groupBy-cost, key-parallel at any scale
    assert(opt.contains("Generate") || opt.contains("replicaterows"),
      "bag set ops lost their count-and-replicate formulation")
    assert(!phys.contains("CartesianProduct") && !phys.contains("SortMergeJoin ExistenceJoin"),
      "bag set ops regressed to a pairwise-compare plan")
    // multiset identities on the fixture: for every key,
    // intersect_all + except_all multiplicity == side-a multiplicity
    val cut = "2024-01-16 00:00:00"
    val ev  = graft.engine.Tables.events(spark, sfDir)
    import org.apache.spark.sql.functions._
    val aCounts = ev.filter(col("ts") < to_timestamp(lit(cut)))
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("m_a"))
    val got = df.groupBy("user_id", "event_type")
      .agg(sum(when(col("op") === "intersect_all", col("n")).otherwise(0L)).as("i"),
           sum(when(col("op") === "except_all", col("n")).otherwise(0L)).as("e"))
    val joined = got.join(aCounts, Seq("user_id", "event_type"), "left")
      .filter(col("i") + col("e") =!= coalesce(col("m_a"), lit(0L)))
    assert(joined.count() == 0, "intersectAll + exceptAll must reconstruct side-a multiplicity")
  }

  test("w8_running_distinct: two keyed exchanges, no set-valued window state") {
    val df   = SetOps.runningDistinct(spark, sfDir)
    val opt  = df.queryExecution.optimizedPlan.toString
    val phys = df.queryExecution.executedPlan.toString
    assert(!opt.contains("collect_set"),
      "running distinct regressed to size(collect_set() OVER ...) — per-row set state")
    // (user_id, event_type) exchange for the first-seen flag + user_id for
    // the running sum; anything beyond those two (plus the presentation
    // range sort) means a formulation regression
    val exchanges = "Exchange hashpartitioning".r.findAllIn(phys).size
    assert(exchanges <= 2, s"expected <=2 hash exchanges, saw $exchanges:\n$phys")
    // the curve is non-decreasing per user and ends at the user's exact
    // distinct-type count
    import org.apache.spark.sql.functions._
    val last = df.groupBy("user_id").agg(max("distinct_types_so_far").as("got"))
    val exact = graft.engine.Tables.events(spark, sfDir)
      .groupBy("user_id").agg(countDistinct("event_type").as("want"))
    val bad = last.join(exact, "user_id").filter(col("got") =!= col("want"))
    assert(bad.count() == 0, "running distinct end-state disagrees with countDistinct")
  }
}

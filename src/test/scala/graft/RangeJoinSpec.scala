package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec

import graft.operators.RangeOps

/** The bucketed range join must agree with the naive non-equi formulation
  * row-for-row, and its physical plan must contain NO nested-loop or
  * cartesian join — the whole point of the bucketize-and-refine rewrite.
  */
class RangeJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("bucketed == naive non-equi join on the fixture") {
    val fast = RangeOps.rangeJoinInflight(spark, sfDir).collect()
    val slow = RangeOps.rangeJoinInflightNaive(spark, sfDir).collect()
    assert(fast.length == slow.length && fast.length > 0)
    assert(fast.sameElements(slow))
  }

  test("bucketed plan: equi hash join on the bucket, no nested loop / cartesian") {
    val df = RangeOps.rangeJoinInflight(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val bnl = collectWithSubqueries(plan) { case j: BroadcastNestedLoopJoinExec => j }
    assert(bnl.isEmpty, "bucketed range join fell back to a nested-loop join")
    val cart = collectWithSubqueries(plan) {
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
    }
    assert(cart.isEmpty, "bucketed range join fell back to a cartesian product")
    val hash = collectWithSubqueries(plan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(hash.nonEmpty, "expected an equi join on the week bucket")
  }

  test("sweep-line count == bucketed join count, with NO join in the plan") {
    val sweep = RangeOps.rangeCountSweep(spark, sfDir)
    val got = sweep.collect()
    val want = RangeOps.rangeJoinInflight(spark, sfDir).collect()
    assert(got.length == want.length && got.length > 0)
    assert(got.sameElements(want))
    val joins = collectWithSubqueries(sweep.queryExecution.executedPlan) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.isEmpty, "sweep-line must not contain any join")
  }

  test("the naive twin really is a nested-loop plan (guard that the rewrite matters)") {
    val plan = RangeOps.rangeJoinInflightNaive(spark, sfDir).queryExecution.executedPlan
    val bnl = collectWithSubqueries(plan) { case j: BroadcastNestedLoopJoinExec => j }
    assert(bnl.nonEmpty,
      "Spark now plans the non-equi join without a nested loop — revisit whether the rewrite is still needed")
  }
}

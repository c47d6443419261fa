package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Whole-operator tier of the custom-code ladder (SURVEY §7.3 preference
  * (c)): the as-of join as a first-class plan node — logical
  * [[AsofJoin]], planner [[AsofJoinStrategy]], physical [[AsofJoinExec]]
  * — registered through `SparkSessionExtensions.injectPlannerStrategy`
  * ([[graft.GraftExtensions]]).
  *
  * Semantics: for each left row, the single right row sharing the
  * equi-key with the greatest `rightTs <= leftTs`, ties on `rightTs`
  * broken by the greatest `rightTie`; unmatched left rows keep nulls
  * (left outer). NULL keys and NULL timestamps never match — SQL
  * comparison semantics, as DuckDB's native `ASOF LEFT JOIN` oracle
  * (reference analytics tier, the era-style point-in-time lookups under
  * `/root/reference/sql/analytics/`) implements them. The compositional
  * [[graft.operators.AsofOps.asofJoin]] stays as the independent twin the
  * specs cross-check on NULL-free keys/timestamps; on rows WITH NULLs the
  * twins deliberately diverge (its window `partitionBy` groups NULL keys
  * together, so it would match them) — this operator is the
  * SQL-semantics one.
  *
  * Physical shape — why this beats the window composition at scale: the
  * composition unions both sides and runs `last_value` over a
  * rows-unbounded window, so the whole union shuffles AND sorts as one
  * stream keyed on (key, ts, tag, tie). The native operator instead
  * declares `ClusteredDistribution` on each side's key and a per-side
  * `(key, ts[, tie])` sort, then streams both partitions through ONE
  * forward merge pass with O(1) state (the last eligible right row). No
  * union blow-up, no window buffering, each side sorted on its own
  * (smaller) stream, and Catalyst/AQE still own the exchanges — they
  * coalesce, reuse, and co-partition them exactly as for a sort-merge
  * join. At 100 TB this is the point-in-time-correct feature-lookup
  * join (training-example enrichment against slowly-changing state)
  * with sort-merge cost, not window cost.
  */
case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTie: Expression) extends BinaryNode {

  require(leftKeys.length == rightKeys.length, "as-of key arity mismatch")
  // no analyzer coercion pass runs for a custom node: mismatched types
  // would silently compare garbage bytes in the merge, so fail loudly here
  leftKeys.zip(rightKeys).foreach { case (l, r) =>
    require(l.dataType == r.dataType,
      s"as-of key type mismatch: ${l.dataType} vs ${r.dataType}")
  }
  require(leftTs.dataType == rightTs.dataType,
    s"as-of timestamp type mismatch: ${leftTs.dataType} vs ${rightTs.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoin]] → [[AsofJoinExec]]. Injected via
  * `injectPlannerStrategy` by [[graft.GraftExtensions]]; also installable
  * at runtime through `spark.experimental.extraStrategies` for sessions
  * built without the extension config.
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lts, rts, tie) =>
      AsofJoinExec(lk, rk, lts, rts, tie, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join. Children are hash-clustered on the equi-keys
  * (EnsureRequirements co-partitions the two exchanges exactly as for a
  * shuffled join) and sorted `(key…, ts)` / `(key…, ts, tie)`, so each
  * zipped partition pair merges in one forward pass: advance the right
  * cursor while it is behind the current left row in (key, ts) order,
  * remembering only the latest key-equal right row seen — O(1) state,
  * no buffering of right groups (the as-of match is unique, unlike a
  * full sort-merge join's many-to-many block).
  */
case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTie: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      Seq(SortOrder(rightTs, Ascending), SortOrder(rightTie, Ascending)))

  // one output row per left row, in left order — left's partitioning and
  // (key, ts) sort order survive, so downstream keyed ops can skip both
  // the exchange and the sort
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      val rBuf = rIter.buffered
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      // consumers (executeCollect, sorts, shuffles) cast to UnsafeRow —
      // same result projection SortMergeJoinExec applies to its output
      val resultProj = UnsafeProjection.create(output, output)
      // latest right row whose key equals matchKey (copies: the
      // projections reuse their buffers across rows)
      var matchRow: InternalRow = null
      var matchKey: UnsafeRow = null
      lIter.map { l =>
        val lk = lKeyProj(l)
        val lt = lTsProj(l)
        // Advance right while it is at-or-before (lk, lt): strictly
        // earlier keys, or same key with rts <= lts (inclusive as-of).
        // Each right row is visited once across the whole partition.
        while (rBuf.hasNext && {
          val rk = rKeyProj(rBuf.head)
          val kc = keyOrd.compare(rk, lk)
          kc < 0 || (kc == 0 && tsOrd.compare(rTsProj(rBuf.head), lt) <= 0)
        }) {
          val r = rBuf.next()
          val rk = rKeyProj(r)
          // NULL key or NULL ts never matches (SQL comparison semantics)
          if (keyOrd.compare(rk, lk) == 0 && !rk.anyNull && !rTsProj(r).isNullAt(0)) {
            matchRow = r.copy()
            matchKey = rk.copy()
          }
        }
        val m =
          if (matchKey != null && !lk.anyNull && !lt.isNullAt(0) &&
              keyOrd.compare(matchKey, lk) == 0) matchRow
          else nullRight
        numOutputRows += 1
        resultProj(joined(l, m))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

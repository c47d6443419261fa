package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, InSubquery}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, ReplaceData, UnaryCommand, WriteDelta}
import org.apache.spark.sql.catalyst.rules.Rule

import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** `DELETE FROM t WHERE k IN (SELECT ...)` as a PLAN-SOURCED equality
  * delete (VERDICT r17 #1's second suggested form, composing with the
  * `t@eq_deletes` channel): for a table that opted into
  * `write.delete.mode='equality'`, a DELETE whose whole condition is
  * one IN-subquery over plain key columns routes the SUBQUERY — a
  * distributed plan — into the channel write, so the statement commits
  * O(tuples) metadata with no target scan, no position resolution, and
  * no driver-side key materialization. Without the rule the same
  * statement plans the group-based COW (or MOR) rewrite, which scans
  * and rewrites the matched groups — correct, but O(table) where the
  * eq-delete tier is O(keys).
  *
  * The rewrite is CONSERVATIVE — any shape it does not prove keeps the
  * row-level path, which is always correct:
  *   - condition must be exactly one [[InSubquery]] (no residual
  *     conjuncts — those would need evaluation against target rows);
  *   - every IN-value must be a plain column of the target (computed
  *     operands change the match semantics the tuple set encodes);
  *   - FLOAT/DOUBLE key columns refuse (boxed equality diverges from
  *     SQL equality on ±0.0/NaN — same contract as the channel);
  *   - the subquery must be uncorrelated and the key columns distinct
  *     (both would break at the channel; the row-level path handles
  *     them).
  * BRANCH targets route too: the rewrite maps a branch table to its
  * own `t@b@eq_deletes` ref, so a curation pass's subquery-DELETE on
  * the branch commits a branch-local tuple set.
  *
  * NULL semantics line up for free: a NULL-carrying subquery tuple
  * never equals anything under SQL `IN`, and the channel drops NULL
  * tuples task-side.
  */
case class RewriteEqDeleteSubquery(session: SparkSession)
    extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    // by Post-Hoc Resolution the analyzer's row-level rewrite has
    // already claimed the DELETE (RewriteDeleteFromTable runs inside
    // the Resolution batch), so the interception point is the
    // REWRITTEN command — ReplaceData for COW, WriteDelta for MOR —
    // whose `condition` field still carries the ORIGINAL delete
    // condition and whose RowLevelOperationTable names the verb
    // (DELETE vs UPDATE/MERGE, which also build these nodes)
    case ReplaceData(rel: DataSourceV2Relation, cond, _, _, _, _, _) =>
      tryRewrite(rel, cond).getOrElse(plan)
    case WriteDelta(rel: DataSourceV2Relation, cond, _, _, _, _) =>
      tryRewrite(rel, cond).getOrElse(plan)
    case _ => plan
  }

  private def tryRewrite(rel: DataSourceV2Relation,
      cond: Expression): Option[LogicalPlan] =
    org.apache.spark.sql.graftbridge.DatasetBridge
      .deleteOperationTarget(rel.table).flatMap { target =>
      cond match {
        // the subquery must be UNCORRELATED: a correlated plan carries
        // OuterReference(target.col) and cannot run standalone as the
        // channel's source — it must keep the row-level path (which
        // plans the correlation as a join against the target)
        case in @ InSubquery(values, lq)
            if in.resolved && lq.outerAttrs.isEmpty &&
              lq.joinCond.isEmpty =>
          graft.sources.GraftCatalog.eqDeleteChannelFor(target)
            .flatMap { channel =>
              val keyAttrs =
                values.collect { case a: AttributeReference => a }
              val sub = lq.plan
              val shapeOk = keyAttrs.length == values.length &&
                keyAttrs.length == sub.output.length &&
                // a REPEATED key column is a channel refusal — fall
                // back rather than break a previously-working DELETE
                keyAttrs.map(_.exprId).distinct.length ==
                  keyAttrs.length &&
                keyAttrs.zip(sub.output).forall { case (k, o) =>
                  k.dataType == o.dataType &&
                    k.dataType != FloatType && k.dataType != DoubleType
                } &&
                keyAttrs.forall(a => rel.output.exists(_.exprId == a.exprId))
              if (shapeOk) {
                // alias the subquery's outputs to the TARGET key names
                // — the channel binds key columns by name
                val aliased = Project(sub.output.zip(keyAttrs).map {
                  case (out, k) => Alias(out, k.name)()
                }, sub)
                Some(EqDeleteFromSubquery(channel, aliased))
              } else None
            }
        case _ => None
      }
    }
}

/** The command the rewrite produces: run `source` (the aliased
  * subquery) as a write into the target's `t@eq_deletes` channel. A
  * [[UnaryCommand]], so `QueryExecution.eagerlyExecuteCommands` runs it
  * like any other DML statement; the child rides along for analysis
  * but execution re-plans it inside the channel write (full optimizer
  * pipeline, pushdown included).
  */
case class EqDeleteFromSubquery(channel: String, source: LogicalPlan)
    extends UnaryCommand {
  override def child: LogicalPlan = source
  override def output: Seq[Attribute] = Nil
  override protected def withNewChildInternal(
      newChild: LogicalPlan): EqDeleteFromSubquery = copy(source = newChild)
}

class EqDeleteStrategy(session: SparkSession) extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case EqDeleteFromSubquery(channel, source) =>
      EqDeleteExec(channel, source) :: Nil
    case _ => Nil
  }
}

/** Physical command: one channel write. The key set never surfaces on
  * the driver — tasks dedup and ship tuples through the V2 commit
  * protocol ([[graft.sources.GraftEqDeleteBatchWrite]]); `.distinct()`
  * is deliberately absent (the channel dedups without a shuffle).
  * `session` is [[SparkPlan]]'s own (captured at planning).
  */
case class EqDeleteExec(channel: String, source: LogicalPlan)
    extends LeafExecNode {
  override def output: Seq[Attribute] = Nil
  private lazy val done: Array[InternalRow] = {
    org.apache.spark.sql.graftbridge.DatasetBridge
      .ofRows(session, source).writeTo(channel).append()
    Array.empty
  }
  override def executeCollect(): Array[InternalRow] = done
  override protected def doExecute(): RDD[InternalRow] = {
    done
    sparkContext.parallelize(Seq.empty[InternalRow], 1)
  }
}

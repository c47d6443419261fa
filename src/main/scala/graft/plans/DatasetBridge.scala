package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** `Dataset.ofRows` is `private[sql]`, so turning a hand-built
  * [[LogicalPlan]] (graft's [[graft.plans.AsofJoin]]) into a DataFrame
  * needs one forwarder inside the `org.apache.spark.sql` package tree —
  * the standard pattern every open-source Spark plan extension uses
  * (Sedona, Delta, Qbeast all ship exactly this shim). Nothing else in
  * the repo lives outside the `graft` namespace, and nothing here
  * touches non-public behavior beyond the access widening.
  */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed plan backing a DataFrame, for building composite
    * logical nodes whose expressions must reference resolved child
    * attributes.
    */
  def analyzed(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  /** Unwrap a row-level operation table iff its verb is DELETE —
    * `RowLevelOperationTable` is `private[sql]`, so the single type
    * test [[graft.plans.RewriteEqDeleteSubquery]] needs (DELETE vs the
    * UPDATE/MERGE rewrites that build the same ReplaceData/WriteDelta
    * nodes) lives in this shim.
    */
  def deleteOperationTarget(
      t: org.apache.spark.sql.connector.catalog.Table)
      : Option[org.apache.spark.sql.connector.catalog.Table] = t match {
    case r: org.apache.spark.sql.connector.write.RowLevelOperationTable
        if r.operation.command ==
          org.apache.spark.sql.connector.write.RowLevelOperation.Command.DELETE =>
      Some(r.table)
    case _ => None
  }
}

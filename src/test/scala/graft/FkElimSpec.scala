package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.plans.ConstraintCatalog
import graft.plans.ConstraintCatalog.FkRi

/** Plan pins for [[graft.plans.FkJoinElimination]]: the join disappears
  * exactly when the declared FK-with-RI constraint proves it redundant,
  * refuses everything else, and preserves inner-join null semantics via
  * the isnotnull guard.
  */
class FkElimSpec extends SparkSpec {

  private def joins(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case j: Join => j }.size

  private def scans(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toUri.getPath)
        case _ => Seq.empty[String]
      }
    }.flatten

  private val fixtureFk =
    FkRi(s"$sfDir/lineitem.parquet", "l_orderkey",
      s"$sfDir/orders.parquet", "o_orderkey")

  test("fk_join_elim drops the join and the orders scan; result equals the joined recompute") {
    val got = graft.operators.WarehouseOps.fkJoinElim(spark, sfDir)
    assert(joins(got) === 0)
    assert(!scans(got).exists(_.endsWith("orders.parquet")),
      "eliminated plan must not scan the dimension")
    val want = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        (sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
          .cast("long")) / 100.0).as("revenue"))
      .orderBy("l_returnflag")
    assert(got.collect().toSeq === want.collect().toSeq)
  }

  test("refusals: dim column used / constraint undeclared / filtered dimension keep the join") {
    def joined() = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
    // undeclared: catalog empty
    assert(joins(joined().groupBy(col("l_returnflag")).agg(count(lit(1)))) === 1)
    ConstraintCatalog.declare(fixtureFk)
    try {
      // a dim column in the output keeps the scan wider than the key
      assert(joins(joined().groupBy(col("o_orderstatus")).agg(count(lit(1)))) === 1)
      // a filtered dimension changes which fact rows survive
      val filteredDim = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir).filter(col("o_totalprice") > 0)
          .select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)))
      assert(joins(filteredDim) === 1)
      // and the key-only projection IS eliminated under the declaration
      assert(joins(joined().groupBy(col("l_returnflag")).agg(count(lit(1)))) === 0)
    } finally ConstraintCatalog.undeclare(fixtureFk)
  }

  test("nullable fk: inner elimination inserts the isnotnull guard, left outer does not") {
    val root = tmpDir("graft-fkelim-null")
    val child = Tables.events(spark, sfDir)
      .select(col("event_id"),
        when(col("event_id") % 5 === 0, lit(null).cast("long"))
          .otherwise(col("event_id") % 50).as("fk"))
    child.write.mode("overwrite").parquet(s"$root/child")
    spark.range(0, 50).select(col("id").as("pk")).coalesce(1)
      .write.mode("overwrite").parquet(s"$root/parent")
    val c = FkRi(s"$root/child", "fk", s"$root/parent", "pk")
    ConstraintCatalog.declare(c)
    try {
      val ch = spark.read.parquet(s"$root/child")
      val pa = spark.read.parquet(s"$root/parent")

      val inner = ch.join(pa, col("fk") === col("pk"))
        .agg(count(lit(1)).as("n"))
      assert(joins(inner) === 0)
      assert(inner.queryExecution.optimizedPlan.collect {
        case f: Filter => f }.nonEmpty,
        "inner elimination on a nullable fk must keep the null-dropping filter")
      val expectInner = ch.filter(col("fk").isNotNull).count()
      assert(inner.collect().head.getLong(0) === expectInner)

      val louter = ch.join(pa, col("fk") === col("pk"), "left_outer")
        .agg(count(lit(1)).as("n"))
      assert(joins(louter) === 0)
      assert(louter.collect().head.getLong(0) === ch.count(),
        "left-outer elimination must keep every child row, null fks included")
    } finally ConstraintCatalog.undeclare(c)
  }
}

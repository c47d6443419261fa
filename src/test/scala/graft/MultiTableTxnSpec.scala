package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.sources.{GraftCatalog, GraftStore}

/** MULTI-TABLE transactions via composed WAP
  * (`CALL system.publish_tables`): every listed branch publishes in ONE
  * catalog-level commit — all fences first, then all fast-forwards
  * under one lock — so both ledgers advance or neither. The
  * all-or-nothing pin is the load-bearing one: a single stale table
  * must refuse the WHOLE call with every main untouched and every
  * branch still alive for rebase.
  */
class MultiTableTxnSpec extends SparkSpec {

  private def cat(): Unit =
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[graft.sources.GraftCatalog].getName)

  private def seed(t1: String, t2: String): Unit = {
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    base.writeTo(s"graft_cat.spec.$t1").create()
    base.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .writeTo(s"graft_cat.spec.$t2").create()
  }

  test("publish_tables lands both branches in one commit; the cross-table invariant holds") {
    cat()
    seed("mt1a", "mt1b")
    try {
      val v1 = GraftStore.versionCount("cat::graft_cat.spec.mt1a")
      val v2 = GraftStore.versionCount("cat::graft_cat.spec.mt1b")
      spark.sql("CALL graft_cat.system.create_branch('spec.mt1a', 'tx')")
      spark.sql("CALL graft_cat.system.create_branch('spec.mt1b', 'tx')")
      spark.sql("DELETE FROM graft_cat.spec.`mt1a@tx` WHERE value < 30")
      spark.sql(
        """MERGE INTO graft_cat.spec.`mt1b@tx` m
          |USING (SELECT event_type, count(*) AS n
          |       FROM graft_cat.spec.`mt1a@tx` GROUP BY event_type) c
          |ON m.event_type = c.event_type
          |WHEN MATCHED THEN UPDATE SET n = c.n
          |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      val res = spark.sql(
        "CALL graft_cat.system.publish_tables('spec.mt1a@tx,spec.mt1b@tx')")
        .orderBy("table").collect()
      assert(res.length === 2)
      // each main advanced by EXACTLY the publish commit
      assert(GraftStore.versionCount("cat::graft_cat.spec.mt1a") === v1 + 1)
      assert(GraftStore.versionCount("cat::graft_cat.spec.mt1b") === v2 + 1)
      // branches reaped
      assert(!GraftCatalog.branches.keys
        .exists(_.startsWith("cat::graft_cat.spec.mt1")))
      // the invariant the transaction protects: manifest == live counts
      val corpus = spark.table("graft_cat.spec.mt1a")
        .groupBy("event_type").agg(count(lit(1)).as("n_live"))
      val bad = corpus.join(spark.table("graft_cat.spec.mt1b"), "event_type")
        .filter(col("n_live") =!= col("n")).count()
      assert(bad === 0L, "manifest and corpus diverged after the txn")
      assert(spark.table("graft_cat.spec.mt1a")
        .filter(col("value") < 30).count() === 0L)
    } finally {
      spark.sql("DROP TABLE graft_cat.spec.mt1a")
      spark.sql("DROP TABLE graft_cat.spec.mt1b")
    }
  }

  test("all-or-nothing: one stale table refuses the WHOLE publish; neither main moves, branches survive for rebase") {
    cat()
    seed("mt2a", "mt2b")
    try {
      spark.sql("CALL graft_cat.system.create_branch('spec.mt2a', 'tx')")
      spark.sql("CALL graft_cat.system.create_branch('spec.mt2b', 'tx')")
      spark.sql("DELETE FROM graft_cat.spec.`mt2a@tx` WHERE value < 30")
      spark.sql("UPDATE graft_cat.spec.`mt2b@tx` SET n = n + 1")
      // main of the SECOND table advances after the fork → stale
      spark.sql(
        "INSERT INTO graft_cat.spec.mt2b VALUES ('zzz_concurrent', 1)")
      val v1 = GraftStore.versionCount("cat::graft_cat.spec.mt2a")
      val v2 = GraftStore.versionCount("cat::graft_cat.spec.mt2b")
      val rows1 = spark.table("graft_cat.spec.mt2a").count()
      val ex = intercept[Exception] {
        spark.sql(
          "CALL graft_cat.system.publish_tables('spec.mt2a@tx,spec.mt2b@tx')")
          .head
      }
      assert(ex.getMessage.contains("cannot fast-forward"),
        ex.getMessage.take(160))
      // NOTHING moved — including the table whose own fence passed
      // (mt2a precedes mt2b in the refs list, so a one-phase publish
      // would have landed it before hitting the stale fence)
      assert(GraftStore.versionCount("cat::graft_cat.spec.mt2a") === v1,
        "the fenced-out publish leaked the first table's commit")
      assert(GraftStore.versionCount("cat::graft_cat.spec.mt2b") === v2)
      assert(spark.table("graft_cat.spec.mt2a").count() === rows1)
      // both branches are still alive: the rebase path exists
      assert(GraftCatalog.branches
        .contains("cat::graft_cat.spec.mt2a#b=tx"))
      assert(GraftCatalog.branches
        .contains("cat::graft_cat.spec.mt2b#b=tx"))
      // rebase: re-branch the stale table, re-apply, retry succeeds
      spark.sql("CALL graft_cat.system.drop_branch('spec.mt2b', 'tx')")
      spark.sql("CALL graft_cat.system.create_branch('spec.mt2b', 'tx')")
      spark.sql("UPDATE graft_cat.spec.`mt2b@tx` SET n = n + 1")
      spark.sql(
        "CALL graft_cat.system.publish_tables('spec.mt2a@tx,spec.mt2b@tx')")
        .head
      assert(spark.table("graft_cat.spec.mt2a")
        .filter(col("value") < 30).count() === 0L)
    } finally {
      spark.sql("DROP TABLE graft_cat.spec.mt2a")
      spark.sql("DROP TABLE graft_cat.spec.mt2b")
    }
  }

  test("refusals: malformed refs and duplicate tables") {
    cat()
    seed("mt3a", "mt3b")
    try {
      val e1 = intercept[Exception] {
        spark.sql("CALL graft_cat.system.publish_tables('spec.mt3a')").head
      }
      assert(e1.getMessage.contains("must be"), e1.getMessage.take(120))
      spark.sql("CALL graft_cat.system.create_branch('spec.mt3a', 'tx')")
      val e2 = intercept[Exception] {
        spark.sql(
          "CALL graft_cat.system.publish_tables('spec.mt3a@tx,spec.mt3a@tx')")
          .head
      }
      assert(e2.getMessage.contains("twice"), e2.getMessage.take(120))
      // the refused calls left the branch alive
      assert(GraftCatalog.branches
        .contains("cat::graft_cat.spec.mt3a#b=tx"))
    } finally {
      spark.sql("DROP TABLE graft_cat.spec.mt3a")
      spark.sql("DROP TABLE graft_cat.spec.mt3b")
    }
  }

  test("cross-table READ consistency: a mid-swap view tears; VERSION AS OF the returned ordinals never does (VERDICT r17 #5)") {
    cat()
    seed("mt4a", "mt4b")
    try {
      // capture the PRE-publish ordinals — the exact versions a reader
      // that already resolved t2 before the swap would be serving
      val preA = GraftStore.versionCount("cat::graft_cat.spec.mt4a") - 1
      val preB = GraftStore.versionCount("cat::graft_cat.spec.mt4b") - 1
      spark.sql("CALL graft_cat.system.create_branch('spec.mt4a', 'tx')")
      spark.sql("CALL graft_cat.system.create_branch('spec.mt4b', 'tx')")
      spark.sql("DELETE FROM graft_cat.spec.`mt4a@tx` WHERE value < 30")
      spark.sql(
        """MERGE INTO graft_cat.spec.`mt4b@tx` m
          |USING (SELECT event_type, count(*) AS n
          |       FROM graft_cat.spec.`mt4a@tx` GROUP BY event_type) c
          |ON m.event_type = c.event_type
          |WHEN MATCHED THEN UPDATE SET n = c.n
          |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      val pub = spark.sql("CALL graft_cat.system.publish_tables(" +
        "'spec.mt4a@tx,spec.mt4b@tx')").collect()
        .map(r => r.getString(0) -> r.getInt(2)).toMap
      def recount(corpus: org.apache.spark.sql.DataFrame,
          manifest: org.apache.spark.sql.DataFrame): Boolean = {
        val byType = corpus.groupBy(col("event_type"))
          .agg(count(lit(1)).as("nc"))
        byType.join(manifest, Seq("event_type"), "full_outer")
          .filter(col("nc").isNull || col("n").isNull ||
            col("nc") =!= col("n")).isEmpty
      }
      // the MID-SWAP view a reader can observe (t1-new + t2-old, the
      // documented boundary): provably INCONSISTENT
      val torn = recount(
        spark.sql(s"SELECT * FROM graft_cat.spec.mt4a VERSION AS OF " +
          pub("spec.mt4a")),
        spark.sql(s"SELECT * FROM graft_cat.spec.mt4b VERSION AS OF $preB"))
      assert(!torn, "t1-new + t2-old must tear (else the pin is vacuous)")
      // the recipe: both AS OF the returned ordinals — consistent
      assert(recount(
        spark.sql(s"SELECT * FROM graft_cat.spec.mt4a VERSION AS OF " +
          pub("spec.mt4a")),
        spark.sql(s"SELECT * FROM graft_cat.spec.mt4b VERSION AS OF " +
          pub("spec.mt4b"))),
        "VERSION AS OF the returned ordinals must be mutually consistent")
      // and the PRE-transaction pair is consistent too (it was a
      // consistent state once) — the boundary is only the mixed view
      assert(recount(
        spark.sql(s"SELECT * FROM graft_cat.spec.mt4a VERSION AS OF $preA"),
        spark.sql(s"SELECT * FROM graft_cat.spec.mt4b VERSION AS OF $preB")))
      // drift both tables: current reads diverge from the transaction,
      // the as-of recipe keeps serving it
      spark.sql("INSERT INTO graft_cat.spec.mt4b VALUES ('drift', 999)")
      assert(recount(
        spark.sql(s"SELECT * FROM graft_cat.spec.mt4a VERSION AS OF " +
          pub("spec.mt4a")),
        spark.sql(s"SELECT * FROM graft_cat.spec.mt4b VERSION AS OF " +
          pub("spec.mt4b"))))
    } finally {
      spark.sql("DROP TABLE graft_cat.spec.mt4a")
      spark.sql("DROP TABLE graft_cat.spec.mt4b")
    }
  }
}

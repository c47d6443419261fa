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

  test("catalog publish ordinal: ONE 'txn<N>' token reads every published table consistently; outsiders refuse (VERDICT r18 #5)") {
    cat()
    seed("mt5a", "mt5b")
    spark.sql("CREATE TABLE graft_cat.spec.mt5c (id BIGINT)")
    try {
      spark.sql("CALL graft_cat.system.create_branch('spec.mt5a', 'tx')")
      spark.sql("CALL graft_cat.system.create_branch('spec.mt5b', 'tx')")
      spark.sql("DELETE FROM graft_cat.spec.`mt5a@tx` WHERE value < 30")
      spark.sql(
        """MERGE INTO graft_cat.spec.`mt5b@tx` m
          |USING (SELECT event_type, count(*) AS n
          |       FROM graft_cat.spec.`mt5a@tx` GROUP BY event_type) c
          |ON m.event_type = c.event_type
          |WHEN MATCHED THEN UPDATE SET n = c.n
          |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      val pub = spark.sql("CALL graft_cat.system.publish_tables(" +
        "'spec.mt5a@tx,spec.mt5b@tx')").collect()
      // every row of one publish carries the SAME catalog ordinal
      val cvs = pub.map(_.getLong(3)).distinct
      assert(cvs.length === 1, "one catalog ordinal per publish call")
      val cv = cvs.head
      // and it equals per-table resolution of the returned ordinals
      pub.foreach { r =>
        val tbl = r.getString(0)
        val perTable = spark.sql(
          s"SELECT count(*) FROM graft_cat.$tbl VERSION AS OF ${r.getInt(2)}")
          .head.getLong(0)
        val byToken = spark.sql(
          s"SELECT count(*) FROM graft_cat.$tbl VERSION AS OF 'txn$cv'")
          .head.getLong(0)
        assert(byToken === perTable,
          s"$tbl: token read must equal the per-ordinal read")
      }
      // drift both tables: the token keeps serving the transaction
      spark.sql("INSERT INTO graft_cat.spec.mt5b VALUES ('drift', 999)")
      val byType = spark.sql(
        s"SELECT * FROM graft_cat.spec.mt5a VERSION AS OF 'txn$cv'")
        .groupBy(col("event_type")).agg(count(lit(1)).as("nc"))
      val manifest = spark.sql(
        s"SELECT * FROM graft_cat.spec.mt5b VERSION AS OF 'txn$cv'")
      assert(byType.join(manifest, Seq("event_type"), "full_outer")
        .filter(col("nc").isNull || col("n").isNull ||
          col("nc") =!= col("n")).isEmpty,
        "the single-token cross-table read must be mutually consistent")
      // a table OUTSIDE the publish set refuses the token — serving
      // its nearest ordinal would fake consistency
      val e1 = intercept[Exception] {
        spark.sql(
          s"SELECT * FROM graft_cat.spec.mt5c VERSION AS OF 'txn$cv'")
          .collect()
      }
      assert(e1.getMessage.contains("not part of catalog publish"),
        e1.getMessage.take(200))
      // an unknown ordinal refuses too
      val e2 = intercept[Exception] {
        spark.sql(
          "SELECT * FROM graft_cat.spec.mt5a VERSION AS OF 'txn999999'")
          .collect()
      }
      assert(e2.getMessage.contains("no catalog publish"),
        e2.getMessage.take(200))
      // tags can no longer shadow the token namespace
      val e3 = intercept[Exception] {
        spark.sql("CALL graft_cat.system.create_tag('spec.mt5a', 'txn1')")
      }
      assert(e3.getMessage.contains("catalog publish ordinal"),
        e3.getMessage.take(200))
    } finally {
      spark.sql("DROP TABLE graft_cat.spec.mt5a")
      spark.sql("DROP TABLE graft_cat.spec.mt5b")
      spark.sql("DROP TABLE graft_cat.spec.mt5c")
    }
  }

  test("publish ordinal lifecycle: drop tombstones its pin; full expiry retires the token with the retention message (VERDICT r19 #6)") {
    cat()
    seed("mt6a", "mt6b")
    try {
      spark.sql("CALL graft_cat.system.create_branch('spec.mt6a', 'tx')")
      spark.sql("CALL graft_cat.system.create_branch('spec.mt6b', 'tx')")
      spark.sql("DELETE FROM graft_cat.spec.`mt6a@tx` WHERE value < 30")
      val cv = spark.sql("CALL graft_cat.system.publish_tables(" +
        "'spec.mt6a@tx,spec.mt6b@tx')").head.getLong(3)
      // push mt6a's head past the pin, then expire everything older:
      // the PIN is dead while the publish entry itself is still live
      spark.sql("INSERT INTO graft_cat.spec.mt6a VALUES (1, 'x', 1.0)")
      spark.sql("CALL graft_cat.system.expire_versions('spec.mt6a', 1)")
      val e1 = intercept[Exception] {
        spark.sql(s"SELECT * FROM graft_cat.spec.mt6a " +
          s"VERSION AS OF 'txn$cv'").collect()
      }
      assert(e1.getMessage.contains("EXPIRED by retention"),
        e1.getMessage.take(200))
      // the OTHER table's pin still serves the token
      assert(spark.sql(s"SELECT count(*) FROM graft_cat.spec.mt6b " +
        s"VERSION AS OF 'txn$cv'").head.getLong(0) > 0L)
      // DROP + re-CREATE of the remaining pinned table: the token must
      // refuse, never resolve the old ordinal against the successor's
      // ledger (ADVICE r19 finding 1)
      spark.sql("DROP TABLE graft_cat.spec.mt6b")
      spark.range(3).select(col("id")).writeTo("graft_cat.spec.mt6b")
        .create()
      val e2 = intercept[Exception] {
        spark.sql(s"SELECT * FROM graft_cat.spec.mt6b " +
          s"VERSION AS OF 'txn$cv'").collect()
      }
      assert(e2.getMessage.contains("dropped or replaced"),
        e2.getMessage.take(200))
      // with EVERY pin dead, the next retention pass retires the
      // ordinal off the live map — and it keeps refusing with the
      // RETENTION message, not "no catalog publish" / NoSuchTable
      spark.sql("CALL graft_cat.system.expire_versions('spec.mt6b', 1)")
      val e3 = intercept[Exception] {
        spark.sql(s"SELECT * FROM graft_cat.spec.mt6a " +
          s"VERSION AS OF 'txn$cv'").collect()
      }
      assert(e3.getMessage.contains("EXPIRED by retention"),
        e3.getMessage.take(200))
      assert(!e3.getMessage.contains("no catalog publish"),
        e3.getMessage.take(200))
    } finally {
      spark.sql("DROP TABLE graft_cat.spec.mt6a")
      spark.sql("DROP TABLE graft_cat.spec.mt6b")
    }
  }

  test("rename cannot overwrite a dropped table's publish tombstone: the token keeps refusing for the dead pin") {
    cat()
    seed("mt7a", "mt7b")
    try {
      spark.sql("CALL graft_cat.system.create_branch('spec.mt7a', 'tx')")
      spark.sql("CALL graft_cat.system.create_branch('spec.mt7b', 'tx')")
      val cv = spark.sql("CALL graft_cat.system.publish_tables(" +
        "'spec.mt7a@tx,spec.mt7b@tx')").head.getLong(3)
      spark.sql("DROP TABLE graft_cat.spec.mt7b") // pin(b) -> tombstone
      spark.sql("ALTER TABLE graft_cat.spec.mt7a RENAME TO spec.mt7b")
      // the renamed table must NOT impersonate the dropped table the
      // publish pinned under this name (review r20)
      val e1 = intercept[Exception] {
        spark.sql(s"SELECT * FROM graft_cat.spec.mt7b " +
          s"VERSION AS OF 'txn$cv'").collect()
      }
      assert(e1.getMessage.contains("dropped or replaced"),
        e1.getMessage.take(200))
      // ... and the renamed table's own pin is gone, not mis-served
      spark.range(2).select(col("id")).writeTo("graft_cat.spec.mt7a")
        .create()
      val e2 = intercept[Exception] {
        spark.sql(s"SELECT * FROM graft_cat.spec.mt7a " +
          s"VERSION AS OF 'txn$cv'").collect()
      }
      assert(e2.getMessage.contains("not part of catalog publish"),
        e2.getMessage.take(200))
    } finally {
      scala.util.Try(spark.sql("DROP TABLE graft_cat.spec.mt7a"))
      scala.util.Try(spark.sql("DROP TABLE graft_cat.spec.mt7b")); ()
    }
  }
}

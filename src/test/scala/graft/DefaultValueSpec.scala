package graft

import org.apache.spark.sql.functions._

import graft.sources.GraftStore

/** DEFAULT column values on catalog tables — both halves of the
  * Delta/Iceberg contract, metadata-only:
  *   - CURRENT_DEFAULT: an INSERT omitting the column gets the default
  *     filled by Spark's analyzer (from the stored field metadata);
  *   - EXISTS_DEFAULT: rows committed BEFORE `ADD COLUMN ... DEFAULT`
  *     read the default at scan (slot-pad, zero rewrite), on every read
  *     path, and the next COW rewrite MATERIALIZES it.
  */
class DefaultValueSpec extends SparkSpec {

  private def cat(): Unit =
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[graft.sources.GraftCatalog].getName)

  test("ADD COLUMN DEFAULT: old rows read the existence default with zero rewrite; inserts fill it") {
    cat()
    spark.range(5).select(col("id").as("k")).writeTo("graft_cat.spec.dflt").create()
    val key = "cat::graft_cat.spec.dflt"
    try {
      val before = GraftStore.batchesRef(key).get
      spark.sql(
        "ALTER TABLE graft_cat.spec.dflt ADD COLUMN tier STRING DEFAULT 'bronze'")
      // metadata-only: no batch rewritten
      assert(GraftStore.batchesRef(key).get eq before)
      // EXISTS_DEFAULT: every pre-evolution row reads 'bronze', not NULL
      assert(spark.table("graft_cat.spec.dflt")
        .filter(col("tier") === "bronze").count() === 5L)
      assert(spark.table("graft_cat.spec.dflt")
        .filter(col("tier").isNull).count() === 0L)
      // CURRENT_DEFAULT: an INSERT omitting the column gets it filled
      spark.sql("INSERT INTO graft_cat.spec.dflt (k) VALUES (100)")
      // an INSERT providing it keeps its value
      spark.sql("INSERT INTO graft_cat.spec.dflt VALUES (101, 'gold')")
      val got = spark.table("graft_cat.spec.dflt").orderBy("k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got === (0L to 4L).map((_, "bronze")) ++
        Seq((100L, "bronze"), (101L, "gold")))
      // the COW rewrite materializes the default (then drop the default
      // semantics question entirely: rows carry real values)
      spark.sql("UPDATE graft_cat.spec.dflt SET tier = 'silver' WHERE k = 0")
      assert(spark.table("graft_cat.spec.dflt")
        .filter(col("tier") === "bronze").count() === 5L)
      assert(GraftStore.batchesRef(key).get.forall(_.forall(_.length == 2)),
        "after the rewrite every row is materialized at full width")
    } finally spark.sql("DROP TABLE graft_cat.spec.dflt")
  }

  test("defaults compose with the ledger: time travel, change feed, and NOT NULL adds") {
    cat()
    spark.range(3).select(col("id").as("k")).writeTo("graft_cat.spec.dfl2").create()
    try {
      spark.sql(
        "ALTER TABLE graft_cat.spec.dfl2 ADD COLUMN n INT NOT NULL DEFAULT 7")
      // NOT NULL is legal BECAUSE of the default; all rows read 7
      assert(spark.table("graft_cat.spec.dfl2").agg(sum(col("n")))
        .head.getLong(0) === 21L)
      // the pre-evolution version has no such column
      assert(!spark.sql(
        "SELECT * FROM graft_cat.spec.dfl2 VERSION AS OF 1")
        .columns.contains("n"))
      // the change feed renders pre-evolution inserts WITH the default
      // (the rows as they read under the range-end schema)
      val ch = graft.sources.ChangeFeed.tableChanges(spark, "spec.dfl2", 0, 2)
      assert(ch.filter(col("_change_type") === "insert")
        .agg(sum(col("n"))).head.getLong(0) === 21L)
      // a metadata DELETE by the defaulted value must hit pre-evolution
      // rows — the predicate evaluates rows AS THEY READ
      val before = GraftStore.batchesRef("cat::graft_cat.spec.dfl2").get
      spark.sql("DELETE FROM graft_cat.spec.dfl2 WHERE n = 7")
      assert(GraftStore.batchesRef("cat::graft_cat.spec.dfl2").get eq before,
        "still a deletion-vector commit, not a rewrite")
      assert(spark.table("graft_cat.spec.dfl2").count() === 0L,
        "every pre-evolution row reads n=7 and must be deleted")
    } finally spark.sql("DROP TABLE graft_cat.spec.dfl2")
  }
}

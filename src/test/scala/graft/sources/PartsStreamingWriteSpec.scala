package graft.sources

import org.apache.spark.sql.functions._

/** The partitioned streaming write's EPOCH contract, driven directly
  * ([[GraftPartsStreamingWrite]] is `private[sources]`): exactly-once
  * at TABLE grain — a replayed epoch is a whole-batch no-op (no shard
  * re-append, no ledger version), and each fresh epoch mints exactly
  * one table-level version however many shards it touches.
  */
class PartsStreamingWriteSpec extends graft.SparkSpec {

  private def cat(): Unit =
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[GraftCatalog].getName)

  test("a replayed epoch is a whole-batch NO-OP; each fresh epoch is one table version") {
    cat()
    spark.range(0, 4)
      .select((col("id") % 2).cast("string").as("p"), col("id").as("v"))
      .repartition(1)
      .writeTo("graft_cat.spec.psw").partitionedBy(col("p")).create()
    val k = "cat::graft_cat.spec.psw"
    try {
      val schema = GraftStore.stores(k).schema
      val spec = GraftCatalog.parts(k)
      val w = new GraftPartsStreamingWrite(k, schema, spec,
        GraftCatalog.currentSpecId(k))
      def epochMsg(vs: Long*): GraftPartCommit =
        GraftPartCommit(vs.groupBy(v => (v % 2).toString)
          .map { case (pv, xs) =>
            pv -> xs.map(v => Array[Any](
              org.apache.spark.unsafe.types.UTF8String.fromString(pv), v))
              .toArray
          })
      val v0 = GraftCatalog.partVersions(k).size
      w.commit(0L, Array(epochMsg(100L, 101L, 102L)))
      assert(spark.table("graft_cat.spec.psw").count() === 7L)
      assert(GraftCatalog.partVersions(k).size === v0 + 1,
        "one epoch = one table-level version, however many shards")
      val shard0 = GraftStore.batchesRef(k + "#p=0").get
      // micro-batch replay after a failure: same epoch re-delivered
      w.commit(0L, Array(epochMsg(100L, 101L, 102L)))
      assert(spark.table("graft_cat.spec.psw").count() === 7L,
        "replayed epoch must not double-commit rows")
      assert(GraftCatalog.partVersions(k).size === v0 + 1,
        "replayed epoch must not mint a version")
      assert(GraftStore.batchesRef(k + "#p=0").get eq shard0,
        "replayed epoch must not touch any shard")
      // a fresh epoch lands
      w.commit(1L, Array(epochMsg(200L)))
      assert(spark.table("graft_cat.spec.psw").count() === 8L)
      assert(GraftCatalog.partVersions(k).size === v0 + 2)
      // the epoch ledger survives into time travel: each epoch is a
      // first-class commit
      assert(spark.sql(
        s"SELECT count(*) FROM graft_cat.spec.psw VERSION AS OF ${v0}")
        .head.getLong(0) === 7L)
    } finally spark.sql("DROP TABLE graft_cat.spec.psw")
  }

  test("the epoch ledger is keyed PER QUERY: a second streaming query's epoch 0 is not swallowed by the first's") {
    cat()
    spark.range(0, 2)
      .select((col("id") % 2).cast("string").as("p"), col("id").as("v"))
      .repartition(1)
      .writeTo("graft_cat.spec.pswq").partitionedBy(col("p")).create()
    val k = "cat::graft_cat.spec.pswq"
    try {
      val schema = GraftStore.stores(k).schema
      val spec = GraftCatalog.parts(k)
      def msg(v: Long): GraftPartCommit = GraftPartCommit(Map(
        (v % 2).toString -> Array(Array[Any](
          org.apache.spark.unsafe.types.UTF8String.fromString(
            (v % 2).toString), v))))
      val qA = new GraftPartsStreamingWrite(k, schema, spec,
        GraftCatalog.currentSpecId(k), "query-A")
      val qB = new GraftPartsStreamingWrite(k, schema, spec,
        GraftCatalog.currentSpecId(k), "query-B")
      qA.commit(0L, Array(msg(10L)))
      // epochIds are only monotonic WITHIN one query: B's epoch 0 must
      // land (a table-grained ledger would silently drop it while B's
      // checkpoint advanced as if committed)
      qB.commit(0L, Array(msg(11L)))
      assert(spark.table("graft_cat.spec.pswq").count() === 4L,
        "both queries' epoch-0 commits must land")
      // replay WITHIN a query still refuses
      qA.commit(0L, Array(msg(10L)))
      assert(spark.table("graft_cat.spec.pswq").count() === 4L)
      // DROP TABLE reaps the per-query epoch marks
      spark.sql("DROP TABLE graft_cat.spec.pswq")
      assert(!GraftStore.epochs.keys.exists(_.startsWith(k)),
        "per-query epoch marks must be reaped with the table")
    } finally scala.util.Try(spark.sql("DROP TABLE graft_cat.spec.pswq"))
  }
}

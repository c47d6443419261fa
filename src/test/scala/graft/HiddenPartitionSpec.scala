package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.sources.GraftStore

/** HIDDEN partitioning on catalog tables ([[graft.sources.PartSpec]]):
  * `days(ts)` and `bucket(n, k)` route rows to DERIVED shard values and
  * prune shards from predicates on the SOURCE column — the query never
  * names (or knows) the partition value. Day-aligned retention DELETEs
  * are metadata shard drops; unaligned bounds stay COW.
  */
class HiddenPartitionSpec extends SparkSpec {

  private def cat(): Unit =
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[graft.sources.GraftCatalog].getName)

  test("days(ts): routing by UTC day, range pruning from ts predicates, aligned retention drop") {
    cat()
    val ev = Tables.events(spark, sfDir).select(col("event_id"), col("ts"), col("value"))
    spark.sql(
      """CREATE TABLE graft_cat.spec.hpd (event_id BIGINT, ts TIMESTAMP,
        |  value DOUBLE) PARTITIONED BY (days(ts))""".stripMargin)
    try {
      ev.writeTo("graft_cat.spec.hpd").append()
      val days = ev.select(to_date(col("ts")).as("d")).distinct().count()
      val shardCount = spark.table("graft_cat.spec.hpd")
        .select(col("_group")).distinct().count()
      assert(shardCount === days, "one shard per UTC day")

      // hidden pruning: a ts RANGE predicate prunes day shards — the
      // query never names the derived value
      val cutoff = ev.agg(date_trunc("DAY", max(col("ts")))).head.getTimestamp(0)
      val lastDays = spark.table("graft_cat.spec.hpd")
        .filter(col("ts") >= cutoff)
      val expect = ev.filter(col("ts") >= cutoff).count()
      assert(lastDays.count() === expect)
      val (total, skipped) =
        GraftStore.skipLog.getOrElse("cat::graft_cat.spec.hpd", (-1, -1))
      assert(total.toLong === days && skipped.toLong === days - 1,
        s"expected $days shards with ${days - 1} pruned, got $total/$skipped")

      // day-aligned retention DELETE = metadata shard drop: surviving
      // shards stay reference-identical, dropped day shards empty
      val keepRef = GraftStore.batchesRef(
        "cat::graft_cat.spec.hpd#p=" + Math.floorDiv(
          org.apache.spark.sql.catalyst.util.DateTimeUtils
            .fromJavaTimestamp(cutoff), 86400L * 1000000L))
      spark.sql(s"DELETE FROM graft_cat.spec.hpd WHERE ts < TIMESTAMP '$cutoff'")
      assert(spark.table("graft_cat.spec.hpd").count() === expect)
      assert(GraftStore.batchesRef(
        "cat::graft_cat.spec.hpd#p=" + Math.floorDiv(
          org.apache.spark.sql.catalyst.util.DateTimeUtils
            .fromJavaTimestamp(cutoff), 86400L * 1000000L))
        .get eq keepRef.get,
        "the surviving day shard must not be rewritten by a partition drop")

      // an UNALIGNED bound cannot drop whole shards: the plan stays COW
      // (and still answers correctly)
      val unaligned = new java.sql.Timestamp(cutoff.getTime + 3600 * 1000)
      spark.sql(
        s"DELETE FROM graft_cat.spec.hpd WHERE ts < TIMESTAMP '$unaligned'")
      assert(spark.table("graft_cat.spec.hpd").count() ===
        ev.filter(col("ts") >= unaligned).count())
    } finally spark.sql("DROP TABLE graft_cat.spec.hpd")
  }

  test("bucket(n, k): murmur3 routing, equality pruning to one shard, DML group narrowing") {
    cat()
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("value")).limit(200)
    spark.sql(
      """CREATE TABLE graft_cat.spec.hpb (event_id BIGINT, value DOUBLE)
        |PARTITIONED BY (bucket(8, event_id))""".stripMargin)
    try {
      spark.createDataFrame(ev.collectAsList(), ev.schema)
        .writeTo("graft_cat.spec.hpb").append()
      val shardCount = spark.table("graft_cat.spec.hpb")
        .select(col("_group")).distinct().count()
      assert(shardCount > 1 && shardCount <= 8,
        s"murmur3 should spread 200 keys over up to 8 buckets, got $shardCount")
      // key equality prunes to ONE shard — the caller never computed a
      // bucket number
      val probe = ev.limit(1).head.getLong(0)
      assert(spark.table("graft_cat.spec.hpb")
        .filter(col("event_id") === probe).count() === 1L)
      val (total, skipped) =
        GraftStore.skipLog.getOrElse("cat::graft_cat.spec.hpb", (-1, -1))
      assert(total.toLong === shardCount && skipped.toLong === shardCount - 1,
        s"expected 1 of $shardCount bucket shards scanned, got $total/$skipped")
      // a keyed UPDATE narrows the COW rewrite to the key's bucket:
      // every other shard stays reference-identical
      val vals = spark.table("graft_cat.spec.hpb").select("_group")
        .distinct().collect().map(_.getString(0))
      val refs = vals.map(v => v ->
        GraftStore.batchesRef(s"cat::graft_cat.spec.hpb#p=$v").get).toMap
      spark.sql(
        s"UPDATE graft_cat.spec.hpb SET value = 0.0 WHERE event_id = $probe")
      val touched = vals.count(v =>
        !(GraftStore.batchesRef(s"cat::graft_cat.spec.hpb#p=$v").get eq refs(v)))
      assert(touched === 1, s"exactly one bucket shard rewritten, got $touched")
      // a bucket shard holds unrelated keys, so key equality must NEVER
      // take the metadata partition-drop path
      spark.sql(s"DELETE FROM graft_cat.spec.hpb WHERE event_id = $probe")
      assert(spark.table("graft_cat.spec.hpb").count() === 199L,
        "only the one key may be deleted — dropping its bucket would " +
          "take unrelated keys with it")
    } finally spark.sql("DROP TABLE graft_cat.spec.hpb")
  }
}

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

  test("months(ts): routing by calendar month, range pruning, month-aligned retention drop") {
    cat()
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
    spark.sql(
      """CREATE TABLE graft_cat.spec.hpm (o_orderkey BIGINT,
        |  o_orderdate TIMESTAMP, o_totalprice DOUBLE)
        |PARTITIONED BY (months(o_orderdate))""".stripMargin)
    try {
      ord.writeTo("graft_cat.spec.hpm").append()
      val months = ord.select(date_trunc("MONTH", col("o_orderdate")).as("m"))
        .distinct().count()
      assert(months > 12, s"orders should span years of months, got $months")
      val shardCount = spark.table("graft_cat.spec.hpm")
        .select(col("_group")).distinct().count()
      assert(shardCount === months, "one shard per calendar month")

      // range pruning from a raw-ts predicate — never names the ordinal
      val cutoff = ord.agg(date_trunc("MONTH", max(col("o_orderdate"))))
        .head.getTimestamp(0)
      val expect = ord.filter(col("o_orderdate") >= cutoff).count()
      assert(spark.table("graft_cat.spec.hpm")
        .filter(col("o_orderdate") >= cutoff).count() === expect)
      val (total, skipped) =
        GraftStore.skipLog.getOrElse("cat::graft_cat.spec.hpm", (-1, -1))
      assert(total.toLong === months && skipped.toLong === months - 1,
        s"expected $months shards with ${months - 1} pruned, got $total/$skipped")

      // month-aligned retention DELETE = metadata drop: the surviving
      // month shard is reference-identical afterwards
      val cutLd = java.time.LocalDate.ofEpochDay(Math.floorDiv(
        org.apache.spark.sql.catalyst.util.DateTimeUtils
          .fromJavaTimestamp(cutoff), 86400L * 1000000L))
      val survivorKey = "cat::graft_cat.spec.hpm#p=" +
        ((cutLd.getYear - 1970).toLong * 12 + cutLd.getMonthValue - 1)
      val keepRef = GraftStore.batchesRef(survivorKey)
      spark.sql(
        s"DELETE FROM graft_cat.spec.hpm WHERE o_orderdate < TIMESTAMP '$cutoff'")
      assert(spark.table("graft_cat.spec.hpm").count() === expect)
      assert(GraftStore.batchesRef(survivorKey).get eq keepRef.get,
        "the surviving month shard must not be rewritten by a partition drop")

      // a MID-MONTH bound (even day-aligned) cannot drop month shards:
      // stays COW, still answers correctly
      val unaligned = new java.sql.Timestamp(cutoff.getTime + 10L * 86400 * 1000)
      spark.sql(
        s"DELETE FROM graft_cat.spec.hpm WHERE o_orderdate < TIMESTAMP '$unaligned'")
      assert(spark.table("graft_cat.spec.hpm").count() ===
        ord.filter(col("o_orderdate") >= unaligned).count())
    } finally spark.sql("DROP TABLE graft_cat.spec.hpm")
  }

  test("years(d): DATE column routing, pruning, Jan-1-aligned retention drop") {
    cat()
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("d"))
    spark.sql(
      """CREATE TABLE graft_cat.spec.hpy (o_orderkey BIGINT, d DATE)
        |PARTITIONED BY (years(d))""".stripMargin)
    try {
      ord.writeTo("graft_cat.spec.hpy").append()
      val years = ord.select(year(col("d")).as("y")).distinct().count()
      assert(years > 1, s"orders should span multiple years, got $years")
      assert(spark.table("graft_cat.spec.hpy")
        .select(col("_group")).distinct().count() === years,
        "one shard per calendar year")
      val maxYear = ord.agg(max(year(col("d")))).head.getInt(0)
      val expect = ord.filter(year(col("d")) === maxYear).count()
      assert(spark.table("graft_cat.spec.hpy")
        .filter(col("d") >= java.sql.Date.valueOf(s"$maxYear-01-01"))
        .count() === expect)
      val (total, skipped) =
        GraftStore.skipLog.getOrElse("cat::graft_cat.spec.hpy", (-1, -1))
      assert(total.toLong === years && skipped.toLong === years - 1)
      // Jan-1 DATE bound: metadata year-shard drop
      spark.sql(
        s"DELETE FROM graft_cat.spec.hpy WHERE d < DATE '$maxYear-01-01'")
      assert(spark.table("graft_cat.spec.hpy").count() === expect)
      // a mid-year DATE bound refuses the drop and stays COW
      spark.sql(
        s"DELETE FROM graft_cat.spec.hpy WHERE d < DATE '$maxYear-03-01'")
      assert(spark.table("graft_cat.spec.hpy").count() ===
        ord.filter(col("d") >= java.sql.Date.valueOf(s"$maxYear-03-01")).count())
    } finally spark.sql("DROP TABLE graft_cat.spec.hpy")
  }

  test("hours(ts): epoch-hour routing, range pruning, hour-aligned drop; refuses DATE columns") {
    cat()
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("value")).limit(120)
    val frozen = spark.createDataFrame(ev.collectAsList(), ev.schema)
    spark.sql(
      """CREATE TABLE graft_cat.spec.hph (event_id BIGINT, ts TIMESTAMP,
        |  value DOUBLE) PARTITIONED BY (hours(ts))""".stripMargin)
    try {
      frozen.writeTo("graft_cat.spec.hph").append()
      val hoursN = frozen.select(date_trunc("HOUR", col("ts")).as("h"))
        .distinct().count()
      assert(spark.table("graft_cat.spec.hph")
        .select(col("_group")).distinct().count() === hoursN,
        "one shard per UTC hour")
      val cutoff = frozen.agg(date_trunc("HOUR", max(col("ts"))))
        .head.getTimestamp(0)
      val expect = frozen.filter(col("ts") >= cutoff).count()
      assert(spark.table("graft_cat.spec.hph")
        .filter(col("ts") >= cutoff).count() === expect)
      val (total, skipped) =
        GraftStore.skipLog.getOrElse("cat::graft_cat.spec.hph", (-1, -1))
      assert(total.toLong === hoursN && skipped.toLong === hoursN - 1)
      // hour-aligned retention = metadata drop
      spark.sql(s"DELETE FROM graft_cat.spec.hph WHERE ts < TIMESTAMP '$cutoff'")
      assert(spark.table("graft_cat.spec.hph").count() === expect)
    } finally spark.sql("DROP TABLE graft_cat.spec.hph")
    // hours over DATE is meaningless — refused at CREATE
    val err = intercept[Exception] {
      spark.sql(
        """CREATE TABLE graft_cat.spec.hph_bad (id BIGINT, d DATE)
          |PARTITIONED BY (hours(d))""".stripMargin)
    }
    assert(err.getMessage.contains("hours"), err.getMessage)
  }

  test("truncate(w, col): string prefix + integral floor routing, pruning, aligned drops") {
    cat()
    // STRING truncate: prefix shards, equality/prefix pruning, and the
    // COW-not-drop trap (a prefix shard holds values equality does not
    // select)
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment"))
    spark.sql(
      """CREATE TABLE graft_cat.spec.hpt (c_custkey BIGINT,
        |  c_mktsegment STRING) PARTITIONED BY (truncate(1, c_mktsegment))""".stripMargin)
    try {
      cust.writeTo("graft_cat.spec.hpt").append()
      val prefixes = cust.select(substring(col("c_mktsegment"), 1, 1).as("p"))
        .distinct().count()
      assert(spark.table("graft_cat.spec.hpt")
        .select(col("_group")).distinct().count() === prefixes,
        "one shard per 1-char prefix")
      val nb = cust.filter(col("c_mktsegment") === "BUILDING").count()
      assert(spark.table("graft_cat.spec.hpt")
        .filter(col("c_mktsegment") === "BUILDING").count() === nb)
      val (t1, s1) =
        GraftStore.skipLog.getOrElse("cat::graft_cat.spec.hpt", (-1, -1))
      assert(t1.toLong === prefixes && s1.toLong === prefixes - 1,
        s"equality should prune to the literal's own prefix shard, got $t1/$s1")
      // a >=w prefix predicate pins the shard exactly too
      assert(spark.table("graft_cat.spec.hpt")
        .filter(col("c_mktsegment").startsWith("BU")).count() === nb)
      val (t2, s2) =
        GraftStore.skipLog.getOrElse("cat::graft_cat.spec.hpt", (-1, -1))
      assert(t2.toLong === prefixes && s2.toLong === prefixes - 1)
      // equality must NOT take the metadata drop path (shard 'B' could
      // hold other B-segments): COW, correct count
      spark.sql("DELETE FROM graft_cat.spec.hpt WHERE c_mktsegment = 'BUILDING'")
      assert(spark.table("graft_cat.spec.hpt").count() === cust.count() - nb)
      // prefix shards ARE order-preserving: a `<` retention bound of
      // length ≤ w drops whole shards as metadata — survivors stay
      // reference-identical (segments: AUTOMOBILE/BUILDING < 'F';
      // FURNITURE/HOUSEHOLD/MACHINERY survive)
      val fRef = GraftStore.batchesRef("cat::graft_cat.spec.hpt#p=F")
      spark.sql("DELETE FROM graft_cat.spec.hpt WHERE c_mktsegment < 'F'")
      val nFHM = cust.filter(col("c_mktsegment") >= "F").count()
      assert(spark.table("graft_cat.spec.hpt").count() === nFHM)
      assert(GraftStore.batchesRef("cat::graft_cat.spec.hpt#p=F").get
        eq fRef.get,
        "a prefix-aligned drop must not rewrite surviving shards")
      // a bound LONGER than w mixes its own prefix shard ('F...'):
      // refused, stays COW, still answers correctly
      spark.sql("DELETE FROM graft_cat.spec.hpt WHERE c_mktsegment < 'FX'")
      assert(spark.table("graft_cat.spec.hpt").count() ===
        cust.filter(col("c_mktsegment") >= "FX").count())
    } finally spark.sql("DROP TABLE graft_cat.spec.hpt")

    // INTEGRAL truncate: floor-of-w shards, range pruning, and a
    // w-aligned bound IS a metadata drop (order-preserving ordinal)
    val ord = Tables.orders(spark, sfDir).select(col("o_orderkey"))
    spark.sql(
      """CREATE TABLE graft_cat.spec.hpti (o_orderkey BIGINT)
        |PARTITIONED BY (truncate(1000, o_orderkey))""".stripMargin)
    try {
      ord.writeTo("graft_cat.spec.hpti").append()
      val shards = ord.select((col("o_orderkey") -
        pmod(col("o_orderkey"), lit(1000))).as("f")).distinct().count()
      assert(spark.table("graft_cat.spec.hpti")
        .select(col("_group")).distinct().count() === shards)
      val maxK = ord.agg(max(col("o_orderkey"))).head.getLong(0)
      val bound = (maxK / 1000) * 1000
      val expect = ord.filter(col("o_orderkey") >= bound).count()
      assert(spark.table("graft_cat.spec.hpti")
        .filter(col("o_orderkey") >= bound).count() === expect)
      val (t3, s3) =
        GraftStore.skipLog.getOrElse("cat::graft_cat.spec.hpti", (-1, -1))
      assert(t3.toLong === shards && s3.toLong === shards - 1)
      // aligned integral bound: metadata drop; unaligned: COW
      spark.sql(s"DELETE FROM graft_cat.spec.hpti WHERE o_orderkey < $bound")
      assert(spark.table("graft_cat.spec.hpti").count() === expect)
      spark.sql(s"DELETE FROM graft_cat.spec.hpti WHERE o_orderkey < ${bound + 7}")
      assert(spark.table("graft_cat.spec.hpti").count() ===
        ord.filter(col("o_orderkey") >= bound + 7).count())
    } finally spark.sql("DROP TABLE graft_cat.spec.hpti")
  }

  test("dynamic partition overwrite replaces exactly the touched shards; static mode truncates; untouched shards never rewritten") {
    cat()
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
      .filter(col("event_type").isNotNull)
    ev.writeTo("graft_cat.spec.dynow").partitionedBy(col("event_type"))
      .create()
    try {
      val types = ev.select("event_type").distinct().collect()
        .map(_.getString(0))
      assert(types.length > 2, "fixture needs several event types")
      val target = types.sorted.head
      val others = types.filterNot(_ == target)
      val refs = others.map(t => t ->
        GraftStore.batchesRef(s"cat::graft_cat.spec.dynow#p=$t").get).toMap
      val prev = spark.conf
        .getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try spark.sql(
        s"""INSERT OVERWRITE graft_cat.spec.dynow
           |SELECT event_id, event_type, value * 2 AS value
           |FROM graft_cat.spec.dynow VERSION AS OF 1
           |WHERE event_type = '$target'""".stripMargin)
      finally prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None =>
          spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      // the touched shard was REPLACED (values doubled, same count)
      val touched = spark.table("graft_cat.spec.dynow")
        .filter(col("event_type") === target)
      assert(touched.count() === ev.filter(col("event_type") === target).count())
      // untouched shards: REFERENCE-identical — dynamic overwrite
      // never visited them (zero rewrite, not just equal content)
      others.foreach { t =>
        assert(GraftStore.batchesRef(s"cat::graft_cat.spec.dynow#p=$t").get
          eq refs(t), s"shard '$t' must not be rewritten")
      }
      // and the whole table still serves every type
      assert(spark.table("graft_cat.spec.dynow")
        .select("event_type").distinct().count() === types.length)
      // STATIC mode (the default): the same statement truncates the
      // WHOLE table — only the overwritten type survives
      spark.sql(
        s"""INSERT OVERWRITE graft_cat.spec.dynow
           |SELECT event_id, event_type, value FROM
           |graft_cat.spec.dynow WHERE event_type = '$target'""".stripMargin)
      assert(spark.table("graft_cat.spec.dynow")
        .select("event_type").distinct().count() === 1L,
        "static INSERT OVERWRITE must truncate-replace the whole table")
    } finally spark.sql("DROP TABLE graft_cat.spec.dynow")
  }

  test("evolve_spec accepts the r19 transforms (months/years/hours/truncate)") {
    cat()
    spark.sql(
      """CREATE TABLE graft_cat.spec.hpe (id BIGINT, ts TIMESTAMP,
        |  seg STRING) PARTITIONED BY (days(ts))""".stripMargin)
    try {
      val r1 = spark.sql(
        "CALL graft_cat.system.evolve_spec('spec.hpe', 'months(ts)')")
        .head
      assert(r1.getInt(0) === 1 && r1.getString(1).contains("months"))
      val r2 = spark.sql(
        "CALL graft_cat.system.evolve_spec('spec.hpe', 'truncate(2, seg)')")
        .head
      assert(r2.getInt(0) === 2 && r2.getString(1).contains("truncate"))
      // hours over a TIMESTAMP is fine as an evolution target too
      val r3 = spark.sql(
        "CALL graft_cat.system.evolve_spec('spec.hpe', 'hours(ts)')").head
      assert(r3.getInt(0) === 3 && r3.getString(1).contains("hours"))
    } finally spark.sql("DROP TABLE graft_cat.spec.hpe")
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

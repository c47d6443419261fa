package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.Tables

/** Source-format fidelity (SURVEY.md S1): the reference ingests REST JSON
  * with a declared schema and lenient validation (extra fields ignored,
  * malformed rows dropped + counted, src/ingest.py:314-357). Same
  * semantics through Spark's json/csv sources.
  */
class SourceFormatsSpec extends SparkSpec {

  test("schema'd JSON source: declared fields read, extra fields ignored") {
    val out = tmpDir("graft-json-src")
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    // extra field rides along in the files, is absent from the declared schema
    ev.withColumn("extra_api_field", lit("ignored"))
      .write.mode(SaveMode.Overwrite).json(out)

    val declared = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val back = spark.read.schema(declared).json(out)
    assert(back.columns.toSeq === declared.fieldNames.toSeq)
    assert(back.count() === ev.count())
    val sumBack = back.agg(sum("value")).collect().head.getDouble(0)
    val sumOrig = ev.agg(sum("value")).collect().head.getDouble(0)
    assert(math.abs(sumBack - sumOrig) < 1e-6)
  }

  test("ORC round trip preserves rows, schema, and pushdown") {
    val out = tmpDir("graft-orc-src")
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    ev.write.mode(SaveMode.Overwrite).orc(out)
    val back = spark.read.orc(out)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      ev.schema.map(f => (f.name, f.dataType)))
    assert(back.exceptAll(ev).isEmpty && ev.exceptAll(back).isEmpty)
    // predicate pushdown reaches the ORC scan like parquet
    val plan = back.filter(col("event_id") > 100).select("event_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(event_id), GreaterThan(event_id,100)]"), plan)
  }

  test("CSV ingest drops malformed rows and counts them (DROPMALFORMED-with-metrics)") {
    val dir = tmpDir("graft-csv-src")
    val f = new java.io.PrintWriter(s"$dir/events.csv")
    f.println("1,2024-01-01T00:00:00,7,click,5.0")
    f.println("2,not-a-timestamp,7,click,3.0")     // malformed ts
    f.println("3,2024-01-01T02:00:00,8,view,oops") // malformed value
    f.println("4,2024-01-01T03:00:00,9,view,1.5")
    f.close()

    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("_corrupt", StringType)))
    val raw = spark.read.schema(schema)
      .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_corrupt")
      .csv(s"$dir/events.csv").cache()
    val total = raw.count()
    val dropped = raw.filter(col("_corrupt").isNotNull).count()
    val valid = raw.filter(col("_corrupt").isNull).drop("_corrupt")
    assert(total === 4)
    assert(dropped === 2)
    assert(valid.count() === 2)
    assert(valid.select("event_id").collect().map(_.getLong(0)).toSet === Set(1L, 4L))
    raw.unpersist()
  }

  test("csv_roundtrip: quoting/null machinery is actually exercised, fidelity holds") {
    val out = graft.sources.FileFormatOps.csvRoundTrip(spark, sfDir)
    // non-vacuity: the derived label column embeds the CSV metacharacters,
    // and the nullif column produced real NULLs that round-tripped
    val labels = out.select("c_label").collect().map(_.getString(0))
    assert(labels.forall(l => l.contains(",") && l.contains("\"")))
    assert(out.filter(col("c_seg_null").isNull).count() > 0,
      "no NULLs survived the round trip — the nullValue token gated nothing")
    // fidelity: byte-identical with the pre-CSV frame
    val direct = Tables.customer(spark, sfDir).select(
      col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_acctbal"),
      col("c_mktsegment"),
      concat(col("c_name"), lit(", \""), col("c_mktsegment"), lit("\"")).as("c_label"),
      when(col("c_mktsegment") === "BUILDING", lit(null).cast("string"))
        .otherwise(col("c_mktsegment")).as("c_seg_null"))
      .orderBy("c_custkey")
    assert(out.collect().toSeq === direct.collect().toSeq)
  }

  test("orc_roundtrip: filtered read-back equals the direct frame, NULLs survive") {
    val out = graft.sources.FileFormatOps.orcRoundTrip(spark, sfDir)
    assert(out.filter(col("l_status_null").isNull).count() > 0,
      "no NULLs survived the ORC round trip — vacuous")
    val direct = Tables.lineitem(spark, sfDir)
      .filter(col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"),
        when(col("l_linestatus") === "F", lit(null).cast("string"))
          .otherwise(col("l_linestatus")).as("l_status_null"))
      .orderBy("l_orderkey", "l_linenumber")
    assert(out.collect().toSeq === direct.collect().toSeq)
  }

  test("json_roundtrip: absent-field NULLs restored, timestamps and doubles exact") {
    val out = graft.sources.FileFormatOps.jsonRoundTrip(spark, sfDir)
    assert(out.filter(col("o_pri_null").isNull).count() > 0,
      "no NULLs restored from dropped JSON fields — vacuous")
    val direct = Tables.orders(spark, sfDir).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"),
      when(col("o_orderpriority") === "1-URGENT", lit(null).cast("string"))
        .otherwise(col("o_orderpriority")).as("o_pri_null"))
      .orderBy("o_orderkey")
    assert(out.collect().toSeq === direct.collect().toSeq)
  }

  test("csv_corrupt_audit: exactly the clean fixture passes, exactly one corrupt row") {
    val row = graft.sources.FileFormatOps.csvCorruptAudit(spark, sfDir).collect().head
    assert(row.getLong(0) === Tables.customer(spark, sfDir).count())
    assert(row.getLong(1) === 1L)
  }

  test("GraftStore write: append accumulates, overwrite truncates, round-trip exact") {
    import spark.implicits._
    val store = "spec_append"
    graft.sources.GraftStore.drop(store)
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    a.write.format("graft.sources.GraftStore").option("store", store)
      .mode("append").save()
    a.write.format("graft.sources.GraftStore").option("store", store)
      .mode("append").save()
    assert(graft.sources.GraftStore.rowCount(store) === 4L)
    a.write.format("graft.sources.GraftStore").option("store", store)
      .mode("overwrite").save()
    val back = spark.read.format("graft.sources.GraftStore")
      .option("store", store).load().orderBy("k")
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "x"), (2L, "y")))
    graft.sources.GraftStore.drop(store)
  }

  test("GraftStore abort atomicity: a poisoned partition publishes NOTHING") {
    import spark.implicits._
    val store = "spec_abort"
    graft.sources.GraftStore.drop(store)
    val good = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
    good.write.format("graft.sources.GraftStore").option("store", store)
      .mode("append").save()
    val before = graft.sources.GraftStore.rowCount(store)
    assert(before === 2L)
    // 4 partitions; the poison lands in ONE of them AFTER others have
    // buffered — their task commits must never become visible
    val poisoned = spark.range(0, 100, 1, 4)
      .select(col("id").as("k"),
        when(col("id") === 97, expr("raise_error('poison')"))
          .otherwise(col("id").cast("double")).as("v"))
    val thrown = intercept[Exception] {
      poisoned.write.format("graft.sources.GraftStore").option("store", store)
        .mode("append").save()
    }
    assert(thrown.getMessage != null)
    assert(graft.sources.GraftStore.rowCount(store) === before,
      "a failed job leaked partial task commits into the store")
    // and the store still reads back the ORIGINAL rows exactly
    val back = spark.read.format("graft.sources.GraftStore")
      .option("store", store).load().orderBy("k").collect()
    assert(back.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      Seq((1L, 10.0), (2L, 20.0)))
    graft.sources.GraftStore.drop(store)
  }
}

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
}

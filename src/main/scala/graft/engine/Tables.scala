package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet fixture loaders (TESTDATA.md). One call per table; Catalyst
  * handles column pruning + predicate pushdown into the parquet scan, so
  * callers should `select`/`filter` immediately after loading.
  *
  * Scale note: at 100 TB these would be partitioned/bucketed table reads
  * (e.g. `spark.read.table`), but the API shape — load, prune, push down —
  * is identical; nothing here collects to the driver.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; sessions set `spark.sql.legacy.parquet.nanosAsLong=true`
    * (see [[Sessions.tune]]) so it arrives as LongType nanos. Convert to a
    * proper TimestampType with integer division (ns values are µs-precision,
    * so the truncation is lossless; double division would lose precision on
    * ~1.7e18 nanos).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _        => raw
    }
  }

  /** Events at/after a watermark, with the predicate applied in the RAW
    * column domain. A filter on the converted `timestamp_micros(ts div
    * 1000)` column cannot push through the expression into the parquet
    * scan (full scan at 100 TB); comparing the stored nanos long directly
    * reaches PushedFilters and prunes row groups via footer min/max.
    * The conversion is monotonic, so the predicates are equivalent.
    */
  def eventsSince(s: SparkSession, d: String, wm: java.sql.Timestamp,
                  strict: Boolean = false): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        val i = wm.toInstant
        val nanos = Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000000L), i.getNano.toLong)
        val f = if (strict) raw.filter(col("ts") > nanos) else raw.filter(col("ts") >= nanos)
        f.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        if (strict) raw.filter(col("ts") > lit(wm)) else raw.filter(col("ts") >= lit(wm))
    }
  }

  /** UTC-safe literal → Timestamp ("yyyy-MM-dd HH:mm:ss", no JVM-zone
    * dependence like Timestamp.valueOf has). */
  def utcTs(literal: String): java.sql.Timestamp =
    java.sql.Timestamp.from(
      java.time.LocalDateTime.parse(literal.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

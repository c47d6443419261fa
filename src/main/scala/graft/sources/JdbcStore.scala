package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.MergeOps

/** JDBC rendition of the reference's Postgres DAL
  * (`/root/reference/src/database.py:133-202` upsert sink,
  * `:64-87`/`:204-223` high-water-mark store) over `spark.read.jdbc` /
  * `DataFrame.write.jdbc` — exercised against the Derby driver that ships
  * with Spark, but URL-agnostic. Catalyst pushes filters and column
  * pruning into the JDBC scan (`PushedFilters` on the JDBCRelation — the
  * watermark predicate becomes a server-side WHERE, exactly the
  * reference's incremental fetch).
  *
  * Upsert: vanilla Spark has no JDBC MERGE, so the sink reads the
  * existing table, merges keep-latest-per-key distributedly
  * ([[MergeOps.mergeByKey]] — same semantics as the reference's
  * `ON CONFLICT DO UPDATE`), and rewrites. The new-key metric is a
  * left-anti count, equivalent to the reference's before/after COUNT(*)
  * but computed without two racy server round-trips. At 100 TB the
  * rewrite becomes a staged append + server-side MERGE (or a Delta-style
  * transactional sink); the dataflow shape — keyed merge shuffle,
  * anti-join metric — is identical.
  *
  * Overwrite uses Spark's drop-and-recreate path (works on every
  * dialect); a production deployment against a real server would set
  * `truncate=true` to keep DDL/grants.
  */
final class JdbcStore(spark: SparkSession, url: String) {

  private val props = new Properties()

  def writeTable(df: DataFrame, table: String, mode: SaveMode): Unit =
    df.write.mode(mode).jdbc(url, table, props)

  def readTable(table: String): DataFrame =
    spark.read.jdbc(url, table, props)

  def tableExists(table: String): Boolean =
    try { spark.read.jdbc(url, table, props).schema; true }
    catch { case _: Exception => false }

  /** Idempotent keyed upsert; returns the count of genuinely-new keys
    * (updates don't count — reference `database.py:164-190`). BOTH
    * branches dedup per key before writing — the reference's PK `ON
    * CONFLICT` can never persist two rows for one key, so neither may
    * the table-creating first batch (an at-least-once feed flushing a
    * retry buffer previously seeded duplicates; review r8).
    */
  def upsert(table: String, incoming: DataFrame,
             keyCol: String, versionCol: String): Long = {
    if (!tableExists(table)) {
      writeTable(MergeOps.mergeByKey(incoming.limit(0), incoming, keyCol, versionCol),
        table, SaveMode.ErrorIfExists)
      incoming.select(keyCol).distinct().count()
    } else {
      // pin ONE snapshot of the live table: the metric and the merge must
      // observe the same state (two lazy reads = two server scans that a
      // concurrent writer can interleave; review r8), and the overwrite
      // below drops its own source
      val existing = readTable(table).localCheckpoint(true)
      val newKeys = incoming.join(existing, Seq(keyCol), "left_anti")
        .select(keyCol).distinct().count()
      val merged = MergeOps.mergeByKey(existing, incoming, keyCol, versionCol)
      writeTable(merged, table, SaveMode.Overwrite)
      newKeys
    }
  }

  /** Append-only high-water-mark store (reference `ingestion_state`). */
  def appendWatermark(table: String, ts: java.sql.Timestamp): Unit = {
    import spark.implicits._
    writeTable(Seq(ts).toDF("last_fetched"),
      table, if (tableExists(table)) SaveMode.Append else SaveMode.ErrorIfExists)
  }

  /** Latest watermark, if any run has recorded one. */
  def latestWatermark(table: String): Option[java.sql.Timestamp] =
    if (!tableExists(table)) None
    else readTable(table).agg(max(col("last_fetched")))
      .collect().headOption.flatMap(r => Option(r.getTimestamp(0)))
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.Scalars._

/** Table utilities: column profiling (the ANALYZE/data-quality pass a
  * pipeline runs on every new partition) and a two-version diff summary
  * (the reference's change detection, src/database.py:225-271,
  * generalized from latest-row comparison to full table deltas).
  */
object ProfilingOps extends QueryModule {

  /** Per-column profile of `lineitem`'s numeric columns: null fraction,
    * distinct count, min/max/mean — one aggregate pass, transposed to a
    * row per column (a stack of per-column aggregates, not N scans).
    */
  def profileTable(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val agg = li.agg(
      count(lit(1)).as("n"),
      cols.flatMap(c => Seq(
        count(col(c)).as(s"${c}_nn"),
        countDistinct(col(c)).as(s"${c}_nd"),
        min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max"),
        avg(col(c)).as(s"${c}_avg"))): _*)
    val perCol = cols.map { c =>
      agg.select(
        lit(c).as("column_name"),
        col("n").as("n_rows"),
        roundTo((col("n") - col(s"${c}_nn")).cast("double") / col("n"), 4).as("null_frac"),
        col(s"${c}_nd").as("n_distinct"),
        roundTo(col(s"${c}_min"), 4).as("min_value"),
        roundTo(col(s"${c}_max"), 4).as("max_value"),
        roundTo(col(s"${c}_avg"), 4).as("avg_value"))
    }
    perCol.reduce(_ unionByName _).orderBy("column_name")
  }

  val profileOracle: String = {
    def one(c: String) =
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
         | floor(((count(*) - count($c))::DOUBLE / count(*)) * 1e4 + 0.5) / 1e4 AS null_frac,
         | count(DISTINCT $c) AS n_distinct,
         | floor(min($c) * 1e4 + 0.5) / 1e4 AS min_value,
         | floor(max($c) * 1e4 + 0.5) / 1e4 AS max_value,
         | floor(avg($c) * 1e4 + 0.5) / 1e4 AS avg_value
         |FROM lineitem""".stripMargin
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map(one).mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }

  /** Two-version diff summary: classify every key as added / removed /
    * changed / unchanged between version A (events before a cut) and
    * version B (A merged with the post-cut batch plus doubled values for
    * every 13th key — a synthetic update set). Full outer join on the key.
    */
  def tableDiff(s: SparkSession, dir: String): DataFrame = {
    val cut = to_timestamp(lit("2024-01-20 00:00:00"))
    val ev = Tables.events(s, dir).select(col("event_id"), col("ts"), col("value"))
    val a = ev.filter(col("ts") < cut).select(col("event_id"), col("value"))
    // synthetic version B: every 13th key updated (doubled), every 17th
    // (non-updated) key removed, post-cut rows added
    val b = a.select(col("event_id"),
        when(col("event_id") % 13 === 0, col("value") * 2).otherwise(col("value")).as("value"))
      .filter(col("event_id") % 17 =!= 0 || col("event_id") % 13 === 0)
      .unionByName(ev.filter(col("ts") >= cut).select(col("event_id"), col("value")))
    val av = a.select(col("event_id").as("k"), col("value").as("va"))
    val bv = b.select(col("event_id").as("k"), col("value").as("vb"))
    av.join(bv, Seq("k"), "full_outer")
      .select(
        when(col("va").isNull, "added")
          .when(col("vb").isNull, "removed")
          .when(col("va") =!= col("vb"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy("status").agg(count(lit(1)).as("n_keys"))
      .orderBy("status")
  }

  val tableDiffOracle: String =
    """WITH a AS (SELECT event_id, value FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00'),
      |b AS (
      | SELECT event_id, CASE WHEN event_id % 13 = 0 THEN value * 2 ELSE value END AS value
      | FROM a WHERE event_id % 17 != 0 OR event_id % 13 = 0
      | UNION ALL
      | SELECT event_id, value FROM events WHERE ts >= TIMESTAMP '2024-01-20 00:00:00')
      |SELECT status, count(*) AS n_keys FROM (
      | SELECT CASE WHEN a.event_id IS NULL THEN 'added'
      |  WHEN b.event_id IS NULL THEN 'removed'
      |  WHEN a.value != b.value THEN 'changed'
      |  ELSE 'unchanged' END AS status
      | FROM a FULL OUTER JOIN b ON a.event_id = b.event_id)
      |GROUP BY 1 ORDER BY status""".stripMargin

  /** Document-length histogram: fixed 50-char buckets capped at bucket 9
    * (the long tail collapses into the last bin), with each bin's share of
    * the corpus — the length-distribution profile consulted before
    * truncation/packing decisions in training-data prep. One keyed
    * aggregate over ≤10 groups; the total rides in via a broadcast 1-row
    * aggregate so the share division happens on the tiny grouped table.
    */
  def lengthHistogram(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(least(floor(col("n_chars") / 50.0), lit(9.0)).cast("long").as("bucket"))
    val total = docs.agg(count(lit(1)).as("total"))
    docs.groupBy(col("bucket")).agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(total))
      .select(col("bucket"), col("n_docs"),
        roundTo(col("n_docs").cast("double") / col("total"), 4).as("share"))
      .orderBy("bucket")
  }

  val lengthHistogramOracle: String =
    """WITH b AS (
      | SELECT CAST(least(floor(n_chars / 50.0), 9.0) AS BIGINT) AS bucket
      | FROM documents),
      |t AS (SELECT count(*) AS total FROM b)
      |SELECT bucket, count(*) AS n_docs,
      | floor(count(*)::DOUBLE / total * 1e4 + 0.5) / 1e4 AS share
      |FROM b, t GROUP BY bucket, total ORDER BY bucket""".stripMargin

  override def queries: Seq[RegisteredQuery] = Seq(
    RegisteredQuery("profile_table", profileTable, Some(profileOracle)),
    RegisteredQuery("table_diff", tableDiff, Some(tableDiffOracle)),
    RegisteredQuery("length_histogram", lengthHistogram, Some(lengthHistogramOracle)),
  )
}

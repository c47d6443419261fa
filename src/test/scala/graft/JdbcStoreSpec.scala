package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.sources.JdbcStore

/** The JDBC DAL against Derby (in-memory, embedded — the JDBC driver Spark
  * ships with): roundtrip fidelity, upsert/new-key semantics (S6/S7 via a
  * real database instead of the parquet store), watermark state, and
  * predicate pushdown INTO the JDBC scan.
  */
class JdbcStoreSpec extends SparkSpec {

  private def newStore(db: String) =
    new JdbcStore(spark, s"jdbc:derby:memory:$db;create=true")

  private def events =
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))

  test("write/read roundtrip preserves rows and values") {
    val store = newStore("rt")
    val ev = events.limit(500).localCheckpoint(true)
    store.writeTable(ev.coalesce(2), "events_rt", SaveMode.ErrorIfExists)
    val back = store.readTable("events_rt")
    assert(back.count() === ev.count())
    assert(back.exceptAll(ev).isEmpty && ev.exceptAll(back).isEmpty)
  }

  test("upsert merges keep-latest-per-key and counts only genuinely-new keys") {
    val store = newStore("ups")
    val base = events.filter(col("event_id") < 300)
    val n0 = store.upsert("events_m", base, "event_id", "ts")
    assert(n0 === base.count())

    // re-deliver 100 known keys with bumped versions + 50 new keys
    val updates = events.filter(col("event_id") < 100)
      .withColumn("ts", col("ts") + expr("INTERVAL 1 HOUR"))
      .withColumn("value", col("value") * 2)
    val fresh = events.filter(col("event_id") >= 300 && col("event_id") < 350)
    val n1 = store.upsert("events_m", updates.unionByName(fresh), "event_id", "ts")
    assert(n1 === 50, s"only the 50 fresh keys are new, got $n1")

    val merged = store.readTable("events_m")
    assert(merged.count() === 350)
    // updated keys carry the bumped version (reference ON CONFLICT DO UPDATE)
    val bumped = merged.join(updates.select(col("event_id"), col("ts").as("uts")), "event_id")
      .filter(col("ts") =!= col("uts")).count()
    assert(bumped === 0, "updates must win on re-delivered keys")
  }

  test("jdbc_merge_digest equals the parquet-path s7 digest over the same feed") {
    // the registered Derby-backed digest must be byte-identical with
    // MergeOps' in-plan merge on the identical every-5th-key slice — a
    // drift in either path (roundtrip fidelity, merge semantics, new-key
    // accounting) fails here without a DuckDB round-trip
    val jdbc = graft.operators.MergeOps.jdbcMergeDigest(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val batch = graft.operators.MergeOps.s7DigestOf(
        Tables.events(spark, sfDir)
          .filter(col("event_id") % 5 === 0)
          .select(col("event_id"), col("ts"), col("value")))
      .collect().map(_.toSeq).toSeq
    assert(jdbc === batch)
  }

  test("upsert is idempotent: replaying the same batch adds zero new keys and changes nothing") {
    val store = newStore("idem")
    val batch = events.filter(col("event_id") < 200).localCheckpoint(true)
    assert(store.upsert("events_i", batch, "event_id", "ts") === 200)
    val first = store.readTable("events_i").localCheckpoint(true)
    // the reference's CDC loop re-delivers batches on retry; the sink must
    // converge, not duplicate (database.py ON CONFLICT semantics)
    assert(store.upsert("events_i", batch, "event_id", "ts") === 0)
    val second = store.readTable("events_i")
    assert(second.count() === 200)
    assert(second.exceptAll(first).isEmpty && first.exceptAll(second).isEmpty)
  }

  test("watermark store appends and returns the max (reference ingestion_state)") {
    val store = newStore("wm")
    assert(store.latestWatermark("state").isEmpty)
    store.appendWatermark("state", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    store.appendWatermark("state", java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    store.appendWatermark("state", java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
    assert(store.latestWatermark("state")
      === Some(java.sql.Timestamp.valueOf("2024-02-01 00:00:00")))
  }

  test("watermark predicate pushes down into the JDBC scan") {
    val store = newStore("pd")
    store.writeTable(events.limit(1000).coalesce(1), "events_pd", SaveMode.ErrorIfExists)
    val hwm = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    val scan = store.readTable("events_pd")
      .filter(col("ts") >= lit(hwm))
      .select("event_id", "ts")
    val plan = scan.queryExecution.executedPlan.toString
    // the * prefix marks a filter handled by the database, not just Spark
    assert(plan.contains("PushedFilters") &&
      plan.contains("*GreaterThanOrEqual(ts"), plan)
    // and column pruning reaches the relation: only the 2 selected columns
    assert(!plan.toLowerCase.contains("user_id"), plan)
    assert(scan.count() > 0)
  }

  test("first-batch upsert dedups duplicate keys like every later merge (r8 regression)") {
    import spark.implicits._
    val store = newStore("dup0")
    // an at-least-once retry buffer: key 1 delivered twice in batch ONE
    val batch = Seq((1L, 10L, 1.0), (1L, 20L, 2.0), (2L, 10L, 3.0))
      .toDF("event_id", "ver", "value")
    val inserted = store.upsert("t_dup0", batch, "event_id", "ver")
    assert(inserted === 2L, "inserted must count KEYS, not rows")
    val rows = store.readTable("t_dup0").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.size === 2, s"duplicate key persisted: ${rows.mkString(",")}")
    assert(rows(1L) === ((20L, 2.0)), "last-write-wins must pick the newest version")
  }
}

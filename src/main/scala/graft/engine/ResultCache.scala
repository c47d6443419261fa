package graft.engine

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-lifetime RESULT-SET cache — the warehouse feature that serves
  * a repeated query from its stored result instead of re-executing the
  * plan (the complement of [[graft.plans.MvCatalog]]'s rewrite: the MV
  * answers a FAMILY of rollups, the result cache answers the EXACT same
  * query again). Keyed by the query's canonicalized-plan `semanticHash`
  * — alias names, exprIds, and cosmetic projection differences hash the
  * same; any semantic change (different filter constant, different
  * grouping) misses — plus a caller-supplied tag carrying the fixture
  * fingerprint, so a rewritten fixture under the same path re-misses
  * (the StagedRoots discipline).
  *
  * Correctness contract: a hit is sound only for DETERMINISTIC queries —
  * callers must not route nondeterministic plans through the cache
  * (same contract every result cache ships with; Snowflake's disables
  * itself on nondeterministic functions). Storage lives under a
  * [[StagedRoots]] root, so PID-marked cleanup and the exit hook apply.
  * Hit/miss counters are exposed for gating.
  *
  * At 100 TB the win is the dashboard/report pattern: the same daily
  * query re-issued hundreds of times costs one execution plus N-1
  * result-sized reads — no scan, no shuffle, independent of fact size.
  */
object ResultCache {
  private val entries =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private val seq = new AtomicLong(0)
  val hits = new AtomicLong(0)
  val misses = new AtomicLong(0)

  private def root(): String =
    StagedRoots.of("resultcache", "jvm", "v1")(_ => ())

  /** Serve `df`'s result from the cache, executing and storing it on the
    * first sight of this (tag, semantic plan).
    */
  def run(s: SparkSession, df: DataFrame, tag: String): DataFrame = {
    val key = tag + "|" + df.queryExecution.optimizedPlan.semanticHash()
    entries.get(key) match {
      case Some(p) =>
        hits.incrementAndGet()
        s.read.parquet(p)
      case None =>
        misses.incrementAndGet()
        val p = s"${root()}/r${seq.incrementAndGet()}"
        df.write.parquet(p)
        entries.put(key, p)
        s.read.parquet(p)
    }
  }
}

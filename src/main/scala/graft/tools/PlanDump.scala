package graft.tools

import java.nio.file.{Files, Paths}

import graft.engine.Sessions

/** Regenerates PLANS.md: `explain("formatted")` output for a curated set
  * of queries whose physical shape IS the design claim (pushdown reaching
  * the scan, broadcasts on dimension sides, whole-stage codegen spans,
  * the custom AsofJoinExec, the join-free sweep, the page-pruning DSv2
  * scan). Run: `sbt "runMain graft.tools.PlanDump"` after operator
  * changes; the file is committed so plan regressions show up in diffs.
  */
object PlanDump {
  private val picked = Seq(
    "q1_perf_over_time" -> "flagship aggregation: pushed filters, single hash aggregate",
    "q2_top_mass" -> "global top-k planned as TakeOrderedAndProject",
    "j1_enrichment" -> "dimension enrichment: broadcast hash join, payload side pruned",
    "s3_watermark_scan" -> "watermark predicate pushed into the parquet scan (raw ns domain)",
    "asof_join_native" -> "custom AsofJoinExec: SMJ topology, co-partitioned exchanges, no window",
    "range_join_inflight" -> "bucketized range join: hash join on the month bucket, no nested loop",
    "range_count_sweep" -> "sweep-line tier: aggregate + window, join-free",
    "api_source_scan" -> "DSv2 source: pushed watermark visible in the scan description",
    "dedup_exact" -> "hash-aggregate dedup, min-key survivor",
    "sim_topk_brute" -> "codegen'd DotProduct inside whole-stage codegen, broadcast query side",
    "tfidf_topterms" -> "tokenize once; df as window over tf; broadcast corpus count",
    "zorder_key" -> "integer-only z-key: broadcast min/max, codegen'd interleave",
    "pivot_status_matrix" -> "explicit-values pivot: one hash aggregate, no discovery scan",
    "a14_grouping_sets" -> "four grouping sets in ONE pass: Expand + single aggregate",
    "j4_salted_join" -> "salted shuffled-hash join: (key, salt) equi-join, no broadcast",
    "t6_topk_per_group" -> "rank<=k planned as WindowGroupLimit per-partition heaps",
    "asof_fwd_tolerance" -> "forward as-of + tolerance: still one exchange, tolerance is a projection",
    "w7_sliding_window" -> "hopping windows: generator fan-out (span/hop) + hash aggregate",
    "q5_region_revenue" -> "five-table star join: broadcast dimension chain over the fact edge",
    "q6_revenue_band" -> "zero-join scan: every predicate pushed (incl. TIMESTAMP_NTZ date band)",
    "knn_join_ivf" -> "IVF-blocked kNN join: exactly-once pair emission at the cell join, WindowGroupLimit top-k",
    "funnel_steps" -> "three chained conditional-min windows + census on ONE user_id exchange",
    "scd2_intervals" -> "SCD2: lag change-filter then row_number/lead, one exchange end to end",
    "ts_gapfill" -> "gap-fill: (user, day) aggregate, output-proportional grid, last(ignoreNulls) fill",
    "semdedup_prune" -> "SemDeDup: cluster-keyed self-join over ONE checkpointed assignment, no cartesian",
    "fuzzy_match_names" -> "ED-Join: rare-gram prefix postings join + bounded residual BNLJ, levenshtein verify",
    "bm25_retrieval" -> "BM25: probe-term broadcast semi-join gates the postings; WindowGroupLimit top-10 per query",
    "api_source_agg" -> "DSv2 aggregate pushdown: closed-form count/min/max — NO aggregate exec, zero rows scanned",
    "correlated_above_avg" -> "correlated scalar subquery decorrelated: one aggregate + equi-join back",
    "not_in_null_trap" -> "NOT IN as null-aware broadcast anti join vs NOT EXISTS as plain left anti",
    "bag_intersect_except" -> "INTERSECT/EXCEPT ALL: per-side count aggregate + replicate, groupBy cost class",
    "w8_running_distinct" -> "running COUNT DISTINCT as first-seen flag + cumulative sum, no set-valued state",
    "w8_running_distinct_naive" -> "RewriteRunningDistinct: naive size(collect_set() OVER) re-planned to the flag+sum topology",
    "scd2_pit_join" -> "point-in-time join as backward as-of carry: no join operator anywhere in the plan",
    "mm_phash_neardup" -> "perceptual dedup: map-only band hashing, keyed band join, no cartesian",
    "w9_range_frame" -> "time-RANGE frame: one keyed exchange, range-bounded WindowExec buffer",
    "graph_triangles" -> "compact-forward triangles: broadcast adjacency attach, wedge stream collapsed in array_intersect — no SMJ, no cartesian",
    "pareto_frontier" -> "skyline: min-per-size keyed aggregate bounds the single-partition staircase window",
    // bloom_skew_join / sim_ivf_stored are NOT here: their registered
    // entries return driver-materialized rows (scopedRun / stored-index
    // serve), so the interesting plans live in their spec pins
    // (SkewJoinAqeSpec, KnnJoinSpec) instead of an explain dump
    "chunk_cdc_census" -> "CDC chunking: map-only boundary detection (Generate + codegen md5), one doc-keyed window, hash-keyed dup census",
    "hybrid_rrf_retrieval" -> "RRF fusion: ONE shared postings frame feeds both rankers; full-outer join of two 10-row-per-query lists",
    // cbo_stats_join is NOT here for the same scopedRun reason as
    // bloom_skew_join — its strategy flip is pinned in CboStatsSpec
    "mv_rewrite_rollup" -> "MvRollupRewrite fired: the scan is the stored month x customer MV, the base table is absent",
    "fk_join_elim" -> "FkJoinElimination fired: declared-redundant dimension join GONE, bare fact scan + one aggregate",
    "hof_array_pipeline" -> "higher-order lambdas fused into one codegen span over the scan; only exchange is the final sort",
    "recursive_cte_spine" -> "WITH RECURSIVE month spine: UnionLoop over the date domain, data-scale work in one aggregate + spine join")

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("plandump", 8)
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = new StringBuilder
    out ++= "# PLANS.md — physical plans of the flagship queries\n\n"
    out ++= "Generated by `sbt \"runMain graft.tools.PlanDump\"` (sf0.001, AQE on,\n"
    out ++= "plans shown BEFORE adaptive finalization). Regenerate after operator\n"
    out ++= "changes; review diffs like code.\n"
    picked.foreach { case (name, why) =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      out ++= s"\n## $name\n\n$why\n\n```\n$plan```\n"
    }
    Files.writeString(Paths.get(sys.props("user.dir"), "PLANS.md"), out.toString)
    println(s"[plandump] wrote ${picked.size} plans to PLANS.md")
    spark.stop()
  }
}

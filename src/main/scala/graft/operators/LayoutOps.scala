package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Data-layout operators — the write-side half of scan pruning. Parquet
  * row-group/file skipping works off per-file min/max footer stats, so WHAT
  * ORDER data lands on disk in decides how selective a 100 TB scan can be.
  * A single-column sort prunes one predicate dimension; Z-ordering
  * (interleaving the bits of several dimensions' ranks) keeps EVERY
  * dimension's values locally clustered, so conjunctive predicates on any
  * subset of the dimensions skip most files — the layout pass behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`, run here as a plain Spark
  * range-repartition + write.
  *
  * The z-key math is pure integer arithmetic (rank-normalize to 16 bits by
  * integer division, interleave by shift/or) — bit-identical across
  * engines, so the key itself is oracle-checked exactly; the layout effect
  * is proven empirically by `ZorderLayoutSpec` (per-file spans of BOTH
  * dimensions shrink vs a one-dimensional sort).
  */
object LayoutOps extends QueryModule {

  /** Bits per dimension (two dimensions → 32-bit z-key in a long). */
  private val B = 16

  /** Interleave the low `B` bits of nx into even positions and ny into
    * odd positions: z = Σ bit_i(nx)·4^i + 2·Σ bit_i(ny)·4^i. Plain
    * shift/and/or expression tree — whole-stage-codegen'd, no UDF.
    */
  def zInterleave(nx: Column, ny: Column): Column =
    (0 until B).map { i =>
      (shiftleft(shiftright(nx, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(ny, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))

  /** Registered exercise: z-key every order over (customer, order-day) —
    * the two dimensions ad-hoc order analytics actually filter on. Output
    * is the key itself (exact-checked); the write-side effect is spec'd.
    * All arithmetic is `div` INTEGER division — `unix_micros` exceeds
    * 2^53, so a double division would already be lossy — which also
    * makes the rank-normalize floor-divide bit-identical across engines.
    */
  def zorderKey(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).selectExpr(
      "o_orderkey", "o_custkey",
      // epoch days: integer domain for the date dimension
      "unix_micros(cast(o_orderdate AS timestamp)) div 86400000000 AS day")
    val mm = o.agg(
      min(col("o_custkey")).as("cmin"), max(col("o_custkey")).as("cmax"),
      min(col("day")).as("dmin"), max(col("day")).as("dmax"))
    val top = (1L << B) - 1
    o.crossJoin(broadcast(mm))
      .selectExpr(
        "o_orderkey",
        s"CASE WHEN cmax = cmin THEN 0L ELSE ((o_custkey - cmin) * ${top}L) div (cmax - cmin) END AS nx",
        s"CASE WHEN dmax = dmin THEN 0L ELSE ((day - dmin) * ${top}L) div (dmax - dmin) END AS ny")
      .select(col("o_orderkey"), zInterleave(col("nx"), col("ny")).as("zkey"))
      .orderBy("o_orderkey")
  }

  val zorderOracle: String = {
    val terms = (0 until B).map { i =>
      s"(((nx >> $i) & 1) << ${2 * i}) | (((ny >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" | ")
    s"""WITH o AS (
       | SELECT o_orderkey, o_custkey,
       |  CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day
       | FROM orders),
       |mm AS (SELECT min(o_custkey) AS cmin, max(o_custkey) AS cmax,
       |              min(day) AS dmin, max(day) AS dmax FROM o),
       |n AS (
       | SELECT o_orderkey,
       |  CASE WHEN cmax = cmin THEN 0
       |       ELSE (o_custkey - cmin) * ${(1L << B) - 1} // (cmax - cmin) END AS nx,
       |  CASE WHEN dmax = dmin THEN 0
       |       ELSE (day - dmin) * ${(1L << B) - 1} // (dmax - dmin) END AS ny
       | FROM o, mm)
       |SELECT o_orderkey, CAST($terms AS BIGINT) AS zkey
       |FROM n ORDER BY o_orderkey""".stripMargin
  }

  /** Write-side pass: range-repartition on the z-key and write — each
    * output file covers a compact z-range, i.e. a small rectangle in
    * (dim1, dim2) space, so min/max footer stats prune on either
    * dimension. `nFiles` maps to the target file size at scale.
    */
  def writeZClustered(df: DataFrame, zkey: Column, nFiles: Int, path: String): Unit =
    df.withColumn("__z", zkey)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Compaction target in "bytes" (the fixture's char counts stand in for
    * file sizes; at scale this is ~128 MB). */
  val compactionTarget = 20000L

  /** Small-file compaction planner — the OTHER chronic layout problem at
    * 100 TB: streaming/incremental ingest leaves millions of KB-sized
    * files, and open-file overhead (footer reads, task scheduling) comes
    * to dominate scans. The planner assigns input files to target-sized
    * output groups by a prefix-sum bin-pack: files in stable (doc_id)
    * order, each bin closed once the RUNNING total crosses the target —
    * `bin = bytes_before div target`. One unpartitioned window prefix sum
    * is deliberate and safe: the input is file METADATA (one row per
    * file, millions of rows at 100 TB), not data — same bounded-domain
    * argument as [[RangeOps.rangeCountSweep]]'s boundary stream; with a
    * partitioned table, partition the window by the table partition and
    * the plan parallelizes per partition.
    *
    * Deterministic (no sizes-descending heuristics that tie-break on
    * arrival order), so re-planning after a failed compaction run yields
    * the identical assignment — compaction stays idempotent. The fixture's
    * `documents` rows model the file listing; `n_chars` the file size.
    */
  /** The (doc_id, bytes, bin) frame both [[compactionPlan]] and
    * [[compactionApply]] derive from — ONE definition so the apply step
    * provably executes the same assignment the planner emitted. The
    * oracle twin is [[compactionBinSql]].
    */
  private def binnedFiles(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars").cast("long").as("bytes"))
      .withColumn("before", coalesce(sum(col("bytes")).over(w), lit(0L)))
      .withColumn("bin", expr(s"before div $compactionTarget"))
      .drop("before")
  }

  /** Shared oracle CTE prefix yielding c(doc_id, bytes, before). */
  private val compactionBinSql: String =
    s"""WITH f AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS bytes FROM documents),
       |c AS (SELECT doc_id, bytes,
       |  CAST(COALESCE(sum(bytes) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS before
       | FROM f)""".stripMargin

  def compactionPlan(s: SparkSession, dir: String): DataFrame = {
    binnedFiles(s, dir)
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n_files"),
        sum(col("bytes")).as("bin_bytes"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("bin")
  }

  val compactionOracle: String =
    s"""$compactionBinSql
       |SELECT before // $compactionTarget AS bin, count(*) AS n_files,
       | CAST(sum(bytes) AS BIGINT) AS bin_bytes,
       | min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM c GROUP BY 1 ORDER BY bin""".stripMargin

  /** The partitioned-write layout, driver-gated end to end: orders →
    * `repartition(partition column)` + `sortWithinPartitions` →
    * `write.partitionBy` → read back and AUDIT what actually landed. The
    * three layout disciplines a 100 TB table lives or dies by, checked in
    * one row set per partition value:
    *  - `n_files` = 1: the repartition-before-partitionBy rule — without
    *    it every write task emits a file into every partition dir
    *    (tasks × partitions small files, the disease `compaction_plan`
    *    exists to cure after the fact);
    *  - `files_sorted`: `sortWithinPartitions` must survive the write —
    *    the footer min/max selectivity [[zorderKey]] is about;
    *  - `n_rows`/`sum_price`: nothing lost or duplicated, and the
    *    partition VALUES round-trip through directory names (the read
    *    reconstructs `o_orderstatus` from `status=...` dirs, not file
    *    contents).
    * The within-file order check reads each file back in one split
    * (fixture-sized files) and verifies the key is non-decreasing in
    * physical row order via a per-file window over
    * `monotonically_increasing_id` — valid because a ≤128 MB parquet file
    * is one read partition and Spark preserves row order within a split.
    */
  /** Run `body` against a fresh temp dir, always deleting the tree after
    * (callers MUST materialize their result inside `body` — both users
    * return a `createDataFrame(collectAsList)` snapshot).
    */
  private def withTempDir(prefix: String)(
      body: java.nio.file.Path => DataFrame): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory(prefix)
    try body(root)
    finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(root)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  def partitionedWriteAudit(s: SparkSession, dir: String): DataFrame =
    withTempDir("graft-pw-audit") { root =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus"))
        .repartition(col("o_orderstatus"))
        .sortWithinPartitions("o_orderstatus", "o_orderkey")
        .write.partitionBy("o_orderstatus").mode("overwrite")
        .parquet(root.toString)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__f")).orderBy(col("__ord"))
      val back = s.read.parquet(root.toString)
        .withColumn("__f", input_file_name())
        .withColumn("__ord", monotonically_increasing_id())
        .withColumn("__prev", lag(col("o_orderkey"), 1).over(w))
      val out = back
        .groupBy(col("o_orderstatus").as("status"))
        .agg(
          countDistinct(col("__f")).as("n_files"),
          count(lit(1)).as("n_rows"),
          graft.functions.Scalars.roundTo(sum(col("o_totalprice")), 2)
            .as("sum_price"),
          min(col("__prev").isNull || col("__prev") <= col("o_orderkey"))
            .as("files_sorted"))
        .orderBy("status")
      s.createDataFrame(out.collectAsList(), out.schema)
    }

  /** n_rows/sum_price are REAL SQL over orders; n_files=1 and
    * files_sorted=true are the pinned layout contract.
    */
  val partitionedWriteAuditOracle: String =
    """SELECT o_orderstatus AS status, CAST(1 AS BIGINT) AS n_files,
      | count(*) AS n_rows,
      | floor(sum(o_totalprice) * 100 + 0.5) / 100 AS sum_price,
      | true AS files_sorted
      |FROM orders GROUP BY 1 ORDER BY status""".stripMargin

  /** DYNAMIC partition overwrite — the sink semantic that makes
    * partition-grained reprocessing safe: `mode("overwrite")` under
    * `partitionOverwriteMode=dynamic` replaces ONLY the partitions the
    * incoming frame touches, where the default STATIC mode truncates the
    * whole table first. The gate seeds every status partition (epoch 0),
    * dynamically overwrites just the `F` partition (epoch 1), and reads
    * the table back: `F` must carry the new epoch, every other partition
    * must SURVIVE with epoch 0 — under static mode they would be gone
    * (the contrast `ZorderLayoutSpec` pins). Conf scoped set/restore
    * like [[footerMinmax]]; result materialized inside the temp-dir
    * window.
    *
    * At 100 TB this is the idempotent-backfill primitive: re-running one
    * day's job rewrites one `day=` directory atomically-enough for file
    * tables, instead of truncating years of history (the reference's
    * whole-table upsert S7 re-expressed at partition grain).
    */
  def dynamicPartitionOverwrite(s: SparkSession, dir: String): DataFrame =
    withTempDir("graft-dpo") { root =>
      val o = Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_orderstatus"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      o.withColumn("epoch", lit(0L))
        .write.partitionBy("o_orderstatus").mode("overwrite")
        .parquet(root.toString)
      val key = "spark.sql.sources.partitionOverwriteMode"
      val saved = s.conf.getOption(key)
      try {
        s.conf.set(key, "dynamic")
        o.filter(col("o_orderstatus") === "F").withColumn("epoch", lit(1L))
          .write.partitionBy("o_orderstatus").mode("overwrite")
          .parquet(root.toString)
      } finally saved.fold(s.conf.unset(key))(s.conf.set(key, _))
      val out = s.read.parquet(root.toString)
        .groupBy(col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("epoch")).as("epoch_min"),
          max(col("epoch")).as("epoch_max"),
          (sum(col("cents")) / 100.0).as("total"))
        .orderBy("status")
      s.createDataFrame(out.collectAsList(), out.schema)
    }

  /** n_rows/total are REAL SQL over orders (proof no partition was lost
    * or doubled); the epoch columns pin the overwrite grain — F fully
    * replaced (min=max=1), everything else untouched (min=max=0).
    */
  val dynamicPartitionOverwriteOracle: String =
    """SELECT o_orderstatus AS status, count(*) AS n_rows,
      | CAST(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS BIGINT) AS epoch_min,
      | CAST(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS BIGINT) AS epoch_max,
      | CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |   / 100.0 AS total
      |FROM orders GROUP BY 1 ORDER BY status""".stripMargin

  /** Footer-stats aggregation — whole-table min/max/count answered from
    * parquet FOOTER metadata instead of row scans (`PushedAggregation` in
    * the V2 scan): at 100 TB this turns a full-column pass into reading
    * one stats struct per file. Needs the parquet V2 read path +
    * `parquet.aggregatePushdown`, both scoped to THIS query and restored
    * in `finally` (the result is materialized inside the window — same
    * discipline as [[partitionedWriteAudit]]'s temp dir). Values are
    * plain SQL (the pushdown is an optimization, not a semantic), so the
    * oracle is exact; the plan property is pinned in `ZorderLayoutSpec`.
    */
  def footerMinmax(s: SparkSession, dir: String): DataFrame = {
    val confs = Map(
      "spark.sql.parquet.aggregatePushdown" -> "true",
      "spark.sql.sources.useV1SourceList" -> "")
    val saved = confs.keys.map(k => k -> s.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      val out = s.read.parquet(s"$dir/orders.parquet")
        .agg(min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"),
          count(lit(1)).as("n_rows"))
      s.createDataFrame(out.collectAsList(), out.schema)
    } finally saved.foreach { case (k, v) =>
      v.fold(s.conf.unset(k))(s.conf.set(k, _))
    }
  }

  val footerMinmaxOracle: String =
    """SELECT min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
      | count(*) AS n_rows
      |FROM orders""".stripMargin

  /** Rendezvous (highest-random-weight) sharding audit: assign every doc
    * to a shard by arg-max of md5(doc_id:shard) over the shard set, under
    * 8 shards and again under 10, and report how many keys move — against
    * the mod-hash baseline. Rendezvous is how a 100 TB corpus store keeps
    * re-sharding incremental: growing 8→10 shards relocates only the keys
    * won by the NEW shards (expected 2/10), and `rw_moved_to_new` pins
    * that minimal-disruption guarantee in data (every mover lands on
    * shard 8 or 9), while `doc_id % n` relocates 80% (only ids equal mod
    * lcm(8,10) stay). The per-key arg-max is a constant-width array
    * expression fused into the scan — no explode, no shuffle; the only
    * exchanges are the 1-row digest and the 8-row occupancy census.
    */
  def shardRendezvous(s: SparkSession, dir: String): DataFrame = {
    val nNew = 10
    val hashes = array((0 until nNew).map { i =>
      struct(md5(concat(col("doc_id").cast("string"), lit(":" + i))).as("h"),
        lit(i.toLong).as("shard"))
    }: _*)
    val assigns = Tables.documents(s, dir)
      .select(col("doc_id"), hashes.as("hs"))
      .select(col("doc_id"),
        array_max(slice(col("hs"), 1, 8)).getField("shard").as("s8"),
        array_max(col("hs")).getField("shard").as("s10"),
        (col("doc_id") % 8).as("m8"), (col("doc_id") % 10).as("m10"))
    val digest = assigns.agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("s8") =!= col("s10"), 1L).otherwise(0L)).cast("long").as("rw_moved"),
      sum(when(col("s8") =!= col("s10") && col("s10") >= 8, 1L).otherwise(0L))
        .cast("long").as("rw_moved_to_new"),
      sum(when(col("m8") =!= col("m10"), 1L).otherwise(0L)).cast("long").as("mod_moved"))
    val occ = assigns.groupBy(col("s8")).agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("rw_max_occ8"), min(col("c")).as("rw_min_occ8"))
    digest.crossJoin(occ)
  }

  val shardRendezvousOracle: String =
    """WITH a AS (
      | SELECT doc_id,
      |  arg_max(s, md5(CAST(doc_id AS VARCHAR) || ':' || CAST(s AS VARCHAR)))
      |    FILTER (WHERE s < 8) AS s8,
      |  arg_max(s, md5(CAST(doc_id AS VARCHAR) || ':' || CAST(s AS VARCHAR))) AS s10,
      |  doc_id % 8 AS m8, doc_id % 10 AS m10
      | FROM documents CROSS JOIN range(0, 10) t(s) GROUP BY doc_id),
      |digest AS (
      | SELECT count(*) AS n_docs,
      |  CAST(sum(CASE WHEN s8 <> s10 THEN 1 ELSE 0 END) AS BIGINT) AS rw_moved,
      |  CAST(sum(CASE WHEN s8 <> s10 AND s10 >= 8 THEN 1 ELSE 0 END) AS BIGINT) AS rw_moved_to_new,
      |  CAST(sum(CASE WHEN m8 <> m10 THEN 1 ELSE 0 END) AS BIGINT) AS mod_moved
      | FROM a),
      |occ AS (
      | SELECT max(c) AS rw_max_occ8, min(c) AS rw_min_occ8
      | FROM (SELECT count(*) AS c FROM a GROUP BY s8))
      |SELECT * FROM digest CROSS JOIN occ""".stripMargin

  /** The compaction plan APPLIED and audited — the missing middle of the
    * plan → rewrite → verify loop ([[compactionPlan]] only plans;
    * [[partitionedWriteAudit]] audits a different discipline). The
    * planned bin assignment is recomputed (idempotence is the plan's
    * contract), the rows are physically rewritten one-file-per-bin
    * (repartition on the bin key before partitionBy — the small-files
    * rule), and the AUDIT reads back what landed: per bin, the physical
    * file count via `input_file_name()` (the oracle states the contract
    * constant 1; Spark must OBSERVE it), row count, byte sum, and an
    * id-sum integrity probe proving no row was lost or duplicated in the
    * rewrite.
    *
    * Scale: the rewrite is one keyed repartition (bin count =
    * total_bytes / target, corpus-proportional parallelism); the audit
    * is one keyed aggregate over projected metadata columns. Same
    * temp-dir materialization discipline as [[partitionedWriteAudit]].
    */
  def compactionApply(s: SparkSession, dir: String): DataFrame =
    withTempDir("graft-compact-apply") { root =>
      binnedFiles(s, dir).repartition(col("bin"))
        .write.mode("overwrite").partitionBy("bin")
        .parquet(root.toString)
      val out = s.read.parquet(root.toString)
        .withColumn("__f", input_file_name())
        .groupBy(col("bin").cast("long").as("bin"))
        .agg(
          countDistinct(col("__f")).as("n_files"),
          count(lit(1)).as("n_docs"),
          sum(col("bytes")).as("bin_bytes"),
          sum(col("doc_id")).as("sum_doc_id"))
        .withColumn("single_file", col("n_files") === 1)
        .orderBy("bin")
      s.createDataFrame(out.collectAsList(), out.schema)
    }

  /** n_docs/bin_bytes/sum_doc_id are REAL SQL over the same bin
    * derivation; n_files=1 / single_file=true are the pinned physical
    * contract the Spark side must observe from the written layout.
    */
  val compactionApplyOracle: String =
    s"""$compactionBinSql
       |SELECT before // $compactionTarget AS bin,
       | CAST(1 AS BIGINT) AS n_files,
       | count(*) AS n_docs,
       | CAST(sum(bytes) AS BIGINT) AS bin_bytes,
       | CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
       | true AS single_file
       |FROM c GROUP BY bin ORDER BY bin""".stripMargin

  override def queries: Seq[RegisteredQuery] = Seq(
    RegisteredQuery("zorder_key", zorderKey, Some(zorderOracle)),
    RegisteredQuery("compaction_plan", compactionPlan, Some(compactionOracle)),
    RegisteredQuery("compaction_apply", compactionApply, Some(compactionApplyOracle)),
    RegisteredQuery("partitioned_write_audit", partitionedWriteAudit,
      Some(partitionedWriteAuditOracle)),
    RegisteredQuery("footer_minmax", footerMinmax, Some(footerMinmaxOracle)),
    RegisteredQuery("shard_rendezvous", shardRendezvous, Some(shardRendezvousOracle)),
    RegisteredQuery("dynamic_partition_overwrite", dynamicPartitionOverwrite,
      Some(dynamicPartitionOverwriteOracle)),
  )
}

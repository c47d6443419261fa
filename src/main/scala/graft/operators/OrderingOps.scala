package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.engine.Tables
import graft.functions.Scalars.roundTo

/** Data-ordering operators for training-data prep: deterministic
  * train/val/test split assignment, per-source quota rebalancing, and a
  * distributed global shuffle. Like [[SamplingOps]], all "randomness" is
  * `md5(key)` rank — stable across engines, runs, and cluster layouts, so
  * every operator here is fully oracle-checkable, and re-running the
  * pipeline on a grown corpus keeps previously-assigned docs in the same
  * split/order bucket (only genuinely new keys land in new places).
  *
  * Reference provenance: the reference selects and orders its ingest
  * batches deterministically (sorted, bounded fetches —
  * `src/api.py:80-174`) and derives reproducible batch metadata
  * (`src/aggregations.py:417-465`); these operators are the corpus-scale
  * rendition of that determinism for LLM training data.
  */
object OrderingOps extends QueryModule {

  /** Hex→long on the first `n` chars of an md5, identically computable in
    * DuckDB as `CAST('0x' || substr(md5(x), 1, n) AS INTEGER)`.
    */
  private def md5Bucket(c: org.apache.spark.sql.Column, n: Int) =
    conv(substring(md5(c.cast("string")), 1, n), 16, 10).cast("long")

  /** The 80/10/10 split label as a reusable column expression (see
    * [[splitAssign]] for the semantics and determinism rationale).
    */
  def splitExpr(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val b = md5Bucket(c, 4)
    when(b < 52429, "train").when(b < 58982, "val").otherwise("test")
  }

  // ---------------------------------------------------------------------
  // Train/val/test split assignment
  // ---------------------------------------------------------------------

  /** Deterministic 80/10/10 split by hashed key: bucket = first 4 hex
    * chars of md5(doc_id) (uniform on 0..65535), thresholds at 0.8 and
    * 0.9 of the range. Map-only — no shuffle, no RNG state, no seed
    * plumbing; at 100 TB this is a projection fused into the scan, and
    * membership is reproducible per-key forever (docs never migrate
    * between splits as the corpus grows — the property hash-splits are
    * chosen for over `rand()`).
    */
  def splitAssign(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        md5Bucket(col("doc_id"), 4).as("bucket"))
      .withColumn("split", splitExpr(col("doc_id")))
      .orderBy("doc_id")

  val splitAssignOracle: String =
    """SELECT doc_id, lang,
      | CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER) AS BIGINT) AS bucket,
      | CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER) < 52429 THEN 'train'
      |      WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER) < 58982 THEN 'val'
      |      ELSE 'test' END AS split
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Per-source quota rebalancing
  // ---------------------------------------------------------------------

  /** Cap each source at `quota` docs (keep the md5-rank winners) and
    * report the per-source balance sheet: total, kept, dropped, and the
    * char mass actually retained. One shuffle on the stratum key (the
    * window and the aggregate share the `source` partitioning, so the
    * exchange is reused); at 100 TB the dominant source — the whole
    * reason to rebalance — caps out at quota rows per partition.
    */
  def quotaRebalance(s: SparkSession, dir: String, quota: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rk", row_number().over(w))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("rk") <= quota, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rk") > quota, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("rk") <= quota, col("n_chars")).otherwise(0L)).as("kept_chars"))
      .orderBy("source")
  }

  val quotaRebalanceOracle: String =
    """WITH ranked AS (
      | SELECT source, n_chars,
      |  row_number() OVER (PARTITION BY source
      |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      | FROM documents)
      |SELECT source, count(*) AS n_docs,
      | CAST(sum(CASE WHEN rk <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      | CAST(sum(CASE WHEN rk > 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
      | CAST(sum(CASE WHEN rk <= 30 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
      |FROM ranked GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // Distributed global shuffle
  // ---------------------------------------------------------------------

  /** Deterministic global training order WITHOUT a single-partition sort.
    * A naive `row_number() OVER (ORDER BY hash)` funnels the whole corpus
    * through one partition — the classic global-rank scale-killer.
    * Instead: the first 2 hex chars of the shuffle key split the corpus
    * into 256 blocks (map-only); ranks are computed per-block in
    * parallel; block offsets (a 256-row cumulative sum) are broadcast
    * back. Because the block id is a PREFIX of the sort key,
    * concatenating blocks in id order IS the md5-global order, which the
    * oracle checks against a true global row_number. At 100 TB the block
    * count rises with the cluster (65536 via 4 chars) and the offset
    * table stays broadcast-sized.
    */
  def shuffleBlocks(s: SparkSession, dir: String): DataFrame = {
    val keyed = Tables.documents(s, dir)
      .select(col("doc_id"),
        md5(concat(lit("shuf42:"), col("doc_id").cast("string"))).as("skey"))
      .withColumn("block", conv(substring(col("skey"), 1, 2), 16, 10).cast("long"))
    val posInBlock = keyed
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("block")).orderBy(col("skey"), col("doc_id"))).cast("long"))
    val offsets = keyed.groupBy(col("block")).agg(count(lit(1)).as("n"))
      .withColumn("offset",
        coalesce(sum(col("n")).over(
          Window.orderBy(col("block")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("block"), col("offset"))
    posInBlock
      .join(broadcast(offsets), "block")
      .select(col("doc_id"), col("block"), (col("offset") + col("pos")).as("global_pos"))
      .orderBy("global_pos")
  }

  val shuffleBlocksOracle: String =
    """WITH keyed AS (
      | SELECT doc_id, md5('shuf42:' || CAST(doc_id AS VARCHAR)) AS skey
      | FROM documents)
      |SELECT doc_id,
      | CAST(CAST('0x' || substr(skey, 1, 2) AS INTEGER) AS BIGINT) AS block,
      | CAST(row_number() OVER (ORDER BY skey, doc_id) AS BIGINT) AS global_pos
      |FROM keyed ORDER BY global_pos""".stripMargin

  // ---------------------------------------------------------------------
  // Temperature-based source mixing
  // ---------------------------------------------------------------------

  /** Data mixing with temperature α = 0.5: source s gets weight
    * n_s^α / Σ n_t^α — the standard trick (multilingual/multi-corpus LLM
    * training) that up-samples small sources relative to proportional
    * sampling without letting any source dominate. Per-source targets are
    * the binary-exact rounding of `totalTarget · w`, and the selected docs
    * are the per-source md5-rank winners, so the whole mix is reproducible
    * and engine-checkable. Two keyed shuffles (per-source count, rank
    * window) + a broadcast 1-row denominator; the per-source weight table
    * is metadata-sized at any corpus scale.
    *
    * Double-parity note: sqrt is correctly rounded in IEEE 754 (identical
    * bits in both engines); the denominator sums ~10 source terms whose
    * order may differ between engines — a ≤ few-ulp wobble that 6 dp
    * rounding absorbs (same argument as TF-IDF's ln).
    */
  def mixSample(s: SparkSession, dir: String, totalTarget: Int = 200): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"), col("n_chars"))
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val denom = counts.agg(sum(sqrt(col("n_docs"))).as("denom"))
    val targets = counts.crossJoin(broadcast(denom))
      .select(col("source"), col("n_docs"),
        roundTo(sqrt(col("n_docs")) / col("denom"), 6).as("weight"),
        floor(lit(totalTarget.toDouble) * (sqrt(col("n_docs")) / col("denom")) + lit(0.5))
          .cast("long").as("n_target"))
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val selChars = docs
      .withColumn("rk", row_number().over(w))
      .join(broadcast(targets.select(col("source"), col("n_target").as("t"))), "source")
      .filter(col("rk") <= col("t"))
      .groupBy(col("source"))
      .agg(sum(col("n_chars")).as("sel_chars"))
    targets.join(selChars, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("weight"), col("n_target"),
        coalesce(col("sel_chars"), lit(0L)).as("sel_chars"))
      .orderBy("source")
  }

  val mixSampleOracle: String =
    """WITH counts AS (
      | SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
      |denom AS (SELECT sum(sqrt(n_docs)) AS denom FROM counts),
      |targets AS (
      | SELECT source, n_docs,
      |  floor(sqrt(n_docs) / denom * 1e6 + 0.5) / 1e6 AS weight,
      |  CAST(floor(200.0 * (sqrt(n_docs) / denom) + 0.5) AS BIGINT) AS n_target
      | FROM counts, denom),
      |ranked AS (
      | SELECT doc_id, source, n_chars,
      |  row_number() OVER (PARTITION BY source
      |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      | FROM documents),
      |sel AS (
      | SELECT r.source, CAST(sum(r.n_chars) AS BIGINT) AS sel_chars
      | FROM ranked r JOIN targets t USING (source)
      | WHERE r.rk <= t.n_target GROUP BY r.source)
      |SELECT t.source, t.n_docs, t.weight, t.n_target,
      | coalesce(s.sel_chars, 0) AS sel_chars
      |FROM targets t LEFT JOIN sel s USING (source)
      |ORDER BY t.source""".stripMargin

  /** T7: diversified top-k — the global best 20 documents by length with
    * at most 2 per source, the diversity cap retrieval/curation needs so
    * one prolific domain can't fill the whole selection. Two bounded
    * stages, no global sort: a per-source row_number (WindowGroupLimit
    * keeps per-partition heaps of size 2) then a global
    * TakeOrderedAndProject over the ≤ 2·|sources| survivors.
    */
  def diversifiedTopk(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars").cast("long").as("n_chars"))
      .withColumn("rank_in_source", row_number().over(w))
      .filter(col("rank_in_source") <= 2)
      .orderBy(col("n_chars").desc, col("doc_id"))
      .limit(20)
      .select(col("doc_id"), col("source"),
        col("n_chars"), col("rank_in_source").cast("long").as("rank_in_source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
  }

  val diversifiedTopkOracle: String =
    """SELECT doc_id, source, n_chars, rank_in_source
      |FROM (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
      |  row_number() OVER (PARTITION BY source
      |    ORDER BY n_chars DESC, doc_id) AS rank_in_source
      | FROM documents)
      |WHERE rank_in_source <= 2
      |ORDER BY n_chars DESC, doc_id LIMIT 20""".stripMargin

  // ---------------------------------------------------------------------
  // Pareto frontier (2-D skyline)
  // ---------------------------------------------------------------------

  /** 2-D Pareto frontier (skyline) over parts: the set of
    * (retailprice, size) points not dominated by any other point, where
    * q dominates p iff q is no more expensive AND no smaller, strictly
    * better in at least one. The multi-objective selection primitive —
    * "cheapest part at every size tier" — that shows up in corpus
    * curation as "highest quality at every length band".
    *
    * Two-stage prune+window skyline, not the NOT-EXISTS self-join:
    *  1. candidate prune — a frontier point must carry the MINIMUM price
    *     at its size (any same-size cheaper point dominates it), so
    *     `groupBy(size).min(price)` is an exact frontier superset, one
    *     keyed aggregate with map-side partials whose output is bounded
    *     by the sensitive-axis cardinality (≤ |distinct sizes|, 50
    *     here) regardless of table size. The candidate set joins back
    *     (broadcast — it is axis-bounded) to recover the per-point
    *     part count.
    *  2. staircase pass — sort candidates by (price asc, size desc) and
    *     drop every point whose size does not exceed the running max of
    *     the points before it (the preceding witness is no more
    *     expensive and no smaller — a dominator). The single-partition
    *     window that makes a naive global window a scale-killer is safe
    *     here because stage 1 bounded its input by the axis
    *     cardinality, independent of table size.
    *
    * Frontier points have unique prices (two frontier points sharing a
    * price would dominate one another), so ORDER BY price is total.
    * Output is distinct value pairs with the number of parts at each.
    */
  def paretoFrontier(s: SparkSession, dir: String): DataFrame = {
    val pts = Tables.part(s, dir)
      .groupBy(col("p_retailprice").as("price"), col("p_size").as("size"))
      .agg(count(lit(1)).as("n_parts"))
    val minp = pts.groupBy(col("size")).agg(min(col("price")).as("price"))
    val cand = pts.join(broadcast(minp), Seq("size", "price"))
    val w = Window
      .orderBy(col("price").asc, col("size").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    cand.withColumn("rmax", max(col("size")).over(w))
      .where(col("rmax").isNull || col("size") > col("rmax"))
      .select(col("price"), col("size"), col("n_parts"))
      .orderBy("price")
  }

  val paretoFrontierOracle: String =
    """WITH pts AS (
      | SELECT p_retailprice AS price, p_size AS size, count(*) AS n_parts
      | FROM part GROUP BY 1, 2)
      |SELECT price, size, n_parts FROM pts p
      |WHERE NOT EXISTS (
      | SELECT 1 FROM pts q
      | WHERE q.price <= p.price AND q.size >= p.size
      |   AND (q.price < p.price OR q.size > p.size))
      |ORDER BY price""".stripMargin

  /** Two-sample Kolmogorov–Smirnov statistic between the train and val
    * splits on document length: D = max_x |F_train(x) − F_val(x)|, with
    * the length at which the gap peaks. The NUMERIC drift gate beside
    * [[LexiconOps.splitDrift]]'s token-level one — a hash split should
    * give D near zero; a large D means the split function correlates
    * with document length (e.g. keyed on something length-biased).
    *
    * Cross-engine determinism: each x's CDF gap is computed from exact
    * integer cumulative counts by identical double divisions, so the
    * per-x doubles are BIT-identical on both engines and the argmax
    * ordering (gap desc, x asc) cannot diverge; only the reported
    * statistic is rounded.
    *
    * Scale: one keyed census on the value, then the CDF window runs
    * over the DISTINCT-VALUE grid — bounded by the value domain (a
    * length histogram), not the corpus, the same bounded-domain
    * argument as `range_count_sweep`; totals are a 1-row broadcast.
    */
  def splitKs(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(splitExpr(col("doc_id")).as("split"), col("n_chars"))
      .where(col("split").isin("train", "val"))
    val c = d.groupBy("n_chars").agg(
      sum(when(col("split") === "train", 1L).otherwise(0L)).as("ct"),
      sum(when(col("split") === "val", 1L).otherwise(0L)).as("cv"))
    val tot = c.agg(sum("ct").as("tt"), sum("cv").as("tv"))
    val w = Window.orderBy("n_chars")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c.withColumn("cum_t", sum(col("ct")).over(w))
      .withColumn("cum_v", sum(col("cv")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("n_chars"),
        abs(col("cum_t") / col("tt") - col("cum_v") / col("tv")).as("gap"),
        col("tt"), col("tv"))
      .orderBy(col("gap").desc, col("n_chars"))
      .limit(1)
      .select(roundTo(col("gap"), 6).as("ks_stat"),
        col("n_chars").as("at_value"),
        col("tt").as("n_train"), col("tv").as("n_val"))
  }

  val splitKsOracle: String =
    """WITH d AS (
      | SELECT CASE WHEN b < 52429 THEN 'train' ELSE 'val' END AS split, n_chars
      | FROM (
      |  SELECT CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
      |           AS INTEGER) AS BIGINT) AS b, n_chars
      |  FROM documents)
      | WHERE b < 58982),
      |c AS (
      | SELECT n_chars,
      |  CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS ct,
      |  CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS cv
      | FROM d GROUP BY n_chars),
      |t AS (SELECT CAST(sum(ct) AS BIGINT) AS tt, CAST(sum(cv) AS BIGINT) AS tv FROM c),
      |k AS (
      | SELECT n_chars,
      |  abs(CAST(SUM(ct) OVER (ORDER BY n_chars) AS BIGINT) / tt
      |    - CAST(SUM(cv) OVER (ORDER BY n_chars) AS BIGINT) / tv) AS gap,
      |  tt, tv
      | FROM c, t)
      |SELECT floor(gap * 1e6 + 0.5) / 1e6 AS ks_stat, n_chars AS at_value,
      | tt AS n_train, tv AS n_val
      |FROM k ORDER BY gap DESC, n_chars LIMIT 1""".stripMargin

  /** Token-budget epoch assembly — the selection shape every epoch
    * builder runs that [[mixSample]] (count targets, hash order) is
    * not: each source gets a TOKEN budget (35% of its token mass,
    * integer arithmetic so the boundary is exact), docs are taken in
    * QUALITY order (lexical diversity = distinct/total token ratio,
    * deterministic division, doc_id tie-break), and the selected set is
    * the maximal prefix whose cumulative tokens fit the budget. The
    * census reports budget / picked docs / picked tokens / the quality
    * cut line per source.
    *
    * Scale shape: tokenization is map-only (the shared `[a-z]+|[0-9]+`
    * kernel, parity-proven by the lexicon family); per-source totals
    * are one keyed aggregate; the prefix cut is ONE source-keyed window
    * (explicit ROWS frame — the (quality, doc_id) order is total, so
    * RANGE-peer ambiguity can't arise) — never a global sort. At 100 TB
    * the window's per-source populations are the corpus partition; a
    * hot source splits by the [[shuffleBlocks]] block trick if one
    * source dominates.
    */
  def epochTokenBudget(s: SparkSession, dir: String): DataFrame = {
    val toks = "[a-z]+|[0-9]+"
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        expr(s"regexp_extract_all(text, '$toks', 0)").as("arr"))
      .select(col("doc_id"), col("source"),
        size(col("arr")).cast("long").as("ntok"),
        (size(array_distinct(col("arr"))).cast("double") /
          size(col("arr")).cast("double")).as("qual"))
      .filter(col("ntok") >= 1)
    val budgets = d.groupBy(col("source"))
      .agg(sum(col("ntok")).as("tot"))
      .select(col("source"), expr("tot * 35 div 100").as("budget_tokens"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("qual").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.withColumn("cum", sum(col("ntok")).over(w))
      .join(broadcast(budgets), "source")
      .filter(col("cum") <= col("budget_tokens"))
      .groupBy(col("source"))
      .agg(max(col("budget_tokens")).as("budget_tokens"),
        count(lit(1)).as("n_sel"),
        sum(col("ntok")).as("tok_sel"),
        roundTo(min(col("qual")), 6).as("min_qual"))
      .orderBy("source")
  }

  val epochTokenBudgetOracle: String =
    """WITH d AS (
      | SELECT doc_id, source,
      |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS ntok,
      |  CAST(len(list_distinct(regexp_extract_all(text, '[a-z]+|[0-9]+')))
      |    AS DOUBLE)
      |   / CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS DOUBLE)
      |   AS qual
      | FROM documents),
      |d1 AS (SELECT * FROM d WHERE ntok >= 1),
      |b AS (SELECT source, CAST(sum(ntok) AS BIGINT) * 35 // 100
      |        AS budget_tokens
      |      FROM d1 GROUP BY 1),
      |c AS (SELECT d1.*, sum(ntok) OVER (PARTITION BY source
      |        ORDER BY qual DESC, doc_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |      FROM d1),
      |sel AS (SELECT c.*, budget_tokens FROM c JOIN b USING (source)
      |        WHERE cum <= budget_tokens)
      |SELECT source, CAST(max(budget_tokens) AS BIGINT) AS budget_tokens,
      | count(*) AS n_sel, CAST(sum(ntok) AS BIGINT) AS tok_sel,
      | floor(min(qual) * 1e6 + 0.5) / 1e6 AS min_qual
      |FROM sel GROUP BY 1 ORDER BY source""".stripMargin

  override def queries: Seq[RegisteredQuery] = Seq(
    RegisteredQuery("epoch_token_budget", epochTokenBudget,
      Some(epochTokenBudgetOracle)),
    RegisteredQuery("split_assign", splitAssign, Some(splitAssignOracle)),
    RegisteredQuery("pareto_frontier", paretoFrontier, Some(paretoFrontierOracle)),
    RegisteredQuery("split_ks", splitKs, Some(splitKsOracle)),
    RegisteredQuery("quota_rebalance", (s, d) => quotaRebalance(s, d), Some(quotaRebalanceOracle)),
    RegisteredQuery("shuffle_blocks", shuffleBlocks, Some(shuffleBlocksOracle)),
    RegisteredQuery("mix_sample", (s, d) => mixSample(s, d), Some(mixSampleOracle)),
    RegisteredQuery("t7_diversified_topk", diversifiedTopk, Some(diversifiedTopkOracle)),
  )
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The capstone composition: one declarative query that runs the whole
  * training-corpus cleaning pipeline — quality scoring, repetition
  * filtering, benchmark-contamination exclusion, and near-dup collapse
  * (keep the lower doc_id of each pair) — end to end. Every stage is an
  * already-oracle-checked operator; composing them stays one Catalyst
  * plan (shared scans, pushdown across the joins), which is exactly how a
  * 100 TB cleaning run would ship: one job, not four materialized passes.
  */
object CorpusOps extends QueryModule {

  private def stripOrderBy(sql: String): String = {
    val i = sql.lastIndexOf("ORDER BY")
    if (i < 0) sql else sql.substring(0, i).trim
  }

  /** The cleaned corpus WITHOUT presentation ordering — the composable
    * form [[corpusFilter]] and [[corpusToTraining]] both build on.
    */
  private[operators] def cleanedDocs(s: SparkSession, dir: String): DataFrame = {
    val stats = TextOps.textStats(s, dir)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("quality_score"))
    val rep = TextOps.textRepetition(s, dir)
      .select(col("doc_id"), col("max_run_len"))
    val contaminated = Dedup.contaminationCheck(s, dir)
      .select("doc_id").distinct()
    val dupLosers = Dedup.dedupNgramJaccard(s, dir)
      .select(col("doc_b").as("doc_id")).distinct()
    stats.join(rep, "doc_id")
      .join(contaminated.withColumn("is_cont", lit(true)), Seq("doc_id"), "left")
      .join(dupLosers.withColumn("is_dup", lit(true)), Seq("doc_id"), "left")
      .filter(
        col("quality_score") >= 0.55 && col("n_tokens") >= 20 &&
        col("max_run_len") <= 3 && col("is_cont").isNull && col("is_dup").isNull)
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("quality_score"), col("max_run_len"))
  }

  def corpusFilter(s: SparkSession, dir: String): DataFrame =
    cleanedDocs(s, dir).orderBy("doc_id")

  val corpusFilterOracle: String =
    s"""WITH stats AS (${stripOrderBy(TextOps.textStatsOracle)}),
       |rep AS (${stripOrderBy(TextOps.textRepetitionOracle)}),
       |cont AS (SELECT DISTINCT doc_id FROM (${stripOrderBy(Dedup.contaminationOracle)})),
       |dups AS (SELECT DISTINCT doc_b AS doc_id FROM (${stripOrderBy(Dedup.dedupNgramJaccardOracle)}))
       |SELECT s.doc_id, s.lang, s.n_tokens, s.quality_score, r.max_run_len
       |FROM stats s JOIN rep r USING (doc_id)
       |WHERE s.quality_score >= 0.55 AND s.n_tokens >= 20 AND r.max_run_len <= 3
       | AND s.doc_id NOT IN (SELECT doc_id FROM cont)
       | AND s.doc_id NOT IN (SELECT doc_id FROM dups)
       |ORDER BY s.doc_id""".stripMargin

  /** The FULL training-data chain as one declarative plan: clean (quality
    * + repetition + contamination + near-dup) → hash-split train/val/test
    * → deterministic md5 shuffle order within each split → offset-based
    * packing into 2048-token training packs. This is the query a user
    * actually ships to turn a raw crawl into training input; every stage
    * reuses an oracle-checked operator's exact dataflow, and the oracle
    * here is the same CTE composition.
    *
    * The rank + running-token-sum windows key on (split, BLOCK) — the
    * [[OrderingOps.shuffleBlocks]] pattern, not `partitionBy(split)`
    * alone: a 3-cardinality window key serializes ~90% of a 100 TB corpus
    * (the `train` split) through ONE task (VERDICT r8). The block id is
    * the first 2 hex chars of the md5 sort key, so block order is a
    * PREFIX of the sort order: block-local ranks/sums plus a broadcast
    * (split, block) cumulative-offset table reproduce the global window
    * EXACTLY — the oracle below stays the plain global-window SQL, and the
    * driver compare itself proves blocked == global. 3×256 offset rows is
    * index metadata at any corpus size (4 hex chars at 100 TB).
    *
    * Shuffle inventory: the cleaning joins (keyed on doc_id), then ONE
    * exchange on (split, block) shared by both windows; the offset table
    * is a bounded aggregate over the same materialized input. The cleaned
    * projection is materialized once (`localCheckpoint` — 5 narrow
    * columns) because both the layout branch and the offset branch
    * consume it; at 100 TB that materialization is the staged cleaned
    * table a pipeline writes anyway (and inferred-filter re-planning
    * defeats ReusedExchange here, same measurement as the blocked-dedup
    * path).
    */
  def corpusToTraining(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = 2048
    val keyed = cleanedDocs(s, dir)
      .withColumn("split", graft.operators.OrderingOps.splitExpr(col("doc_id")))
      .withColumn("skey", md5(col("doc_id").cast("string")))
      .withColumn("blk", conv(substring(col("skey"), 1, 2), 16, 10).cast("long"))
      .localCheckpoint()
    val wb = Window.partitionBy(col("split"), col("blk"))
      .orderBy(col("skey"), col("doc_id"))
    val cumOff = Window.partitionBy(col("split")).orderBy(col("blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy(col("split"), col("blk"))
      .agg(count(lit(1)).as("n"), sum(col("n_tokens")).as("tok"))
      .select(col("split"), col("blk"),
        coalesce(sum(col("n")).over(cumOff), lit(0L)).as("rk_off"),
        coalesce(sum(col("tok")).over(cumOff), lit(0L)).as("tok_off"))
    keyed
      .withColumn("lrk", row_number().over(wb).cast("long"))
      .withColumn("ltok", coalesce(sum(col("n_tokens"))
        .over(wb.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .join(broadcast(offsets), Seq("split", "blk"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("split"),
        (col("rk_off") + col("lrk")).as("rk"),
        floor((col("tok_off") + col("ltok")) / lit(budget.toDouble)).cast("long").as("pack_id"))
      .orderBy("doc_id")
  }

  val corpusToTrainingOracle: String =
    s"""WITH stats AS (${stripOrderBy(TextOps.textStatsOracle)}),
       |rep AS (${stripOrderBy(TextOps.textRepetitionOracle)}),
       |cont AS (SELECT DISTINCT doc_id FROM (${stripOrderBy(Dedup.contaminationOracle)})),
       |dups AS (SELECT DISTINCT doc_b AS doc_id FROM (${stripOrderBy(Dedup.dedupNgramJaccardOracle)})),
       |cleaned AS (
       | SELECT s.doc_id, s.lang, s.n_tokens,
       |  ${splitCaseSql("s.doc_id")} AS split
       | FROM stats s JOIN rep r USING (doc_id)
       | WHERE s.quality_score >= 0.55 AND s.n_tokens >= 20 AND r.max_run_len <= 3
       |  AND s.doc_id NOT IN (SELECT doc_id FROM cont)
       |  AND s.doc_id NOT IN (SELECT doc_id FROM dups))
       |SELECT doc_id, lang, n_tokens, split,
       | CAST(row_number() OVER win AS BIGINT) AS rk,
       | CAST(floor(coalesce(sum(n_tokens) OVER (PARTITION BY split
       |   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
       |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048.0) AS BIGINT) AS pack_id
       |FROM cleaned
       |WINDOW win AS (PARTITION BY split ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
       |ORDER BY doc_id""".stripMargin

  /** SEMANTIC dedup applied to the corpus — the embedding-space sibling of
    * [[corpusFilter]]'s lexical near-dup drop, and the end-to-end consumer
    * of the blocked cluster path: collapse each cosine-0.4 embedding
    * cluster ([[Similarity.embNearDupClustersBlocked]], exact by the
    * triangle bound) to its min-id survivor, keep every unclustered doc,
    * and emit the kept corpus with each survivor's collapse count (the
    * dedup-ratio accounting a cleaning run reports). `vec_id` IS a
    * `doc_id` — the fixtures embed a corpus prefix (all 500 docs at
    * sf≤0.01, the first 2000 of 5000 at sf0.1) — and docs without an
    * embedding pass through unclustered, so Σ n_collapsed over the kept
    * set always equals the corpus size (pinned at sf0.1 by
    * `Sf01ConsistencySpec`).
    *
    * Shuffle inventory: the cluster table is dup-graph-sized; its
    * survivorship join is keyed on doc_id and the size join on the
    * cluster root — both AQE-sized, no broadcast hint (at 100 TB the
    * clustered set can be a large corpus fraction). The oracle composes
    * the brute recursive-CTE clusters — legitimate BECAUSE blocked ==
    * brute is guaranteed, not sampled.
    */
  def corpusSemanticDedup(s: SparkSession, dir: String): DataFrame = {
    val clusters = Similarity.embNearDupClustersBlocked(s, dir)
      .select(col("vec_id").as("doc_id"), col("cluster_root"), col("is_survivor"))
    val sizes = clusters.groupBy("cluster_root").agg(count(lit(1)).as("n_collapsed"))
    TextOps.textStats(s, dir)
      .select(col("doc_id"), col("lang"), col("n_tokens"))
      .join(clusters, Seq("doc_id"), "left")
      .filter(col("cluster_root").isNull || col("is_survivor"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        coalesce(col("cluster_root"), col("doc_id")).as("cluster_root"))
      .join(sizes, Seq("cluster_root"), "left")
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("cluster_root"),
        coalesce(col("n_collapsed"), lit(1L)).as("n_collapsed"))
      .orderBy("doc_id")
  }

  val corpusSemanticDedupOracle: String =
    s"""WITH stats AS (SELECT doc_id, lang, n_tokens FROM (${stripOrderBy(TextOps.textStatsOracle)})),
       |clusters AS (SELECT vec_id, cluster_root FROM (${stripOrderBy(Similarity.embNearDupClustersOracle)})),
       |sizes AS (SELECT cluster_root, count(*) AS n_collapsed FROM clusters GROUP BY 1)
       |SELECT s.doc_id, s.lang, s.n_tokens,
       | coalesce(c.cluster_root, s.doc_id) AS cluster_root,
       | coalesce(z.n_collapsed, 1) AS n_collapsed
       |FROM stats s
       |LEFT JOIN clusters c ON c.vec_id = s.doc_id
       |LEFT JOIN sizes z ON z.cluster_root = c.cluster_root
       |WHERE c.vec_id IS NULL OR c.cluster_root = s.doc_id
       |ORDER BY s.doc_id""".stripMargin

  private def splitCaseSql(c: String): String =
    s"""CASE WHEN CAST('0x' || substr(md5(CAST($c AS VARCHAR)), 1, 4) AS INTEGER) < 52429 THEN 'train'
       |      WHEN CAST('0x' || substr(md5(CAST($c AS VARCHAR)), 1, 4) AS INTEGER) < 58982 THEN 'val'
       |      ELSE 'test' END""".stripMargin

  /** Train/eval LEAKAGE audit — the check a training pipeline must run
    * after splitting: near-duplicate pairs whose members land in
    * DIFFERENT splits (a test doc with a train-side near-twin inflates
    * eval). Composes the production dedup scale path
    * ([[Dedup.dedupMinhashLsh]], unblocked — cross-language twins leak
    * too) with the hash splitter ([[OrderingOps.splitExpr]]); both are
    * already oracle-gated, and so is the composition. The split label is
    * a map-only projection on each pair side — no join, no extra
    * shuffle beyond the dedup's own.
    */
  def splitLeakage(s: SparkSession, dir: String): DataFrame =
    Dedup.dedupMinhashLsh(s, dir)
      .withColumn("split_a", OrderingOps.splitExpr(col("doc_a")))
      .withColumn("split_b", OrderingOps.splitExpr(col("doc_b")))
      .filter(col("split_a") =!= col("split_b"))
      .orderBy("doc_a", "doc_b")

  val splitLeakageOracle: String =
    s"""WITH pairs AS (${stripOrderBy(Dedup.dedupMinhashLshOracle)}),
       |lab AS (
       | SELECT doc_a, doc_b, jaccard,
       |  ${splitCaseSql("doc_a")} AS split_a,
       |  ${splitCaseSql("doc_b")} AS split_b
       | FROM pairs)
       |SELECT doc_a, doc_b, jaccard, split_a, split_b FROM lab
       |WHERE split_a <> split_b ORDER BY doc_a, doc_b""".stripMargin

  override def queries: Seq[RegisteredQuery] = Seq(
    RegisteredQuery("corpus_filter", corpusFilter, Some(corpusFilterOracle)),
    RegisteredQuery("corpus_to_training", corpusToTraining, Some(corpusToTrainingOracle)),
    RegisteredQuery("corpus_semantic_dedup", corpusSemanticDedup, Some(corpusSemanticDedupOracle)),
    RegisteredQuery("split_leakage", splitLeakage, Some(splitLeakageOracle)),
  )
}

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

  def corpusFilter(s: SparkSession, dir: String): DataFrame = {
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
      .orderBy("doc_id")
  }

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

  override def queries: Seq[RegisteredQuery] = Seq(
    RegisteredQuery("corpus_filter", corpusFilter, Some(corpusFilterOracle)),
  )
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.engine.Tables

/** Deterministic sampling — the training-data subset selectors. Randomness
  * comes from ranking on `md5(key)`: uniform-ish, stable across engines,
  * runs, and cluster layouts (no RNG state, no seed plumbing), and
  * therefore fully oracle-checkable. At 100 TB the global variant is a
  * TakeOrderedAndProject (per-partition heap), the stratified variant one
  * shuffle on the stratum key.
  */
object SamplingOps extends QueryModule {

  /** Uniform deterministic sample: k rows with the smallest md5 rank. */
  def sampleUniform(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(md5(col("event_id").cast("string")), col("event_id"))
      .limit(200)
      .orderBy("event_id")

  val sampleUniformOracle: String =
    """SELECT event_id, user_id, event_type, value FROM (
      | SELECT event_id, user_id, event_type, value FROM events
      | ORDER BY md5(CAST(event_id AS VARCHAR)), event_id LIMIT 200)
      |ORDER BY event_id""".stripMargin

  /** Stratified deterministic sample: n-per-stratum by md5 rank within
    * each language (the balanced-corpus selector).
    */
  def sampleStratified(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("rk").cast("long").as("rk"))
      .orderBy("lang", "rk")
  }

  val sampleStratifiedOracle: String =
    """SELECT doc_id, lang, n_chars, rk FROM (
      | SELECT doc_id, lang, n_chars,
      |  CAST(row_number() OVER (PARTITION BY lang
      |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
      | FROM documents)
      |WHERE rk <= 10 ORDER BY lang, rk""".stripMargin

  override def queries: Seq[RegisteredQuery] = Seq(
    RegisteredQuery("sample_uniform", sampleUniform, Some(sampleUniformOracle)),
    RegisteredQuery("sample_stratified", sampleStratified, Some(sampleStratifiedOracle)),
  )
}

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

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES
    * exponential race): doc i survives with probability proportional to
    * weight w_i = n_chars^0.5 — the sub-linear length weighting a
    * temperature-based corpus mixer uses. Per-row key = ln(u)/w with
    * u = (md5_32(doc_id)+1)/2^32 deterministic in both engines; the
    * top-k by key IS the weighted sample (Efraimidis & Spirakis 2006,
    * "Weighted random sampling with a reservoir"). Only the rank is
    * emitted — a last-ulp ln() difference between libm implementations
    * cannot flip an ordering whose adjacent keys differ by >>1e-12.
    *
    * Scale: the key is a map-only projection fused into the scan and the
    * top-k plans as TakeOrderedAndProject — per-partition heaps of k,
    * one k x partitions gather, no full shuffle and no RNG/seed state.
    * The same plan at 100 TB is the standard one-pass distributed
    * weighted reservoir.
    */
  def sampleWeighted(s: SparkSession, dir: String, k: Int = 100): DataFrame = {
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("double") + lit(1.0)) / lit(4294967296.0)
    val key = log(u) / pow(col("n_chars").cast("double"), 0.5)
    val w = Window.orderBy(col("k").desc, col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .withColumn("k", key)
      .orderBy(col("k").desc, col("doc_id"))
      .limit(k)
      .withColumn("rk", row_number().over(w).cast("long"))
      .select("doc_id", "lang", "source", "n_chars", "rk")
      .orderBy("rk")
  }

  val sampleWeightedOracle: String =
    """WITH s AS (
      | SELECT doc_id, lang, source, n_chars,
      |  ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) + 1.0)
      |      / 4294967296.0)
      |    / pow(CAST(n_chars AS DOUBLE), 0.5) AS k
      | FROM documents)
      |SELECT doc_id, lang, source, n_chars,
      | CAST(row_number() OVER (ORDER BY k DESC, doc_id) AS BIGINT) AS rk
      |FROM s ORDER BY k DESC, doc_id LIMIT 100""".stripMargin

  override def queries: Seq[RegisteredQuery] = Seq(
    RegisteredQuery("sample_uniform", sampleUniform, Some(sampleUniformOracle)),
    RegisteredQuery("sample_stratified", sampleStratified, Some(sampleStratifiedOracle)),
    RegisteredQuery("sample_weighted", sampleWeighted(_, _), Some(sampleWeightedOracle)),
  )
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.engine.Tables
import graft.functions.Scalars._

/** Similarity search over the `embeddings` table (64-dim float vectors):
  * brute-force cosine top-k as the correctness baseline, threshold
  * near-dup pairs, and a random-hyperplane LSH variant as the scale path.
  *
  * All vector math is built-in higher-order functions (`zip_with` +
  * `aggregate`) over `array<double>` — codegen'd, no UDFs. Cosines are
  * computed with the same left-fold expression shape the DuckDB oracle
  * uses, then rounded to 6dp so both engines agree bit-for-bit.
  *
  * Scale notes: brute-force is O(|Q|·|C|) with the query set broadcast —
  * correct at any |C| when |Q| is small (the common "probe" shape). For
  * large |Q| the LSH variant buckets candidates by sign-pattern so the
  * join is keyed, not crossed; at 100 TB the candidate side would also be
  * pre-partitioned by bucket on write.
  */
object Similarity extends QueryModule {

  private val dim = 64

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** dot(a,b) as a left fold — matches the oracle's list_sum(list_transform). */
  private def dot(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")

  private def norm(a: String): Column =
    sqrt(expr(s"aggregate(zip_with($a, $a, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"))

  private def cosine(a: String, b: String): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Oracle-side cosine over 1-based DuckDB lists, same formula shape. */
  private def cosineSql(a: String, b: String): String = {
    def d(x: String, y: String) =
      s"list_sum(list_transform(range(1, ${dim + 1}), i -> $x[i] * $y[i]))"
    s"${d(a, b)} / (sqrt(${d(a, a)}) * sqrt(${d(b, b)}))"
  }

  /** Brute-force cosine top-k: 5 probe vectors against all candidates,
    * top-3 each. Rank on the ROUNDED score (both engines) so float
    * noise below 1e-6 can't flip the ordering between engines.
    */
  def simTopkBrute(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("qe"))
    val c = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"), asDouble(col("embedding")).as("ce"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("cand_id"))
    c.crossJoin(broadcast(q))
      .select(col("query_id"), col("cand_id"), roundTo(cosine("qe", "ce"), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .orderBy("query_id", "rank")
  }

  val simTopkOracle: String = {
    val cos = cosineSql("q.qe", "c.ce")
    s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 5),
       |c AS (SELECT vec_id AS cand_id, embedding::DOUBLE[] AS ce FROM embeddings WHERE vec_id >= 5),
       |scored AS (
       | SELECT query_id, cand_id, floor(($cos) * 1e6 + 0.5) / 1e6 AS cos_sim FROM q, c)
       |SELECT query_id, cand_id, cos_sim, rank FROM (
       | SELECT query_id, cand_id, cos_sim,
       |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS BIGINT) AS rank
       | FROM scored)
       |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  /** Embedding near-dup pairs: all pairs with cosine >= 0.4 (the fixture's
    * max off-diagonal cosine is ~0.51, so this emits only the strongly
    * aligned tail). Brute force both sides — the oracle-checkable baseline
    * for the LSH variant.
    */
  def embNearDupPairs(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val a = emb.select(col("vec_id").as("vec_a"), asDouble(col("embedding")).as("ea"))
    val b = emb.select(col("vec_id").as("vec_b"), asDouble(col("embedding")).as("eb"))
    a.crossJoin(b)
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), roundTo(cosine("ea", "eb"), 6).as("cos_sim"))
      .filter(col("cos_sim") >= 0.4)
      .orderBy("vec_a", "vec_b")
  }

  val embNearDupOracle: String = {
    val cos = cosineSql("a.ea", "b.eb")
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
       |SELECT vec_a, vec_b, cos_sim FROM (
       | SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, floor(($cos) * 1e6 + 0.5) / 1e6 AS cos_sim
       | FROM (SELECT vec_id, e AS ea FROM v) a, (SELECT vec_id, e AS eb FROM v) b
       | WHERE a.vec_id < b.vec_id)
       |WHERE cos_sim >= 0.4 ORDER BY vec_a, vec_b""".stripMargin
  }

  /** LSH top-k (scale path): 8 deterministic hyperplanes (weights derived
    * from xxhash64(plane, dim) — no RNG), sign-pattern bucket per vector,
    * candidates = same-bucket OR hamming-1 buckets (multiprobe), exact
    * cosine rerank of candidates only. Rows-only check; ScalaTest measures
    * recall against the brute-force baseline.
    */
  def simLshTopk(s: SparkSession, dir: String): DataFrame = {
    val planes = 8
    // weight(p, d) in [-1, 1): (xxhash64(p, d) % 1009) / 1009
    val bucketExpr =
      s"""aggregate(sequence(0, ${planes - 1}), CAST(0 AS INT), (acc, p) ->
         | acc + CASE WHEN aggregate(sequence(0, ${dim - 1}), CAST(0.0 AS DOUBLE),
         |   (s, d) -> s + e[d] * (CAST(xxhash64(p, d) % 1009 AS DOUBLE) / 1009.0)) > 0
         |  THEN shiftleft(1, p) ELSE 0 END)""".stripMargin
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("bucket", expr(bucketExpr))
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("bucket").as("qb"))
      // multiprobe: own bucket + all hamming-1 buckets
      .select(col("query_id"), col("qe"),
        explode(expr(
          s"array_union(array(qb), transform(sequence(0, ${planes - 1}), p -> CAST(qb ^ shiftleft(1, p) AS INT)))"))
          .as("bucket"))
    val c = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"), col("e").as("ce"), col("bucket"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("cand_id"))
    c.join(broadcast(q), Seq("bucket"))
      .select(col("query_id"), col("cand_id"), roundTo(cosine("qe", "ce"), 6).as("cos_sim"))
      .groupBy("query_id", "cand_id").agg(first("cos_sim").as("cos_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .orderBy("query_id", "rank")
  }

  override def queries: Seq[RegisteredQuery] = Seq(
    RegisteredQuery("sim_topk_brute", simTopkBrute, Some(simTopkOracle)),
    RegisteredQuery("emb_neardup_pairs", embNearDupPairs, Some(embNearDupOracle)),
    RegisteredQuery("sim_lsh_topk", simLshTopk, None),
  )
}

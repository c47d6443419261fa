package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.engine.Tables
import graft.functions.Scalars._
import graft.functions.VectorFunctions

/** Similarity search over the `embeddings` table (64-dim float vectors):
  * brute-force cosine top-k as the correctness baseline, threshold
  * near-dup pairs, and a random-hyperplane LSH variant as the scale path.
  *
  * The inner product runs as a custom codegen'd Catalyst expression
  * ([[graft.functions.DotProduct]]) — Spark's higher-order functions are
  * interpreted per element, which dominates O(n²) scans. Vectors are
  * L2-normalized once per row so each pair costs exactly one dot product;
  * the 1e-15-level difference vs the oracle's dot/(|a||b|) formulation is
  * absorbed by 6dp rounding (binary-exact on both engines, see
  * Scalars.roundTo).
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

  private def dot(a: String, b: String): Column = expr(VectorFunctions.dotExpr(a, b))

  /** embeddings with unit-norm double vectors (one normalization pass).
    * The `repartition` is a deliberate materialization barrier: without an
    * exchange, CollapseProject can inline the `transform` (and the norm
    * computation inside it) into every downstream element access, turning
    * one normalization per row into one per USE — an interpreted-HOF
    * blowup measured at 40x. 2k rows → the shuffle is free.
    */
  private def normalized(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    Tables.embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("raw"))
      .withColumn("nrm", sqrt(dot("raw", "raw")))
      .select(col("vec_id"), expr("transform(raw, x -> x / nrm)").as("e"))
      .repartition(col("vec_id"))
  }

  /** Oracle-side cosine over 1-based DuckDB lists (dot/(|a||b|) form). */
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
    val emb = normalized(s, dir)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("e").as("qe"))
    val c = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"), col("e").as("ce"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("cand_id"))
    c.crossJoin(broadcast(q))
      .select(col("query_id"), col("cand_id"), roundTo(dot("qe", "ce"), 6).as("cos_sim"))
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
    val emb = normalized(s, dir)
    val a = emb.select(col("vec_id").as("vec_a"), col("e").as("ea"))
    val b = emb.select(col("vec_id").as("vec_b"), col("e").as("eb"))
    a.crossJoin(b)
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), roundTo(dot("ea", "eb"), 6).as("cos_sim"))
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

  /** Deterministic hyperplane weights (SplitMix64, fixed seed — no RNG
    * state), materialized as literal arrays so the projections are plain
    * codegen'd dot products.
    */
  private def splitmix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val planes = 8

  private def planeLit(p: Int): Column = array(
    (0 until dim).map { d =>
      // uniform in [-0.5, 0.5): enough for a sign test
      lit((splitmix(p.toLong * dim + d) % 1009L).toDouble / 2018.0)
    }: _*)

  /** LSH top-k (scale path): 8 deterministic hyperplanes, sign-pattern
    * bucket per vector, candidates = same-bucket OR hamming-1 buckets
    * (multiprobe), exact cosine rerank of candidates only. The bucket is
    * computed on the RAW vector (sign of a projection is invariant to
    * positive scaling), keeping the bucket expression off the normalized-
    * transform column (see CollapseProject note on [[normalized]]).
    * Rows-only check; ScalaTest measures recall against brute force.
    */
  def simLshTopk(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    val signBits = (0 until planes)
      .map(p => when(expr(VectorFunctions.dotExpr("raw", s"__plane$p")) > 0, lit(1 << p)).otherwise(lit(0)))
      .reduce(_ + _)
    val bucketed = Tables.embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("raw"))
      .select(
        Seq(col("vec_id"), col("raw")) ++ (0 until planes).map(p => planeLit(p).as(s"__plane$p")): _*)
      .select(col("vec_id"), signBits.as("bucket"))
      .join(normalized(s, dir), "vec_id")
    // multiprobe masks: all 0-, 1- and 2-bit flips of the query bucket
    // (37 of 256 buckets — ~14% of candidates, computed once in Scala)
    val masks: Seq[Int] = 0 +:
      ((0 until planes).map(1 << _) ++
        (for (p <- 0 until planes; r <- p + 1 until planes) yield (1 << p) | (1 << r)))
    val maskArr = array(masks.map(lit): _*)
    val q = bucketed.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("bucket").as("qb"))
      .withColumn("__masks", maskArr)
      .select(col("query_id"), col("qe"),
        explode(expr("transform(__masks, m -> CAST(qb ^ m AS INT))")).as("bucket"))
    val c = bucketed.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"), col("e").as("ce"), col("bucket"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("cand_id"))
    c.join(broadcast(q), Seq("bucket"))
      .select(col("query_id"), col("cand_id"), roundTo(dot("qe", "ce"), 6).as("cos_sim"))
      .groupBy("query_id", "cand_id").agg(first("cos_sim").as("cos_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .orderBy("query_id", "rank")
  }

  /** IVF top-k (the other scale path): coarse-quantize candidates into
    * k-means cells (MLlib KMeans, fixed seed), probe the `nprobe` nearest
    * cells per query, exact cosine rerank inside the probed cells only.
    * At 100 TB the candidate side is written partitioned by cell id, so a
    * probe touches nprobe/k of the data. Centroid table is 16 rows —
    * driver-side math on it is the index metadata, not data. Rows-only
    * (k-means-specific); ScalaTest measures recall vs brute force.
    */
  def simIvfTopk(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    VectorFunctions.register(s)
    val k = 16
    val nprobe = 4
    // no .cache(): the input is candidate-count rows and KMeans manages its
    // own iteration caching; a leaked cache entry per invocation degrades
    // every later query in the session via GC pressure
    val emb = normalized(s, dir).withColumn("fv", array_to_vector(col("e")))
    val fitted = new KMeans().setK(k).setSeed(42L).setMaxIter(8)
      .setInitMode("random") // kmeans|| runs extra passes; random is plenty for coarse cells
      .setFeaturesCol("fv").setPredictionCol("cell")
      .fit(emb)
    val assigned = fitted.transform(emb).select(col("vec_id"), col("e"), col("cell"))

    // centroid directions as a tiny literal table: (cell, centroid array)
    val centers = fitted.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.toSeq)
    }
    import s.implicits._
    val centDf = centers.toSeq.toDF("cell", "centroid")
      .select(col("cell"), col("centroid").cast("array<double>").as("centroid"))

    // probe list: nprobe nearest centroids per query (16 x 5 rows — tiny)
    val q = assigned.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("e").as("qe"))
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("cdist").desc, col("cell"))
    val probes = q.crossJoin(broadcast(centDf))
      .select(col("query_id"), col("qe"), col("cell"),
        expr(VectorFunctions.dotExpr("qe", "centroid")).as("cdist"))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("qe"), col("cell"))

    val c = assigned.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"), col("e").as("ce"), col("cell"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("cand_id"))
    c.join(broadcast(probes), Seq("cell"))
      .select(col("query_id"), col("cand_id"), roundTo(dot("qe", "ce"), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .orderBy("query_id", "rank")
  }

  override def queries: Seq[RegisteredQuery] = Seq(
    RegisteredQuery("sim_topk_brute", simTopkBrute, Some(simTopkOracle)),
    RegisteredQuery("emb_neardup_pairs", embNearDupPairs, Some(embNearDupOracle)),
    RegisteredQuery("sim_lsh_topk", simLshTopk, None),
    RegisteredQuery("sim_ivf_topk", simIvfTopk, None),
  )
}

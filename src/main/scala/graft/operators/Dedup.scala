package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.Scalars._

/** Deduplication operators over the `documents` table: exact (hash groupBy),
  * n-gram-Jaccard brute force (the correctness baseline), MinHash+LSH (the
  * scale path: shingle → signature → band → bucket-join), and SimHash with
  * banded candidate generation.
  *
  * Scale notes: brute-force pairwise is O(n²) and exists as the oracle-
  * checkable baseline; at 100 TB only the LSH paths run — their shuffles are
  * keyed on (band_id, band_hash), so candidate generation is one exchange of
  * (docs × bands) small rows rather than a cross join, and verification
  * touches only bucket-colliding pairs.
  */
object Dedup extends QueryModule {

  private val jaccardThreshold = 0.4

  /** Tokenized docs with distinct 3-token shingle sets. Guarded for <3
    * tokens (Spark's `sequence(0, n)` turns descending for n<0).
    */
  private def shingled(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), col("lang"),
        when(size(col("t")) >= 3,
          array_distinct(expr(
            "transform(sequence(0, size(t)-3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))")))
          .otherwise(array_distinct(array(concat_ws(" ", col("t").getItem(0)))))
          .as("s"))

  private val shingledSql: String =
    """SELECT doc_id, lang,
      | CASE WHEN len(t) >= 3 THEN
      |  list_distinct(list_transform(range(1, len(t)-1), i -> array_to_string(list_slice(t, i, i+2), ' ')))
      | ELSE list_distinct([array_to_string(t, ' ')]) END AS s
      |FROM (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents)""".stripMargin

  /** Exact dedup by content (hash groupBy). The fixture corpus has no
    * duplicates, so a replicated slice (every 5th doc re-keyed) is unioned
    * in first; survivors keep the minimum key, reference-style
    * first-write-wins (src/database.py:169-184 upsert semantics inverted
    * to keep-oldest).
    */
  def dedupExact(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val dupes = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    docs.unionByName(dupes)
      .groupBy("text")
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies")
      .orderBy("doc_id")
  }

  val dedupExactOracle: String =
    """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
      |FROM (SELECT doc_id, text FROM documents
      |      UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id % 5 = 0)
      |GROUP BY text ORDER BY doc_id""".stripMargin

  /** Near-dup pairs by exact 3-gram-shingle Jaccard, brute force within
    * language. The `min/max >= t` size prefilter is implied by
    * `J(A,B) <= min|A|,|B| / max|A|,|B|`, so it prunes without changing
    * results — both engines apply it identically.
    */
  def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val sh = shingled(s, dir)
    val a = sh.select(col("lang"), col("doc_id").as("doc_a"), col("s").as("sa"), size(col("s")).as("na"))
    val b = sh.select(col("lang"), col("doc_id").as("doc_b"), col("s").as("sb"), size(col("s")).as("nb"))
    a.join(b, Seq("lang"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(least(col("na"), col("nb")).cast("double") / greatest(col("na"), col("nb")) >= jaccardThreshold)
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard", col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("doc_a"), col("doc_b"), roundTo(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  val dedupNgramJaccardOracle: String =
    s"""WITH sh AS ($shingledSql)
       |SELECT doc_a, doc_b, floor(jaccard * 1e4 + 0.5) / 1e4 AS jaccard FROM (
       | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  len(list_intersect(a.s, b.s))::DOUBLE
       |    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
       | FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
       | WHERE least(len(a.s), len(b.s))::DOUBLE / greatest(len(a.s), len(b.s)) >= $jaccardThreshold)
       |WHERE jaccard >= $jaccardThreshold ORDER BY doc_a, doc_b""".stripMargin

  /** MinHash signatures (32 hashes = xxhash64 seeded by position) banded
    * 8×4; bucket-colliding pairs are verified with exact shingle Jaccard,
    * so output rows are exact — LSH only decides which pairs get checked.
    * This is the 100 TB path: shuffle keyed by (band_id, band_hash),
    * never a cross join. No SQL oracle (xxhash64-specific); the ScalaTest
    * suite checks it against the brute-force baseline.
    */
  def dedupMinhashLsh(s: SparkSession, dir: String): DataFrame = {
    val numHashes = 32
    val bands = 8
    val rows = 4
    val sh = shingled(s, dir)
    val sig = sh.select(col("doc_id"), col("s"),
      expr(s"transform(sequence(0, ${numHashes - 1}), i -> array_min(transform(s, x -> xxhash64(x, i))))")
        .as("sig"))
    val banded = sig.select(col("doc_id"),
        explode(expr(
          s"transform(sequence(0, ${bands - 1}), b -> struct(b AS band_id, xxhash64(slice(sig, b*$rows+1, $rows), b) AS band_hash))"))
          .as("band"))
      .select(col("doc_id"), col("band.band_id"), col("band.band_hash"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band_id") === col("y.band_id") && col("x.band_hash") === col("y.band_hash")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val sa = sh.select(col("doc_id").as("doc_a"), col("s").as("sa"))
    val sb = sh.select(col("doc_id").as("doc_b"), col("s").as("sb"))
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard",
        col("inter").cast("double") / (size(col("sa")) + size(col("sb")) - col("inter")))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("doc_a"), col("doc_b"), roundTo(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash: 64-bit signature from per-token xxhash64 majority vote,
    * frequency-weighted (every occurrence votes — canonical simhash, which
    * keeps vote margins wide so near-identical docs land within a few
    * bits). Candidate pairs via 4×16-bit band equality — by pigeonhole
    * this is EXHAUSTIVE for hamming distance <= 3 (4 bands can't all
    * differ), the emitted threshold. Rows-only check (hash-specific);
    * ScalaTest cross-checks against the Jaccard near-dup pairs.
    */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    val hammingMax = 3
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"),
        expr("transform(t, x -> xxhash64(x))").as("hs"))
      .select(col("doc_id"),
        expr(
          """aggregate(sequence(0, 63), CAST(0 AS BIGINT), (acc, b) ->
            | acc + CASE WHEN 2 * size(filter(hs, h -> (shiftright(h, b) & 1) = 1)) >= size(hs)
            |  THEN shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END)""".stripMargin)
          .as("simhash"))
    val banded = docs.select(col("doc_id"), col("simhash"),
        explode(expr(
          "transform(sequence(0, 3), b -> struct(b AS band_id, shiftright(simhash, b*16) & 65535 AS band_val))"))
          .as("band"))
      .select(col("doc_id"), col("simhash"), col("band.band_id"), col("band.band_val"))
    banded.as("x").join(banded.as("y"),
        col("x.band_id") === col("y.band_id") && col("x.band_val") === col("y.band_val")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= hammingMax)
      .orderBy("doc_a", "doc_b")
  }

  override def queries: Seq[RegisteredQuery] = Seq(
    RegisteredQuery("dedup_exact", dedupExact, Some(dedupExactOracle)),
    RegisteredQuery("dedup_ngram_jaccard", dedupNgramJaccard, Some(dedupNgramJaccardOracle)),
    RegisteredQuery("dedup_minhash_lsh", dedupMinhashLsh, None),
    RegisteredQuery("dedup_simhash", dedupSimhash, None),
  )
}

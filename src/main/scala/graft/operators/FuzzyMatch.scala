package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Approximate string-match join — entity resolution over dirty text keys
  * (vendor names, titles, near-identical metadata), the string-side twin of
  * the embedding near-dup family. The reference resolves entities by exact
  * key only (its joins are all equi-joins on ids); a training-data pipeline
  * at 100 TB needs the fuzzy version: find every pair of strings within
  * edit distance K without the O(n²) all-pairs comparison.
  *
  * Plan shape (ED-Join-style prefix filtering, public literature):
  *  1. occurrence-keyed q-grams — each string's gram MULTISET becomes a
  *     set by suffixing the occurrence index ("ol#2" = second "ol"), so a
  *     plain set-equality join computes multiset intersection;
  *  2. an edit operation destroys at most q grams, so two strings within
  *     distance K share all but q·K grams. Order every string's grams by
  *     global rarity (document frequency, then gram — a total order both
  *     deterministic and skew-avoiding): two qualifying strings MUST share
  *     at least one gram among each one's (q·K+1) RAREST — the prefix.
  *     Posting-list self-join on prefix grams only → candidate fanout is
  *     bounded by prefixLen × df(rare gram), not by hot-gram frequency;
  *  3. length band |len_a − len_b| ≤ K (a necessary condition — each edit
  *     changes length by ≤ 1), then EXACT `levenshtein` with the built-in
  *     early-exit threshold verifies candidates. Exactness comes from the
  *     verify; the filters only need to be lossless, which the pigeonhole
  *     argument guarantees for strings with more than q·K grams.
  *  4. strings too short for the bound (≤ q·K grams, i.e. len ≤ q·K+1 —
  *     the count filter degenerates to ≥0 there) route through a residual
  *     path: short × (len ≤ short+K) broadcast join. Both sides are
  *     alphabet-bounded sets of ≤ (q·K+1+K)-char strings at ANY corpus
  *     size, so the residual never becomes the bottleneck.
  *
  * Output == the brute-force all-pairs answer (the DuckDB oracle IS the
  * brute force), achieved with two keyed shuffles + one bounded broadcast.
  */
object FuzzyMatch extends QueryModule {

  /** Gram width (q-grams). */
  val Q = 2

  /** Edit-distance threshold for the registered query. */
  val K = 2

  /** Prefix length q·K+1 — the pigeonhole bound's witness count. */
  val prefixLen: Int = Q * K + 1

  /** Strings with ≤ q·K grams defeat the count bound → residual path. */
  private val shortLen = Q * K + 1
  private val bandLen  = shortLen + K

  /** Fuzzy self-join of all distinct part names at edit distance ≤ [[K]].
    * Emits every unordered pair once (name_a < name_b) with its exact
    * distance. Reference has no fuzzy matching (exact-key joins only,
    * src/database.py); this is north-star pipeline surface.
    */
  def fuzzyMatchNames(s: SparkSession, dir: String): DataFrame = {
    val names = Tables.part(s, dir)
      .select(col("p_name").as("name")).distinct()
      .withColumn("len", length(col("name")))

    // 1. occurrence-keyed grams for every bound-eligible string
    val grams = gramsOf(names)

    // 2. global rarity order → per-string (q·K+1)-gram prefix
    val gramDf = grams.groupBy("gram").agg(count(lit(1)).as("df"))
    val prefix = prefixOf(grams, gramDf)

    // 3. posting-list self-join on prefix grams, length band
    val candLong = prefix.as("a").join(prefix.as("b"),
        col("a.gram") === col("b.gram") && col("a.name") < col("b.name"))
      .filter(abs(col("a.len") - col("b.len")) <= K)
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
      .distinct()

    // 4. residual: short strings × their alphabet-bounded partner band.
    //    least/greatest canonicalization because a short string's partner
    //    may sort below it while living only on the band side.
    val shorts = names.filter(col("len") <= shortLen)
    val band   = names.filter(col("len") <= bandLen)
    val candShort = shorts.as("a").join(broadcast(band.as("b")),
        col("a.name") =!= col("b.name") &&
          abs(col("a.len") - col("b.len")) <= K)
      .select(least(col("a.name"), col("b.name")).as("name_a"),
        greatest(col("a.name"), col("b.name")).as("name_b"))
      .distinct()

    candLong.unionByName(candShort)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), K).cast("long"))
      .filter(col("dist") >= 0)
      .orderBy("name_a", "name_b")
  }

  /** Oracle = the brute force the plan must equal: all-pairs levenshtein
    * over the distinct names (64 at the fixture; the Spark side never
    * materializes this quadratic).
    */
  val fuzzyMatchOracle: String =
    s"""WITH n AS (SELECT DISTINCT p_name AS name FROM part)
       |SELECT a.name AS name_a, b.name AS name_b,
       | CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
       |FROM n a JOIN n b ON a.name < b.name
       |WHERE levenshtein(a.name, b.name) <= $K
       |ORDER BY name_a, name_b""".stripMargin

  /** Occurrence-keyed grams of a `(name, len)` frame — shared by both
    * sides of the asymmetric lookup so gram keys agree by construction.
    */
  private def gramsOf(df: DataFrame): DataFrame =
    df.filter(col("len") > lit(shortLen))
      .select(col("name"), col("len"),
        posexplode(expr(
          s"transform(sequence(1, len - ${Q - 1}), i -> substring(name, i, $Q))"))
          .as(Seq("pos", "g")))
      .withColumn("occ",
        row_number().over(Window.partitionBy("name", "g").orderBy("pos")))
      .select(col("name"), col("len"),
        concat_ws("#", col("g"), col("occ")).as("gram"))

  /** The (q·K+1)-gram prefix of each string under a SHARED global rarity
    * order — asymmetric lookup needs both sides ordered by the same df
    * table or the pigeonhole witness can land outside one side's prefix.
    */
  private def prefixOf(grams: DataFrame, sharedDf: DataFrame): DataFrame =
    grams.join(sharedDf, "gram")
      .withColumn("rk", row_number().over(
        Window.partitionBy("name").orderBy(col("df"), col("gram"))))
      .filter(col("rk") <= prefixLen)
      .select(col("gram"), col("name"), col("len"))

  /** Query-time fuzzy LOOKUP — the asymmetric topology: a small probe
    * batch (typo'd keys: every distinct name with its first character
    * dropped, a deterministic transform the oracle replays) against the
    * full name corpus, every (probe, name) pair within distance ≤ [[K]].
    * Unlike [[fuzzyMatchNames]]'s self-join, cost here scales with the
    * PROBE side: corpus grams build once, the probe postings drive the
    * join — the dedup-vs-lookup split mirrors `dedup_incremental` vs
    * `contamination_check` in the shingle family. Residual paths cover
    * the short strings on EITHER side (both alphabet-bounded broadcasts).
    */
  def fuzzyLookupProbes(s: SparkSession, dir: String): DataFrame = {
    val names = Tables.part(s, dir)
      .select(col("p_name").as("name")).distinct()
      .withColumn("len", length(col("name")))
    val probes = names.select(expr("substring(name, 2)").as("name"))
      .distinct()
      .withColumn("len", length(col("name")))

    val nameGrams  = gramsOf(names)
    val probeGrams = gramsOf(probes)
    // shared rarity order over the union so both prefixes agree
    val sharedDf = nameGrams.select("gram").unionAll(probeGrams.select("gram"))
      .groupBy("gram").agg(count(lit(1)).as("df"))
    val namePrefix  = prefixOf(nameGrams, sharedDf)
    val probePrefix = prefixOf(probeGrams, sharedDf)

    val candLong = probePrefix.as("p").join(namePrefix.as("n"),
        col("p.gram") === col("n.gram"))
      .filter(abs(col("p.len") - col("n.len")) <= K)
      .select(col("p.name").as("probe"), col("n.name").as("name"))
      .distinct()

    // residual: a short string on EITHER side voids the gram bound for
    // the pair → short × length-band cross join, both sides bounded
    def residual(shortSide: DataFrame, bandSide: DataFrame,
        flip: Boolean): DataFrame = {
      val j = shortSide.filter(col("len") <= shortLen).as("a")
        .join(broadcast(bandSide.filter(col("len") <= bandLen).as("b")),
          abs(col("a.len") - col("b.len")) <= K)
      if (flip) j.select(col("b.name").as("probe"), col("a.name").as("name"))
      else j.select(col("a.name").as("probe"), col("b.name").as("name"))
    }
    val candShort = residual(probes, names, flip = false)
      .unionAll(residual(names, probes, flip = true))
      .distinct()

    candLong.unionByName(candShort)
      .withColumn("dist", levenshtein(col("probe"), col("name"), K).cast("long"))
      .filter(col("dist") >= 0)
      .orderBy("probe", "name")
  }

  val fuzzyLookupOracle: String =
    s"""WITH n AS (SELECT DISTINCT p_name AS name FROM part),
       |p AS (SELECT DISTINCT substr(name, 2) AS probe FROM n)
       |SELECT p.probe, n.name, CAST(levenshtein(p.probe, n.name) AS BIGINT) AS dist
       |FROM p JOIN n ON levenshtein(p.probe, n.name) <= $K
       |ORDER BY probe, name""".stripMargin

  override def queries: Seq[RegisteredQuery] = Seq(
    RegisteredQuery("fuzzy_match_names", fuzzyMatchNames, Some(fuzzyMatchOracle)),
    RegisteredQuery("fuzzy_lookup_probes", fuzzyLookupProbes, Some(fuzzyLookupOracle)),
  )
}

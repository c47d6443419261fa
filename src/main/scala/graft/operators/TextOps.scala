package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.Scalars._

/** Text-analysis operators for a training-data pipeline: token/char stats,
  * quality scoring, language-ID heuristics, regex (BPE-ish) token counting,
  * and content fingerprinting — all pure built-in expression trees (no UDFs)
  * so they stay inside whole-stage codegen and scale linearly with no
  * shuffle at all (narrow, per-row transforms over the documents scan).
  */
object TextOps extends QueryModule {

  private[operators] val stopwords = Seq("the", "a", "and", "of", "to", "in")
  private[operators] val stopList  = stopwords.map(w => s"'$w'").mkString(", ")

  /** Per-document statistics + composite quality score (length, lexical
    * diversity, stopword load). The score formula is plain double
    * arithmetic replicated verbatim in the oracle.
    */
  def textStats(s: SparkSession, dir: String): DataFrame =
    textStatsOf(Tables.documents(s, dir)).orderBy("doc_id")

  /** [[textStats]] as a DataFrame→DataFrame transform — a pure narrow
    * projection with NO presentation sort, so it runs unchanged over
    * `readStream` sources (the streaming corpus-cleaning path; see
    * StreamingSpec — sorting is the one thing streaming forbids here).
    */
  def textStatsOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("t"), col("text"))
      .select(
        col("doc_id"), col("lang"),
        size(col("t")).cast("long").as("n_tokens"),
        (length(translate(col("text"), " ", "")).cast("double") / size(col("t"))).as("raw_tok_len"),
        (size(filter(col("t"), x => x.isin(stopwords: _*))).cast("double") / size(col("t"))).as("raw_stop"),
        (size(array_distinct(col("t"))).cast("double") / size(col("t"))).as("raw_uniq"))
      .select(
        col("doc_id"), col("lang"), col("n_tokens"),
        roundTo(col("raw_tok_len"), 2).as("avg_token_len"),
        roundTo(col("raw_stop"), 3).as("stopword_ratio"),
        roundTo(col("raw_uniq"), 3).as("uniq_ratio"),
        roundTo(
          lit(0.5) * least(col("n_tokens") / lit(100.0), lit(1.0)) +
          lit(0.3) * col("raw_uniq") +
          lit(0.2) * (lit(1.0) - col("raw_stop")), 3).as("quality_score"))

  /** The composite quality-score formula as a DuckDB SQL fragment over a
    * relation exposing (n_tokens, raw_uniq, raw_stop) — ONE definition
    * shared by every oracle that scores documents ([[textStatsOracle]],
    * `Dedup.dedupQualitySurvivorOracle`), so the formula can't silently
    * diverge between them. Mirrors [[textStatsOf]]'s arithmetic verbatim.
    */
  private[operators] val qualityScoreSql: String =
    """floor((0.5::DOUBLE * least(n_tokens / 100.0::DOUBLE, 1.0::DOUBLE)
      |   + 0.3::DOUBLE * raw_uniq + 0.2::DOUBLE * (1.0::DOUBLE - raw_stop)) * 1e3 + 0.5) / 1e3""".stripMargin

  val textStatsOracle: String =
    s"""SELECT doc_id, lang, n_tokens,
       | floor(raw_tok_len * 1e2 + 0.5) / 1e2 AS avg_token_len,
       | floor(raw_stop * 1e3 + 0.5) / 1e3 AS stopword_ratio,
       | floor(raw_uniq * 1e3 + 0.5) / 1e3 AS uniq_ratio,
       | $qualityScoreSql AS quality_score
       |FROM (
       | SELECT doc_id, lang, len(t) AS n_tokens,
       |  length(replace(text, ' ', ''))::DOUBLE / len(t) AS raw_tok_len,
       |  len(list_filter(t, x -> x IN ($stopList)))::DOUBLE / len(t) AS raw_stop,
       |  len(list_distinct(t))::DOUBLE / len(t) AS raw_uniq
       | FROM (SELECT doc_id, lang, text, string_split(text, ' ') AS t FROM documents))
       |ORDER BY doc_id""".stripMargin

  /** Language-ID heuristic: marker-token hit counts per language, argmax
    * with a fixed priority order. (On the synthetic fixtures the text is
    * drawn from one vocabulary, so this mostly predicts 'en' — the
    * operator's semantics, not its fixture accuracy, are under test; the
    * provided `lang` column rides along for the agreement flag.)
    */
  def textLangId(s: SparkSession, dir: String): DataFrame = {
    val markers = Map(
      "en" -> Seq("the", "a", "data", "query"),
      "es" -> Seq("el", "la", "los", "datos"),
      "de" -> Seq("der", "die", "und", "daten"),
      "fr" -> Seq("le", "la", "les", "et"))
    val t = split(col("text"), " ")
    def hits(lang: String) =
      size(array_intersect(t, array(markers(lang).map(lit): _*)))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        hits("en").as("en_hits"), hits("es").as("es_hits"),
        hits("de").as("de_hits"), hits("fr").as("fr_hits"))
      .select(col("doc_id"), col("lang"),
        when(col("en_hits") >= greatest(col("es_hits"), col("de_hits"), col("fr_hits"))
              && col("en_hits") > 0, "en")
          .when(col("es_hits") >= greatest(col("de_hits"), col("fr_hits")) && col("es_hits") > 0, "es")
          .when(col("de_hits") >= col("fr_hits") && col("de_hits") > 0, "de")
          .when(col("fr_hits") > 0, "fr")
          .otherwise("und").as("predicted_lang"))
      .withColumn("is_match", col("predicted_lang") === col("lang"))
      .orderBy("doc_id")
  }

  val textLangIdOracle: String =
    """SELECT doc_id, lang,
      | CASE
      |  WHEN en_hits >= greatest(es_hits, de_hits, fr_hits) AND en_hits > 0 THEN 'en'
      |  WHEN es_hits >= greatest(de_hits, fr_hits) AND es_hits > 0 THEN 'es'
      |  WHEN de_hits >= fr_hits AND de_hits > 0 THEN 'de'
      |  WHEN fr_hits > 0 THEN 'fr'
      |  ELSE 'und' END AS predicted_lang,
      | (CASE
      |  WHEN en_hits >= greatest(es_hits, de_hits, fr_hits) AND en_hits > 0 THEN 'en'
      |  WHEN es_hits >= greatest(de_hits, fr_hits) AND es_hits > 0 THEN 'es'
      |  WHEN de_hits >= fr_hits AND de_hits > 0 THEN 'de'
      |  WHEN fr_hits > 0 THEN 'fr'
      |  ELSE 'und' END) = lang AS is_match
      |FROM (
      | SELECT doc_id, lang,
      |  len(list_intersect(t, ['the','a','data','query'])) AS en_hits,
      |  len(list_intersect(t, ['el','la','los','datos'])) AS es_hits,
      |  len(list_intersect(t, ['der','die','und','daten'])) AS de_hits,
      |  len(list_intersect(t, ['le','la','les','et'])) AS fr_hits
      | FROM (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents))
      |ORDER BY doc_id""".stripMargin

  /** BPE-ish regex token counting (word/number/other classes) + type-token
    * ratio — the tokenizer-cost estimator of a training-data pipeline.
    */
  def textTokenCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)").as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_bpe_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct_tokens"))
      .withColumn("type_token_ratio",
        roundTo(col("n_distinct_tokens").cast("double") / col("n_bpe_tokens"), 3))
      .orderBy("doc_id")

  val textTokenCountOracle: String =
    """SELECT doc_id, n_bpe_tokens, n_distinct_tokens,
      | floor((n_distinct_tokens::DOUBLE / n_bpe_tokens) * 1e3 + 0.5) / 1e3 AS type_token_ratio
      |FROM (
      | SELECT doc_id, len(toks) AS n_bpe_tokens, len(list_distinct(toks)) AS n_distinct_tokens
      | FROM (SELECT doc_id, regexp_extract_all(text, '[a-z]+|[0-9]+') AS toks FROM documents))
      |ORDER BY doc_id""".stripMargin

  /** Document fingerprinting: content hash (md5), order-insensitive
    * bag-of-words hash (md5 of the sorted distinct token list), and a
    * short routing bucket — the identity keys an exact-dedup pass joins on.
    */
  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        md5(col("text")).as("content_fp"),
        md5(array_join(array_sort(array_distinct(split(col("text"), " "))), " ")).as("bow_fp"))
      .withColumn("bucket", substring(col("content_fp"), 1, 4))
      .orderBy("doc_id")

  val textFingerprintOracle: String =
    """SELECT doc_id, md5(text) AS content_fp,
      | md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS bow_fp,
      | substring(md5(text), 1, 4) AS bucket
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Repetition detection — max run length of consecutively repeated
    * tokens and total run count per doc (the repetition-filter signal of
    * LLM data pipelines). Run ids via lag + cumulative flag sum (same
    * shape as sessionization); all codegen'd, one shuffle on doc_id.
    */
  /** Run-length stats per document in ONE map-only pass: a fold over the
    * token array tracking (prev token, current run, max run, run count) —
    * r20 optimization replacing the posexplode + lag/sum windows + two
    * keyed aggregations spelling, which shuffled every TOKEN twice (guide
    * §2.4: the per-doc run structure never needed a cross-row operator —
    * the document row already holds its whole token sequence). Identical
    * arithmetic: a token extends the run iff it equals its predecessor
    * (tokens are never null, so the null-safe compare against the seed's
    * null prev starts run 1 exactly where lag() returned null).
    */
  def textRepetition(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        aggregate(
          split(col("text"), " "),
          struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
            lit(0L).as("max_run"), lit(0L).as("n_runs")),
          (acc, tok) => {
            val ext = tok <=> acc("prev")
            val run = when(ext, acc("run") + 1L).otherwise(lit(1L))
            struct(tok.as("prev"), run.as("run"),
              greatest(acc("max_run"), run).as("max_run"),
              when(ext, acc("n_runs")).otherwise(acc("n_runs") + 1L).as("n_runs"))
          }).as("rs"))
      .select(col("doc_id"), col("rs.max_run").as("max_run_len"),
        col("rs.n_runs").as("n_runs"))
      .orderBy("doc_id")

  val textRepetitionOracle: String =
    """WITH toks AS (
      | SELECT doc_id, u.pos AS pos, u.tok AS tok FROM (
      |  SELECT doc_id, unnest(list_transform(range(1, len(t)+1), i -> {'pos': i, 'tok': t[i]})) AS u
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))),
      |runs AS (
      | SELECT doc_id, pos, CASE WHEN tok = lag(tok) OVER w THEN 0 ELSE 1 END AS new_run
      | FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      |rid AS (
      | SELECT doc_id, CAST(sum(new_run) OVER (PARTITION BY doc_id ORDER BY pos
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_id
      | FROM runs)
      |SELECT doc_id, CAST(max(rl) AS BIGINT) AS max_run_len, count(*) AS n_runs FROM (
      | SELECT doc_id, run_id, count(*) AS rl FROM rid GROUP BY 1, 2)
      |GROUP BY 1 ORDER BY doc_id""".stripMargin

  /** PII patterns in the Java-regex ∩ RE2 dialect subset (no lookaround,
    * `\b`/class repetition/alternation work identically in Spark and
    * DuckDB — both engines use leftmost-first alternation), so the
    * scrubber and its oracle share the literal pattern text. IPv4 octets
    * are bounded to 0–255 (ADVICE r3), so 999.999.999.999 is no longer
    * redacted; a 5-octet run like 1.2.3.4.5 still matches its first four
    * octets (documented greedy-prefix behavior — \b can't veto a
    * trailing dot).
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val octetRe = "(25[0-5]|2[0-4][0-9]|1?[0-9]{1,2})"
  val ipRe    = s"\\b$octetRe(\\.$octetRe){3}\\b"
  val phoneRe = "\\+[0-9]{7,15}"

  /** Email → IP → phone redaction with typed placeholders (ordering
    * matters: emails contain dots that the IP pattern must never see).
    */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailRe, "<EMAIL>"),
        ipRe, "<IP>"),
      phoneRe, "<PHONE>")

  /** PII scrubbing (C4/Dolma-style training-data hygiene): per-doc counts
    * of email/IPv4/phone matches plus the md5 of the redacted text. The
    * synthetic corpus carries no PII, so the query first APPENDS
    * deterministic doc_id-derived PII to every document — identically in
    * the oracle — making the scrub observable end-to-end (a no-op scrubber
    * fails the hash). Pure per-row regex expression trees: no UDFs, no
    * shuffle, embarrassingly parallel at any scale.
    */
  def textPiiScrub(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        concat(col("text"),
          lit(" contact doc"), col("doc_id").cast("string"),
          lit("@example.com via 10."), (col("doc_id") % 256).cast("string"),
          lit(".0."), (col("doc_id") % 100).cast("string"),
          lit(" or +1555"), lpad(col("doc_id").cast("string"), 7, "0")).as("text2"))
      .select(col("doc_id"),
        regexp_count(col("text2"), lit(emailRe)).cast("long").as("n_emails"),
        regexp_count(col("text2"), lit(ipRe)).cast("long").as("n_ips"),
        regexp_count(col("text2"), lit(phoneRe)).cast("long").as("n_phones"),
        md5(scrubPii(col("text2"))).as("scrubbed_fp"))
      .orderBy("doc_id")

  val textPiiScrubOracle: String =
    s"""WITH aug AS (
       | SELECT doc_id,
       |  text || ' contact doc' || doc_id || '@example.com via 10.' ||
       |  (doc_id % 256) || '.0.' || (doc_id % 100) || ' or +1555' ||
       |  lpad(doc_id::VARCHAR, 7, '0') AS text2
       | FROM documents)
       |SELECT doc_id,
       | len(regexp_extract_all(text2, '$emailRe')) AS n_emails,
       | len(regexp_extract_all(text2, '$ipRe')) AS n_ips,
       | len(regexp_extract_all(text2, '$phoneRe')) AS n_phones,
       | md5(regexp_replace(regexp_replace(regexp_replace(text2,
       |   '$emailRe', '<EMAIL>', 'g'), '$ipRe', '<IP>', 'g'),
       |   '$phoneRe', '<PHONE>', 'g')) AS scrubbed_fp
       |FROM aug ORDER BY doc_id""".stripMargin

  /** Sequence packing — assign documents to fixed-token-budget training
    * packs (the "sample packing" step of LLM data prep). Offset-based
    * packing: docs are laid out in deterministic (doc_id) order within a
    * language and a doc's pack is its start-offset `div` budget — a pure
    * window formulation (true greedy reset-on-overflow packing is
    * inherently sequential; offset packing is the standard distributable
    * approximation, off by at most one straddling doc per boundary).
    *
    * The running sum keys on (lang, BLOCK), not `lang` alone — a
    * ~5-cardinality window key serializes the dominant language through
    * ONE task at 100 TB (VERDICT r8; same fix as
    * [[graft.operators.CorpusOps.corpusToTraining]]). The sort key here
    * is the numeric doc_id, so the block is a RANGE bucket
    * `doc_id div width` with width sized off the max id (a 1-row probe on
    * the pruned doc_id column — the in-query analog of a range
    * partitioner sampling its bounds): block order is then a prefix of
    * the doc_id order, block-local sums + broadcast per-(lang, block)
    * cumulative offsets reproduce the global window exactly, and the
    * oracle stays the plain global-window SQL — the driver compare itself
    * proves blocked == global. The keyed projection is materialized once
    * (`localCheckpoint`) so the offset branch doesn't re-tokenize the
    * corpus; at 100 TB that is the tokenized staging table.
    */
  def packSequences(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = 2048
    val nBlocks = 256L
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val maxRow = docs.agg(max(col("doc_id"))).head()
    val maxId = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    val width = math.max(1L, maxId / nBlocks + 1)
    val keyed = docs
      .withColumn("blk", expr(s"doc_id div $width"))
      .localCheckpoint()
    val wb = Window.partitionBy(col("lang"), col("blk")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = keyed.groupBy(col("lang"), col("blk"))
      .agg(sum(col("n_tokens")).as("tok"))
      .select(col("lang"), col("blk"),
        coalesce(sum(col("tok")).over(
          Window.partitionBy(col("lang")).orderBy(col("blk"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("tok_off"))
    keyed
      .withColumn("lcum", sum(col("n_tokens")).over(wb))
      .join(broadcast(offsets), Seq("lang", "blk"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        (col("tok_off") + col("lcum") - col("n_tokens")).as("tokens_before"),
        floor((col("tok_off") + col("lcum") - col("n_tokens")) / lit(budget.toDouble)).as("pack_seq"))
      .orderBy("doc_id")
  }

  val packSequencesOracle: String =
    """WITH d AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens FROM documents),
      |c AS (SELECT doc_id, lang, n_tokens,
      |  CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      | FROM d)
      |SELECT doc_id, lang, n_tokens, cum - n_tokens AS tokens_before,
      | CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) AS pack_seq
      |FROM c ORDER BY doc_id""".stripMargin

  /** Compression-ratio quality signal — per-source deflate statistics via
    * the codegen'd [[graft.functions.DeflateLen]] kernel (Common
    * Crawl-lineage heuristic: ratio far below the corpus norm =
    * boilerplate/repetition, far above = high-entropy noise; both tails
    * are filter candidates before training). Map-only projection + one
    * keyed aggregate — the word-count topology at any corpus size. No SQL
    * engine exposes deflate, so the oracle is the pinned-constant gate
    * (the CMS/HLL convention): level-9 raw-deflate output lengths are a
    * deterministic function of the text and the bundled zlib, making the
    * per-source sums constants of the fixture. `TextPiiSpec`'s sibling
    * `DeflateKernelSpec` pins single-string golden values and the
    * ratio-orders-quality property.
    */
  def textCompressRatio(s: SparkSession, dir: String): DataFrame = {
    graft.functions.TextKernels.register(s)
    Tables.documents(s, dir)
      .select(col("source"),
        octet_length(col("text")).cast("long").as("raw"),
        expr(s"${graft.functions.TextKernels.deflateLenName}(text)").as("comp"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("raw")).as("raw_bytes"),
        sum(col("comp")).as("deflate_bytes"),
        graft.functions.Scalars.roundTo(
          sum(col("comp")).cast("double") / sum(col("raw")), 6).as("ratio"))
      .orderBy("source")
  }

  /** Pinned-constant gate (sf0.01): deflate sums are deterministic
    * byte-level functions of the fixture texts (seed-42 synthesis) and
    * the bundled zlib — constants of the codebase, the CMS/HLL pinned-
    * oracle convention. Only the exact INTEGER sums are pinned; the ratio
    * is recomputed in SQL with the identical floor formula, so the pin
    * carries no hand-rounded doubles.
    */
  val textCompressRatioOracle: String =
    """SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
      | CAST(raw_bytes AS BIGINT) AS raw_bytes,
      | CAST(deflate_bytes AS BIGINT) AS deflate_bytes,
      | floor(CAST(deflate_bytes AS DOUBLE) / raw_bytes * 1e6 + 0.5) / 1e6 AS ratio
      |FROM (VALUES
      | ('src0',25,7949,3764),('src1',25,8570,3930),('src10',25,7161,3480),
      | ('src11',25,8387,3938),('src12',25,6927,3408),('src13',25,8462,3914),
      | ('src14',25,7216,3474),('src15',25,7100,3407),('src16',25,7484,3510),
      | ('src17',25,7477,3581),('src18',25,7556,3599),('src19',25,6306,3169),
      | ('src2',25,7689,3647),('src3',25,7620,3635),('src4',25,7098,3453),
      | ('src5',25,7254,3513),('src6',25,6964,3362),('src7',25,8201,3859),
      | ('src8',25,6277,3155),('src9',25,7476,3551)
      |) v(source, n_docs, raw_bytes, deflate_bytes)
      |ORDER BY source""".stripMargin

  override def queries: Seq[RegisteredQuery] = Seq(
    RegisteredQuery("text_repetition", textRepetition, Some(textRepetitionOracle)),
    RegisteredQuery("pack_sequences", packSequences, Some(packSequencesOracle)),
    RegisteredQuery("text_stats", textStats, Some(textStatsOracle)),
    RegisteredQuery("text_lang_id", textLangId, Some(textLangIdOracle)),
    RegisteredQuery("text_token_count", textTokenCount, Some(textTokenCountOracle)),
    RegisteredQuery("text_fingerprint", textFingerprint, Some(textFingerprintOracle)),
    RegisteredQuery("text_pii_scrub", textPiiScrub, Some(textPiiScrubOracle)),
    RegisteredQuery("text_compress_ratio", textCompressRatio,
      Some(textCompressRatioOracle)),
  )
}

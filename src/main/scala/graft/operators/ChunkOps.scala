package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Document chunking and span-level dedup — the context-window prep stage
  * of an LLM training pipeline (reference's transform stage feeds fixed
  * analytics; a training pipeline additionally re-shapes documents into
  * model-sized pieces and strips corpus-frequent spans, cf. CCNet-style
  * line dedup re-expressed over token streams).
  *
  * All three operators share one topology: `split` the text once per row,
  * `explode` an index grid, `slice` the token array per span. The split
  * runs exactly once per document because the array is materialized as an
  * attribute BELOW the Generate (explode) node — CollapseProject cannot
  * inline an expression across a Generate, so the per-span projections
  * reference the array by attribute instead of recomputing it (the same
  * guarantee [[LexiconOps.vocabOovRate]]'s plan spec pins). `slice` on an
  * array attribute is positional and codegen'd — no interpreted lambdas
  * in the hot path (SURVEY §7.5: HOF lambdas stay off hot paths).
  *
  * Scale: chunking is map-only (explode multiplies rows ~n/stride, no
  * shuffle); segment dedup shuffles once keyed on the segment hash —
  * uniform by construction (hashes) so no skew; boilerplate detection is
  * the word-count topology (explode → keyed aggregate) where map-side
  * partial aggregation absorbs the n-gram fan-out before the exchange.
  */
object ChunkOps extends QueryModule {

  /** Chunk span/stride in tokens: 32-token windows every 24 tokens (8-token
    * overlap) — the sliding-window shape used to pack documents into
    * fixed-length training contexts without losing cross-boundary spans.
    */
  private val span = 32
  private val stride = 24

  /** Non-overlapping segment length for span-level dedup. */
  private val segLen = 16

  /** Boilerplate n-gram width and document-frequency threshold. */
  private val gramN = 3
  private val dfMin = 5

  private def tokenized(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n"))

  /** (doc_id, si, seg): every [[segLen]]-token segment of every document —
    * the shared front end of [[dedupSegments]] and [[corpusRepack]] (one
    * definition so the capstone provably composes the same segmentation).
    */
  private def segmented(s: SparkSession, dir: String): DataFrame =
    tokenized(s, dir)
      .select(col("doc_id"), col("toks"),
        explode(expr(s"sequence(0, cast(ceil(n / $segLen.0) as int) - 1)")).as("si"))
      .select(col("doc_id"), col("si"),
        array_join(slice(col("toks"), col("si") * segLen + 1, lit(segLen)), " ").as("seg"))

  /** First-occurrence order for segment dedup: one window keyed on the
    * segment hash, earliest (doc, position) wins.
    */
  private def segFirstWindow =
    Window.partitionBy(col("h")).orderBy(col("doc_id"), col("si"))

  /** Chunk-grid fan-out over a (doc_id, toks, n) frame: one row per
    * [[span]]/[[stride]] window, with the grid index `ci` — shared by
    * [[chunkOverlap]] and [[corpusRepack]]'s re-chunk stage.
    */
  private def chunkExploded(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("toks"), col("n"),
      explode(expr(
        s"sequence(0, greatest(0, cast(ceil((n - $span) / $stride.0) as int)))"))
        .as("ci"))

  /** The `ci`-th chunk's text (positional slice, codegen'd). */
  private def chunkText: Column =
    array_join(slice(col("toks"), col("ci") * stride + 1, lit(span)), " ")

  // ---------------------------------------------------------------------
  // Overlapping chunking
  // ---------------------------------------------------------------------

  /** Overlapping token-window chunking: one output row per (doc, chunk),
    * with the chunk's token offsets and a content fingerprint. The chunk
    * grid is `ceil((n - span) / stride) + 1` windows so the last window
    * always reaches the end of the document (it may be short — `n_tok`
    * carries the true width).
    */
  def chunkOverlap(s: SparkSession, dir: String): DataFrame =
    chunkExploded(tokenized(s, dir))
      .select(
        col("doc_id"),
        col("ci").cast("long").as("chunk_id"),
        (col("ci") * stride).cast("long").as("start_tok"),
        least(lit(span), col("n") - col("ci") * stride).cast("long").as("n_tok"),
        chunkText.as("chunk"))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"), col("n_tok"),
        length(col("chunk")).cast("long").as("n_chars"),
        md5(col("chunk")).as("chunk_fp"))
      .orderBy("doc_id", "chunk_id")

  val chunkOverlapOracle: String =
    s"""WITH t AS (
       | SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |c AS (
       | SELECT doc_id, toks, len(toks) AS n,
       |  unnest(generate_series(0,
       |    greatest(0, CAST(ceil((len(toks) - $span) / $stride.0) AS BIGINT)))) AS ci
       | FROM t)
       |SELECT doc_id, ci AS chunk_id, ci * $stride AS start_tok,
       | least($span, n - ci * $stride) AS n_tok,
       | length(array_to_string(toks[ci*$stride+1 : ci*$stride+$span], ' ')) AS n_chars,
       | md5(array_to_string(toks[ci*$stride+1 : ci*$stride+$span], ' ')) AS chunk_fp
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  // ---------------------------------------------------------------------
  // Segment-level dedup (the line-dedup analog for token streams)
  // ---------------------------------------------------------------------

  /** Span-level dedup: cut each document into fixed [[segLen]]-token
    * segments, keep only the corpus-wide FIRST occurrence of each distinct
    * segment (ordered by doc_id, then position), and report per-document
    * retention. This is CCNet-style line dedup for a corpus whose
    * documents are token streams: near-duplicate documents lose their
    * repeated spans while unique text survives.
    *
    * First-occurrence is one `row_number` window keyed on the segment
    * hash — a single hash-partitioned shuffle whose groups are tiny
    * (duplicate cardinality per segment), then a per-doc re-aggregate.
    */
  def dedupSegments(s: SparkSession, dir: String): DataFrame = {
    segmented(s, dir)
      .select(col("doc_id"), col("si"), length(col("seg")).as("seg_chars"),
        md5(col("seg")).as("h"))
      .withColumn("rn", row_number().over(segFirstWindow))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rn") === 1, col("seg_chars").cast("long"))
          .otherwise(0L)).as("kept_chars"))
      .orderBy("doc_id")
  }

  val dedupSegmentsOracle: String =
    s"""WITH t AS (
       | SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |s AS (
       | SELECT doc_id, toks,
       |  unnest(generate_series(0, CAST(ceil(len(toks) / $segLen.0) AS BIGINT) - 1)) AS si
       | FROM t),
       |segs AS (
       | SELECT doc_id, si,
       |  length(array_to_string(toks[si*$segLen+1 : si*$segLen+$segLen], ' ')) AS seg_chars,
       |  md5(array_to_string(toks[si*$segLen+1 : si*$segLen+$segLen], ' ')) AS h
       | FROM s),
       |k AS (
       | SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id, si) AS rn
       | FROM segs)
       |SELECT doc_id, count(*) AS n_segs,
       | CAST(count(*) FILTER (rn = 1) AS BIGINT) AS n_kept,
       | CAST(coalesce(sum(seg_chars) FILTER (rn = 1), 0) AS BIGINT) AS kept_chars
       |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Corpus-frequent n-gram (boilerplate) detection
  // ---------------------------------------------------------------------

  /** Boilerplate census: [[gramN]]-gram spans occurring in at least
    * [[dfMin]] distinct documents, ranked by document frequency — the
    * template/navigation-chrome detector a crawl pipeline runs before
    * span removal. Explode every gram start, slice, then one keyed
    * aggregate; partial aggregation collapses the per-partition gram
    * fan-out map-side, so the exchange carries only distinct grams.
    */
  def boilerplateNgrams(s: SparkSession, dir: String): DataFrame =
    tokenized(s, dir)
      // docs shorter than one gram emit nothing: without the guard,
      // sequence(1, 0) runs DESCENDING ([1, 0]) and slice(toks, 0, ...)
      // throws — the same pitfall [[LexiconOps.bpePairStats]] guards;
      // DuckDB's generate_series(1, 0) is empty, so the filter also keeps
      // the engines aligned on short documents
      .filter(col("n") >= gramN)
      .select(col("doc_id"), col("toks"),
        explode(expr(s"sequence(1, n - ${gramN - 1})")).as("i"))
      .select(col("doc_id"),
        array_join(slice(col("toks"), col("i"), lit(gramN)), " ").as("gram"))
      .groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= dfMin)
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("gram"))
      .limit(20)

  val boilerplateNgramsOracle: String =
    s"""WITH t AS (
       | SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |g AS (
       | SELECT doc_id, toks,
       |  unnest(generate_series(1, greatest(0, len(toks) - ${gramN - 1}))) AS i
       | FROM t),
       |grams AS (
       | SELECT doc_id, array_to_string(toks[i : i+${gramN - 1}], ' ') AS gram FROM g)
       |SELECT gram, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
       |FROM grams GROUP BY gram HAVING count(DISTINCT doc_id) >= $dfMin
       |ORDER BY n_docs DESC, n_occ DESC, gram LIMIT 20""".stripMargin

  // ---------------------------------------------------------------------
  // Repack capstone: dedup spans, reassemble, re-chunk — one plan
  // ---------------------------------------------------------------------

  /** The round's composition capstone: segment-level dedup, reassembly of
    * each document from its surviving spans (in original order), and
    * re-chunking of the cleaned text into training windows — one Catalyst
    * plan, no intermediate materialization. This is the "dedup then repack
    * contexts" step between a crawl and a tokenizer: span dedup shrinks
    * documents, so chunk grids must be recomputed over the CLEANED text,
    * not sliced out of the originals.
    *
    * Shape: the segment pass is [[dedupSegments]]'s hash-keyed window; the
    * reassembly is one per-doc aggregate (`sort_array(collect_list(struct
    * (si, seg)))` — ordered concat without a second window); the re-chunk
    * is [[chunkOverlap]]'s map-only explode+slice. The only lambda
    * (`transform` projecting seg out of the sorted structs) runs once per
    * DOCUMENT over an already-aggregated array — off the per-token hot
    * path. Documents whose every span was seen before (exact duplicates)
    * have no surviving segments and vanish from the output, which is the
    * intended dedup semantics.
    */
  def corpusRepack(s: SparkSession, dir: String): DataFrame = {
    val cleaned = segmented(s, dir)
      .withColumn("h", md5(col("seg")))
      .withColumn("rn", row_number().over(segFirstWindow))
      .filter(col("rn") === 1)
      .groupBy(col("doc_id"))
      .agg(array_join(expr(
        "transform(array_sort(collect_list(struct(si, seg))), x -> x.seg)"), " ")
        .as("txt"))
    chunkExploded(cleaned
        .select(col("doc_id"), split(col("txt"), " ").as("toks"))
        .select(col("doc_id"), col("toks"), size(col("toks")).as("n")))
      .select(col("doc_id"), col("ci").cast("long").as("chunk_id"),
        least(lit(span), col("n") - col("ci") * stride).cast("long").as("n_tok"),
        md5(chunkText).as("chunk_fp"))
      .orderBy("doc_id", "chunk_id")
  }

  val corpusRepackOracle: String =
    s"""WITH t AS (
       | SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |s AS (
       | SELECT doc_id, toks,
       |  unnest(generate_series(0, CAST(ceil(len(toks) / $segLen.0) AS BIGINT) - 1)) AS si
       | FROM t),
       |segs AS (
       | SELECT doc_id, si,
       |  array_to_string(toks[si*$segLen+1 : si*$segLen+$segLen], ' ') AS seg
       | FROM s),
       |k AS (
       | SELECT doc_id, si, seg,
       |  row_number() OVER (PARTITION BY md5(seg) ORDER BY doc_id, si) AS rn
       | FROM segs),
       |cleaned AS (
       | SELECT doc_id, string_agg(seg, ' ' ORDER BY si) AS txt
       | FROM k WHERE rn = 1 GROUP BY doc_id),
       |ct AS (
       | SELECT doc_id, string_split(txt, ' ') AS toks FROM cleaned),
       |c AS (
       | SELECT doc_id, toks, len(toks) AS n,
       |  unnest(generate_series(0,
       |    greatest(0, CAST(ceil((len(toks) - $span) / $stride.0) AS BIGINT)))) AS ci
       | FROM ct)
       |SELECT doc_id, ci AS chunk_id, least($span, n - ci * $stride) AS n_tok,
       | md5(array_to_string(toks[ci*$stride+1 : ci*$stride+$span], ' ')) AS chunk_fp
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  /** Sliding-window width/stride for alignment-free exact-substring dedup.
    * Stride MUST be 1 for the exactness guarantee: with S>1 the two
    * documents' window grids both start at their own text start, so a
    * shared run whose offsets differ by a non-multiple of S is sampled at
    * different intra-run positions and never hash-collides (worked
    * counterexample: offsets 5 and 12 under S=10 — x≡5 and x≡8 (mod 10)
    * has no solution). S=1 makes every token a window start, so any
    * ≥[[winW]]-token run shared across documents is caught at ANY offset
    * pair.
    */
  private val winW = 30
  private val winS = 1

  /** Alignment-FREE exact-substring span dedup (the Lee et al.
    * "Deduplicating Training Data" ExactSubstr signal): every [[winW]]-
    * token window (stride [[winS]] = 1) is fingerprinted; windows whose
    * hash occurs in ≥2 DISTINCT documents are duplicate evidence;
    * overlapping flagged windows merge into maximal spans
    * (gaps-and-islands) and each doc reports its duplicated-token mass.
    * [[dedupSegments]] only catches duplicates that land on the same
    * segment GRID — a copied paragraph at a different offset slips
    * through; this catches any ≥[[winW]]-token shared run at any offset.
    * Intra-doc repetition deliberately does not flag (distinct-doc
    * census — [[graft.operators.TextOps]]' repetition op owns that
    * signal).
    *
    * Scale shape: one window per token position — the same per-position
    * fan-out as [[boilerplateNgrams]]' gram explode, map-only via the
    * index transform; the hash census is one word-count-shaped keyed
    * aggregate (map-side partials collapse each partition's windows);
    * the island merge windows over (doc, si) — per-doc bounded. At
    * 100 TB the md5-of-slice fingerprint is the part to upgrade (a
    * rolling Rabin-Karp kernel makes the window pass O(1) per position
    * instead of O(W)); the dataflow shape stays exactly this.
    */
  def spanExactDedup(s: SparkSession, dir: String): DataFrame = {
    val wins = tokenized(s, dir)
      .filter(col("n") >= winW)
      .select(col("doc_id"),
        explode(expr(
          s"transform(sequence(0, cast(floor((n - $winW) / $winS.0) as int)), i -> i * $winS)"))
          .as("si"),
        col("toks"))
      .select(col("doc_id"), col("si"),
        md5(expr(s"array_join(slice(toks, si + 1, $winW), ' ')")).as("h"))
    val shared = wins.groupBy("h").agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select("h")
    val flagged = wins.join(shared, "h")
      .select(col("doc_id"), col("si"), (col("si") + winW).as("e"))
    val prevMax = Window.partitionBy("doc_id").orderBy("si")
      .rowsBetween(Window.unboundedPreceding, -1)
    val runSum = Window.partitionBy("doc_id").orderBy("si")
      .rowsBetween(Window.unboundedPreceding, 0)
    val islands = flagged
      .withColumn("pme", max(col("e")).over(prevMax))
      .withColumn("is_new",
        when(col("pme").isNull || col("si") > col("pme"), 1L).otherwise(0L))
      .withColumn("island", sum(col("is_new")).over(runSum))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("si")).as("a"), max(col("e")).as("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("b") - col("a")).cast("long").as("dup_tokens"))
    wins.groupBy("doc_id").agg(count(lit(1)).as("n_windows"))
      .join(islands, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("n_islands"), lit(0L)).as("n_islands"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
      .orderBy("doc_id")
  }

  val spanExactDedupOracle: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |w AS (SELECT doc_id,
       |  unnest(generate_series(0,
       |    CAST(floor((len(toks) - $winW) / $winS.0) AS BIGINT))) * $winS AS si,
       |  toks
       | FROM t WHERE len(toks) >= $winW),
       |hw AS (SELECT doc_id, CAST(si AS INT) AS si,
       |  md5(array_to_string(toks[si+1 : si+$winW], ' ')) AS h FROM w),
       |sh AS (SELECT h FROM (
       |  SELECT h, count(DISTINCT doc_id) AS nd FROM hw GROUP BY 1) WHERE nd >= 2),
       |f AS (SELECT doc_id, si, si + $winW AS e FROM hw
       |      WHERE h IN (SELECT h FROM sh)),
       |m AS (SELECT doc_id, si, e,
       |  max(e) OVER (PARTITION BY doc_id ORDER BY si
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme FROM f),
       |ii AS (SELECT doc_id, si, e,
       |  sum(CASE WHEN pme IS NULL OR si > pme THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY doc_id ORDER BY si
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM m),
       |isl AS (SELECT doc_id, island, min(si) AS a, max(e) AS b
       |        FROM ii GROUP BY 1, 2),
       |x AS (SELECT doc_id, count(*) AS n_islands,
       |      CAST(sum(b - a) AS BIGINT) AS dup_tokens FROM isl GROUP BY 1),
       |c AS (SELECT doc_id, count(*) AS n_windows FROM hw GROUP BY 1)
       |SELECT c.doc_id, c.n_windows,
       | CAST(coalesce(x.n_islands, 0) AS BIGINT) AS n_islands,
       | CAST(coalesce(x.dup_tokens, 0) AS BIGINT) AS dup_tokens
       |FROM c LEFT JOIN x USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Content-defined chunking (CDC)
  // ---------------------------------------------------------------------

  /** Rolling-hash window width and boundary divisor: a cut lands after
    * any 8-char window whose hash ≡ 0 (mod 32), so chunks average ~32
    * chars on the fixture docs. Production CDC adds min/max clamps
    * against degenerate chunks; the census keeps the pure form so the
    * oracle recomputes every boundary from first principles. Single-
    * sourced from the [[graft.functions.CdcCuts]] kernel that detects
    * the boundaries.
    */
  private val cdcWin = graft.functions.CdcCuts.win
  private val cdcDiv = graft.functions.CdcCuts.div

  /** Content-defined chunking census — the dedup primitive [[dedupSegments]]
    * deliberately is NOT: fixed-width segments lose ALL alignment after a
    * single-character insertion, while CDC boundaries are a pure function
    * of the TRAILING bytes (cut where `md5(window) % 32 == 0`), so edits
    * re-sync within one expected chunk length and the untouched remainder
    * of the document keeps its chunk fingerprints
    * (`ChunkPropertiesSpec`/`ChunkOpsSpec` pin exactly that shift
    * robustness). This is the chunking rsync/LBFS-style dedup and
    * training-corpus near-version dedup rely on.
    *
    * Topology (100 TB shape): boundary detection is the
    * [[graft.functions.CdcCuts]] per-row kernel — one O(doc chars)
    * rolling scan INSIDE the row (the position-grid formulation it
    * replaces exploded one row per corpus character, each dragging the
    * full text through two projections: 2.8 → ~1 s at sf0.1), so only
    * the ~len/32 cut rows ever explode. The O(corpus chars) hashing
    * work itself is irreducible for byte-level chunking and stays
    * map-only. Spans come from one keyed window on doc_id (lag over
    * each doc's bounded cut list), chunk texts from one keyed join back
    * to the doc table (text shipped once per ~32-char chunk, projected
    * to an md5+length immediately), and the duplicate census is one
    * hash-keyed window — uniform by construction, no skew. Output is a
    * bounded per-source report of exact integers. The DuckDB oracle
    * still recomputes every boundary from `substr`+`md5` first
    * principles, so the gate independently verifies the kernel.
    */
  private val cdcChunkCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** (doc_id, source, ch, clen): every CDC chunk of every document —
    * the shared front end of [[chunkCdcCensus]] and [[cdcNeardupDocs]]
    * (one definition so the pair detector provably fingerprints the
    * same chunks the census counts), memoized per fixture fingerprint
    * through the [[SimilarityIndex.memoCheckpoint]] discipline: the
    * kernel scan + span window run once per fixture, both consumers
    * read the checkpointed chunk table.
    */
  private def cdcChunks(s: SparkSession, dir: String): DataFrame =
    SimilarityIndex.memoCheckpoint(cdcChunkCache, s, dir, "documents.parquet")(
      cdcChunksBuild(s, dir))

  private def cdcChunksBuild(s: SparkSession, dir: String): DataFrame = {
    graft.functions.TextKernels.register(s)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("text"))
      .filter(length(col("text")) >= 1)
    // natural cuts where the trailing window's hash divides, plus the
    // doc end (the kernel appends it) so every doc chunks completely
    val cuts = docs
      .select(col("doc_id"),
        explode(expr(s"${graft.functions.CdcCuts.name}(text)")).as("cut"))
    // no distinct: when the doc end is ALSO a natural cut, the duplicate
    // cut row lags into a zero-length span and the clen>=1 filter drops
    // it — one less corpus-wide shuffle than dedup-then-window
    val spans = cuts
      .withColumn("b", lag(col("cut"), 1, 0L)
        .over(Window.partitionBy(col("doc_id")).orderBy(col("cut"))) + 1)
      .filter(col("cut") - col("b") + 1 >= 1)
    spans.join(docs, "doc_id")
      .select(col("doc_id"), col("source"),
        md5(expr("substring(text, cast(b as int), cast(cut - b + 1 as int))")).as("ch"),
        (col("cut") - col("b") + 1).as("clen"))
  }

  def chunkCdcCensus(s: SparkSession, dir: String): DataFrame = {
    // corpus frequency as count-over-window: ONE ch-keyed exchange
    // instead of groupBy + join back (two exchanges over the same key)
    cdcChunks(s, dir)
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("ch"))))
      .groupBy(col("source"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("dup_chunks"),
        coalesce(sum(when(col("cnt") > 1, col("clen"))), lit(0L)).as("dup_chars"),
        sum(col("clen")).as("total_chars"))
      .orderBy("source")
  }

  /** The chunk-derivation CTEs both CDC oracles share (first-principles
    * boundary recompute — independently verifying the Spark-side
    * [[graft.functions.CdcCuts]] kernel).
    */
  private val cdcChunkCtes: String =
    s"""d AS (
      | SELECT doc_id, source, text FROM documents WHERE length(text) >= 1),
      |pos AS (
      | SELECT doc_id, text, unnest(generate_series($cdcWin, length(text))) AS p
      | FROM d),
      |nat AS (
      | SELECT doc_id, CAST(p AS BIGINT) AS cut FROM pos
      | WHERE CAST(('0x' || substr(md5(substr(text, p - ${cdcWin - 1}, $cdcWin)), 1, 6))
      |   AS BIGINT) % $cdcDiv = 0),
      |cuts AS (
      |  SELECT * FROM nat
      |  UNION ALL SELECT doc_id, CAST(length(text) AS BIGINT) FROM d),
      |spans AS (
      | SELECT * FROM (
      |  SELECT doc_id,
      |   coalesce(lag(cut) OVER (PARTITION BY doc_id ORDER BY cut), 0) + 1 AS b,
      |   cut FROM cuts)
      | WHERE cut - b + 1 >= 1),
      |chunks AS (
      | SELECT s.doc_id, d.source,
      |  md5(substr(d.text, CAST(b AS INT), CAST(cut - b + 1 AS INT))) AS ch,
      |  cut - b + 1 AS clen
      | FROM spans s JOIN d USING (doc_id))""".stripMargin

  val chunkCdcOracle: String =
    s"""WITH $cdcChunkCtes,
      |counted AS (
      | SELECT *, count(*) OVER (PARTITION BY ch) AS cnt FROM chunks)
      |SELECT source, count(DISTINCT doc_id) AS n_docs, count(*) AS n_chunks,
      | CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
      | CAST(coalesce(sum(CASE WHEN cnt > 1 THEN clen END), 0) AS BIGINT) AS dup_chars,
      | CAST(sum(clen) AS BIGINT) AS total_chars
      |FROM counted
      |GROUP BY 1 ORDER BY source""".stripMargin

  /** Posting document-frequency cap for [[cdcNeardupDocs]]: a chunk in
    * more than this many docs is boilerplate (shared headers, templates)
    * and would fan the pair join quadratically — the same DF-cap
    * discipline as [[Dedup]]'s shingle postings. Minimum shared-chunk
    * count for a pair to report.
    */
  private val cdcDfCap = 8
  private val cdcMinShared = 2

  /** Cross-document near-VERSION detection from CDC chunk fingerprints —
    * the query that makes [[chunkCdcCensus]] actionable: two docs that
    * share ≥ [[cdcMinShared]] content-defined chunks overlap in actual
    * spans (insertion-robust, unlike the grid segmenter), and the report
    * quantifies the shared mass (`overlap_bp` = shared chars as basis
    * points of the smaller doc).
    *
    * Scale shape: postings are (doc, chunk-hash) rows; the pair join is
    * keyed on the chunk hash with a DF cap ([[cdcDfCap]]) so per-chunk
    * fanout is bounded at df² ≤ 64 pairs — boilerplate chunks never
    * join, exactly the hot-shingle discipline of `dedup_ngram_jaccard`.
    * Per-doc char totals join back keyed on doc id. No all-pairs
    * anywhere.
    */
  def cdcNeardupDocs(s: SparkSession, dir: String): DataFrame = {
    val chunks = cdcChunks(s, dir)
    // distinct: intra-doc repeated chunks count once in the postings
    val post = chunks.select(col("doc_id"), col("ch"), col("clen")).distinct()
    val keep = post.groupBy(col("ch"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, cdcDfCap))
      .select(col("ch"))
    val p = post.join(keep, "ch")
    val docLen = chunks.groupBy(col("doc_id"))
      .agg(sum(col("clen")).as("n_chars"))
    val pairs = p.toDF("ch", "doc_a", "clen")
      .join(p.select(col("ch"), col("doc_id").as("doc_b")), "ch")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared_chunks"), sum(col("clen")).as("shared_chars"))
      .filter(col("n_shared_chunks") >= cdcMinShared)
    pairs
      .join(docLen.select(col("doc_id").as("doc_a"), col("n_chars").as("a_chars")), "doc_a")
      .join(docLen.select(col("doc_id").as("doc_b"), col("n_chars").as("b_chars")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_shared_chunks"), col("shared_chars"),
        expr("shared_chars * 10000L div least(a_chars, b_chars)").as("overlap_bp"))
      .orderBy("doc_a", "doc_b")
  }

  val cdcNeardupOracle: String =
    s"""WITH $cdcChunkCtes,
      |post AS (SELECT DISTINCT doc_id, ch, clen FROM chunks),
      |keep AS (SELECT ch FROM post GROUP BY ch
      |         HAVING count(*) BETWEEN 2 AND $cdcDfCap),
      |p2 AS (SELECT * FROM post WHERE ch IN (SELECT ch FROM keep)),
      |dlen AS (SELECT doc_id, CAST(sum(clen) AS BIGINT) AS n_chars
      |         FROM chunks GROUP BY 1),
      |pairs AS (
      | SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
      |  count(*) AS n_shared_chunks, CAST(sum(l.clen) AS BIGINT) AS shared_chars
      | FROM p2 l JOIN p2 r USING (ch)
      | WHERE l.doc_id < r.doc_id
      | GROUP BY 1, 2 HAVING count(*) >= $cdcMinShared)
      |SELECT doc_a, doc_b, n_shared_chunks, shared_chars,
      | shared_chars * 10000 // least(a.n_chars, b.n_chars) AS overlap_bp
      |FROM pairs
      |JOIN dlen a ON doc_a = a.doc_id
      |JOIN dlen b ON doc_b = b.doc_id
      |ORDER BY doc_a, doc_b""".stripMargin

  override def queries: Seq[RegisteredQuery] = Seq(
    RegisteredQuery("chunk_overlap", chunkOverlap, Some(chunkOverlapOracle)),
    RegisteredQuery("chunk_cdc_census", chunkCdcCensus, Some(chunkCdcOracle)),
    RegisteredQuery("cdc_neardup_docs", cdcNeardupDocs, Some(cdcNeardupOracle)),
    RegisteredQuery("dedup_segments", dedupSegments, Some(dedupSegmentsOracle)),
    RegisteredQuery("span_exact_dedup", spanExactDedup, Some(spanExactDedupOracle)),
    RegisteredQuery("boilerplate_ngrams", boilerplateNgrams, Some(boilerplateNgramsOracle)),
    RegisteredQuery("corpus_repack", corpusRepack, Some(corpusRepackOracle)),
  )
}

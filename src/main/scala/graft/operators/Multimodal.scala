package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata, and decode/feature-extraction runs as a
  * batched per-partition transform — the Spark-side shape (schema,
  * partitioning, batch iteration) is real; only the codec call is a stub.
  *
  * The fixtures carry no media, so the payload is derived (`text` bytes) —
  * at 100 TB the payload column would come from parquet binary pages and
  * everything downstream is identical. Decode happens partition-local with
  * NO shuffle; a real deployment would add `repartition(n)` upstream only
  * to right-size decode tasks, not for correctness.
  */
object Multimodal extends QueryModule {

  /** Typed rows for the decode path. */
  final case class MediaIn(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(
      doc_id: Long, byte_len: Long, width: Int, height: Int,
      n_frames: Int, mean_byte: Double)

  /** ======== STUB ========
    * Deterministic fake codec: derives "image" dimensions and a feature
    * from raw bytes. A real deployment swaps ONLY this function for an
    * actual decoder (libjpeg/ffmpeg/...) — its signature (batch of byte
    * arrays in, metadata out) is the real contract, mirroring a vectorized
    * decode over record batches.
    */
  def decodeStub(batch: Seq[MediaIn]): Seq[MediaMeta] =
    batch.map { m =>
      val b = m.payload
      val w = (java.lang.Byte.toUnsignedInt(b(0)) % 64) + 16
      val h = (java.lang.Byte.toUnsignedInt(b(b.length - 1)) % 64) + 16
      MediaMeta(
        doc_id = m.doc_id,
        byte_len = b.length.toLong,
        width = w,
        height = h,
        n_frames = b.length / 64 + 1,
        mean_byte = math.round(b.map(java.lang.Byte.toUnsignedInt).sum.toDouble / b.length * 100) / 100.0)
    }

  /** Binary ingest + batched decode: binary payload column → typed Dataset
    * → mapPartitions in fixed-size batches (the vectorized-decode shape) →
    * metadata DataFrame. The codec is a STUB, but a deterministic one
    * derived from raw bytes — so the whole plumbing path (binary cast,
    * typed Encoder, batching, partition-local transform) is oracle-checked
    * against a byte-level SQL mirror; swapping in a real codec would move
    * the query back to rows-only + golden files.
    */
  def mmDecodeStub(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val batchSize = 64
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaIn]
      .mapPartitions(it => it.grouped(batchSize).flatMap(g => decodeStub(g.toSeq)))
      .toDF()
      .orderBy("doc_id")
  }

  /** Pure-SQL binary stats over the payload column — the oracle-checkable
    * slice of the multimodal path (schema + byte-level access).
    */
  def mmBinaryStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        octet_length(col("text")).cast("long").as("byte_len"),
        ascii(substring(col("text"), 1, 1)).cast("long").as("first_byte"),
        (floor(octet_length(col("text")) / lit(256)) + 1).cast("long").as("n_chunks"))
      .orderBy("doc_id")

  val mmBinaryStatsOracle: String =
    """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_len,
      | CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS first_byte,
      | CAST(floor(strlen(text) / 256.0) + 1 AS BIGINT) AS n_chunks
      |FROM documents ORDER BY doc_id""".stripMargin

  val mmDecodeStubOracle: String =
    """WITH sums AS (
      | SELECT doc_id, sum(ascii(ch)) AS bsum
      | FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents)
      | GROUP BY doc_id)
      |SELECT d.doc_id,
      | CAST(strlen(d.text) AS BIGINT) AS byte_len,
      | CAST((ascii(substring(d.text, 1, 1)) % 64) + 16 AS INTEGER) AS width,
      | CAST((ascii(substring(d.text, CAST(strlen(d.text) AS INTEGER), 1)) % 64) + 16 AS INTEGER) AS height,
      | CAST(CAST(strlen(d.text) AS BIGINT) // 64 + 1 AS INTEGER) AS n_frames,
      | floor(s.bsum::DOUBLE / strlen(d.text) * 100 + 0.5) / 100 AS mean_byte
      |FROM documents d JOIN sums s USING (doc_id) ORDER BY doc_id""".stripMargin

  /** Frame sampling over the payload: every `stride`-th 64-byte "frame"
    * of each payload becomes a row (the video-frame-sample shape: explode
    * with a computed index list, then a per-frame feature from the bytes).
    * Deterministic fake feature (the codec stays a STUB) — byte-derived,
    * so oracle-checked like [[mmDecodeStub]]; the Spark-side
    * explode/partitioning is the real contract.
    */
  def mmFrameSample(s: SparkSession, dir: String): DataFrame = {
    val frameBytes = 64
    val stride = 4
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(col("doc_id"), col("payload"),
        expr(s"sequence(0, (octet_length(payload) - 1) div $frameBytes)").as("frames"))
      .select(col("doc_id"), explode(expr(s"filter(frames, f -> f % $stride = 0)")).as("frame_idx"),
        col("payload"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        // STUB per-frame feature: first byte of the frame
        ascii(substring(col("payload").cast("string"),
            (col("frame_idx").cast("int") * frameBytes + 1), lit(1)))
          .cast("long").as("frame_feature"))
      .orderBy("doc_id", "frame_idx")
  }

  val mmFrameSampleOracle: String =
    """WITH f AS (
      | SELECT doc_id, text,
      |  unnest(list_filter(range(0, CAST(strlen(text) - 1 AS BIGINT) // 64 + 1),
      |    fr -> fr % 4 = 0)) AS frame_idx
      | FROM documents)
      |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
      | CAST(ascii(substring(text, CAST(frame_idx * 64 + 1 AS INTEGER), 1)) AS BIGINT) AS frame_feature
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  /** Container-header sniffing WITHOUT decode — the step a media crawl
    * runs on every object before deciding what to decode at all: check
    * the magic bytes, branch on format, and pull the typed metadata from
    * the header layout (PNG IHDR: big-endian width/height at bytes 17/21;
    * canonical WAV fmt chunk: little-endian sample rate at byte 25,
    * channel count at byte 23). Unlike [[decodeStub]] this is NOT a stub:
    * the parser is real Spark `substring`/`hex`/`conv` arithmetic over the
    * binary column, codegen'd, zero shuffle — only the payloads are
    * fixture-synthesized (valid headers built in-plan from doc_id, text
    * bytes as the body, exactly like the other mm queries derive their
    * payloads).
    *
    * The oracle does NOT mirror the byte juggling — it computes the
    * expected metadata straight from the doc_id arithmetic the synthesizer
    * used. The Spark side must round-trip int → header bytes → parsed int:
    * an endianness mistake, a one-off offset, or a broken magic branch all
    * mismatch. `width`/`height` are NULL for WAV rows and `sample_rate`/
    * `n_channels` NULL for PNG rows — the format branch is part of the
    * contract.
    */
  def mmHeaderProbe(s: SparkSession, dir: String): DataFrame = {
    // int → 4-byte big-endian binary, in-plan
    def be4(c: String) = s"unhex(lpad(hex(($c)), 8, '0'))"
    // little-endian = reversed BE byte order, built per byte
    def le4(c: String) =
      s"""concat(unhex(lpad(hex(($c) % 256), 2, '0')),
         | unhex(lpad(hex(CAST(($c) / 256 AS BIGINT) % 256), 2, '0')),
         | unhex(lpad(hex(CAST(($c) / 65536 AS BIGINT) % 256), 2, '0')),
         | unhex(lpad(hex(CAST(($c) / 16777216 AS BIGINT) % 256), 2, '0')))""".stripMargin
    def le2(c: String) =
      s"concat(unhex(lpad(hex(($c) % 256), 2, '0')), unhex(lpad(hex(CAST(($c) / 256 AS BIGINT) % 256), 2, '0')))"
    val synth = Tables.documents(s, dir).selectExpr(
      "doc_id",
      "16 + doc_id % 640 AS w", "16 + (doc_id * 7) % 480 AS h",
      "8000 + (doc_id % 8) * 4000 AS sr", "CAST(1 + doc_id % 2 AS INT) AS ch",
      "cast(text AS binary) AS body")
      .selectExpr("doc_id",
        s"""IF(doc_id % 2 = 0,
           | concat(unhex('89504E470D0A1A0A'), unhex('0000000D'), cast('IHDR' AS binary),
           |   ${be4("w")}, ${be4("h")}, body),
           | concat(cast('RIFF' AS binary), ${le4("length(body) + 20")}, cast('WAVE' AS binary),
           |   cast('fmt ' AS binary), ${le4("16")}, ${le2("1")}, ${le2("ch")},
           |   ${le4("sr")}, body)) AS payload""".stripMargin)

    parseHeaders(synth).orderBy("doc_id")
  }

  /** The header parser itself, reusable over ANY frame with a binary
    * `payload` column — `MultimodalSpec` runs it over hand-written golden
    * bytes (a real PNG IHDR, a real canonical WAV header) so the offsets
    * and endianness are pinned against the file-format specs, not just
    * against [[mmHeaderProbe]]'s own synthesizer.
    */
  private[graft] def parseHeaders(withPayload: DataFrame): DataFrame = {
    def beInt(pos: Int) = s"CAST(conv(hex(substring(payload, $pos, 4)), 16, 10) AS BIGINT)"
    def leByte(pos: Int) = s"CAST(conv(hex(substring(payload, $pos, 1)), 16, 10) AS BIGINT)"
    def leInt(pos: Int) =
      s"(${leByte(pos)} + 256 * ${leByte(pos + 1)} + 65536 * ${leByte(pos + 2)} + 16777216 * ${leByte(pos + 3)})"
    def leShort(pos: Int) = s"(${leByte(pos)} + 256 * ${leByte(pos + 1)})"
    withPayload.selectExpr(
      "doc_id",
      """CASE WHEN hex(substring(payload, 1, 8)) = '89504E470D0A1A0A' THEN 'png'
        |     WHEN substring(payload, 1, 4) = cast('RIFF' AS binary)
        |      AND substring(payload, 9, 4) = cast('WAVE' AS binary) THEN 'wav'
        |     ELSE 'unknown' END AS format""".stripMargin,
      s"IF(hex(substring(payload, 1, 8)) = '89504E470D0A1A0A', ${beInt(17)}, NULL) AS width",
      s"IF(hex(substring(payload, 1, 8)) = '89504E470D0A1A0A', ${beInt(21)}, NULL) AS height",
      // RIFF alone is not WAV (AVI/WebP are RIFF too) — the metadata gate
      // must match the format branch exactly, or a non-WAVE RIFF container
      // would report format='unknown' WITH garbage audio fields
      s"""IF(substring(payload, 1, 4) = cast('RIFF' AS binary)
         | AND substring(payload, 9, 4) = cast('WAVE' AS binary), ${leInt(25)}, NULL) AS sample_rate""".stripMargin,
      s"""IF(substring(payload, 1, 4) = cast('RIFF' AS binary)
         | AND substring(payload, 9, 4) = cast('WAVE' AS binary), ${leShort(23)}, NULL) AS n_channels""".stripMargin,
      "CAST(length(payload) AS BIGINT) AS payload_len")
  }

  /** The oracle recomputes the metadata from the SYNTHESIS arithmetic —
    * never touching the bytes — so the Spark parse must invert the header
    * encoding exactly (see [[mmHeaderProbe]]).
    */
  val mmHeaderProbeOracle: String =
    """SELECT doc_id,
      | CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'wav' END AS format,
      | CASE WHEN doc_id % 2 = 0 THEN CAST(16 + doc_id % 640 AS BIGINT) END AS width,
      | CASE WHEN doc_id % 2 = 0 THEN CAST(16 + (doc_id * 7) % 480 AS BIGINT) END AS height,
      | CASE WHEN doc_id % 2 = 1 THEN CAST(8000 + (doc_id % 8) * 4000 AS BIGINT) END AS sample_rate,
      | CASE WHEN doc_id % 2 = 1 THEN CAST(1 + doc_id % 2 AS BIGINT) END AS n_channels,
      | CAST(CASE WHEN doc_id % 2 = 0 THEN 24 ELSE 28 END + len(text) AS BIGINT) AS payload_len
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- audio modality (VERDICT r10 #6) -------------------------------

  /** In-plan byte builders shared by the audio synthesizer: integer →
    * binary at the exact widths the container specs use. Values are
    * caller-guaranteed to fit the width (palettes are bounded).
    */
  private def b1(c: String) = s"unhex(lpad(hex($c), 2, '0'))"
  private def beBin(c: String, bytes: Int) = s"unhex(lpad(hex($c), ${2 * bytes}, '0'))"
  private def le16(c: String) =
    s"concat(${b1(s"($c) % 256")}, ${b1(s"(($c) div 256) % 256")})"
  private def le32(c: String) =
    s"concat(${b1(s"($c) % 256")}, ${b1(s"(($c) div 256) % 256")}, " +
      s"${b1(s"(($c) div 65536) % 256")}, ${b1(s"(($c) div 16777216) % 256")})"

  /** Audio-container probe — the audio twin of [[mmHeaderProbe]], closing
    * the one mainstream training-data modality the family lacked
    * (VERDICT r10). Synthesizes BYTE-EXACT container headers per document
    * (even doc_id → canonical 44-byte PCM WAV; odd → FLAC "fLaC" +
    * STREAMINFO with its 20/3/5/36-bit packed fields), then parses them
    * back with real in-plan byte arithmetic: the Spark side must invert
    * the RIFF little-endian layout AND the FLAC big-endian bit packing
    * exactly — a one-off offset, an endianness slip, or a mis-split bit
    * field all break the hash. Duration is INTEGER milliseconds
    * (data_bytes×1000 div byte_rate for WAV, samples×1000 div
    * sample_rate for FLAC) so every value is exact on both engines.
    * Only the PCM/frame decode beyond the header is out of scope — the
    * same honest codec boundary as [[decodeStub]].
    *
    * Scale: map-only over the payload column, codegen'd substring/conv
    * arithmetic, zero shuffle before the presentation sort — the
    * header-sniff pass a media crawl runs on every object.
    */
  def mmAudioProbe(s: SparkSession, dir: String): DataFrame =
    parseAudioHeaders(synthAudio(s, dir)).orderBy("doc_id")

  /** The synthesized audio corpus: doc_id + a binary `payload` column. */
  private[graft] def synthAudio(s: SparkSession, dir: String): DataFrame = {
    val synth = Tables.documents(s, dir).selectExpr(
      "doc_id",
      "8000 * (1 + doc_id % 6) AS sr",
      "1 + (doc_id div 3) % 2 AS ch",
      "8 * (1 + (doc_id div 2) % 3) AS bps",
      "octet_length(text) * 50 AS ds",                    // WAV data bytes
      "octet_length(text) * 37 + doc_id % 1000 AS ns",    // FLAC samples
      "cast(text AS binary) AS body")
      .selectExpr("doc_id", "sr", "ch", "bps", "ds", "ns", "body",
        "ch * (bps div 8) AS ba")
    synth.selectExpr("doc_id",
      s"""IF(doc_id % 2 = 0,
         | concat(cast('RIFF' AS binary), ${le32("36 + ds")}, cast('WAVE' AS binary),
         |   cast('fmt ' AS binary), ${le32("16")}, ${le16("1")}, ${le16("ch")},
         |   ${le32("sr")}, ${le32("sr * ba")}, ${le16("ba")}, ${le16("bps")},
         |   cast('data' AS binary), ${le32("ds")}, body),
         | concat(cast('fLaC' AS binary), unhex('80'), ${beBin("34", 3)},
         |   ${beBin("4096", 2)}, ${beBin("4096", 2)}, ${beBin("0", 3)}, ${beBin("0", 3)},
         |   ${b1("sr div 4096")}, ${b1("(sr div 16) % 256")},
         |   ${b1("(sr % 16) * 16 + (ch - 1) * 2 + (bps - 1) div 16")},
         |   ${b1("((bps - 1) % 16) * 16 + (ns div 4294967296) % 16")},
         |   ${beBin("ns % 4294967296", 4)}, ${beBin("0", 16)}, body)) AS payload""".stripMargin)
  }

  /** The audio header parser, reusable over ANY frame with a binary
    * `payload` column — `MultimodalSpec` pins it against hand-written
    * golden bytes (a canonical WAV header, a spec-layout FLAC STREAMINFO)
    * so a synthesizer/parser bug pair can't cancel out.
    */
  private[graft] def parseAudioHeaders(withPayload: DataFrame): DataFrame = {
    def by(pos: Int) = s"CAST(conv(hex(substring(payload, $pos, 1)), 16, 10) AS BIGINT)"
    def leI(pos: Int) =
      s"(${by(pos)} + 256 * ${by(pos + 1)} + 65536 * ${by(pos + 2)} + 16777216 * ${by(pos + 3)})"
    def leS(pos: Int) = s"(${by(pos)} + 256 * ${by(pos + 1)})"
    def beI(pos: Int) = s"CAST(conv(hex(substring(payload, $pos, 4)), 16, 10) AS BIGINT)"
    val isWav = "substring(payload, 1, 4) = cast('RIFF' AS binary) " +
      "AND substring(payload, 9, 4) = cast('WAVE' AS binary)"
    val isFlac = "substring(payload, 1, 4) = cast('fLaC' AS binary)"
    // FLAC STREAMINFO packed fields (STREAMINFO starts at byte 9; the
    // 20-bit sample rate spans bytes 19-21, channels-1 and bps-1 straddle
    // bytes 21-22, the 36-bit total-sample count ends at byte 26)
    val fSr = s"(${by(19)} * 4096 + ${by(20)} * 16 + ${by(21)} div 16)"
    val fCh = s"((${by(21)} div 2) % 8 + 1)"
    val fBps = s"((${by(21)} % 2) * 16 + ${by(22)} div 16 + 1)"
    val fNs = s"((${by(22)} % 16) * 4294967296 + ${beI(23)})"
    withPayload.selectExpr(
      "doc_id",
      s"""CASE WHEN $isWav THEN 'wav' WHEN $isFlac THEN 'flac'
         | ELSE 'unknown' END AS format""".stripMargin,
      s"CASE WHEN $isWav THEN ${leI(25)} WHEN $isFlac THEN $fSr END AS sample_rate",
      s"CASE WHEN $isWav THEN ${leS(23)} WHEN $isFlac THEN $fCh END AS n_channels",
      s"CASE WHEN $isWav THEN ${leS(35)} WHEN $isFlac THEN $fBps END AS bits_per_sample",
      s"""CASE WHEN $isWav THEN ${leI(41)} * 1000 div ${leI(29)}
         |     WHEN $isFlac THEN $fNs * 1000 div $fSr END AS duration_ms""".stripMargin,
      "CAST(length(payload) AS BIGINT) AS payload_len")
  }

  /** The oracle recomputes every field from the SYNTHESIS arithmetic —
    * never touching the bytes — so the Spark parse must round-trip the
    * container encodings exactly (the [[mmHeaderProbe]] gate shape).
    */
  val mmAudioProbeOracle: String =
    """WITH p AS (
      | SELECT doc_id,
      |  8000 * (1 + doc_id % 6) AS sr,
      |  1 + (doc_id // 3) % 2 AS ch,
      |  8 * (1 + (doc_id // 2) % 3) AS bps,
      |  strlen(text) * 50 AS ds,
      |  strlen(text) * 37 + doc_id % 1000 AS ns,
      |  strlen(text) AS bl
      | FROM documents)
      |SELECT doc_id,
      | CASE WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'flac' END AS format,
      | CAST(sr AS BIGINT) AS sample_rate,
      | CAST(ch AS BIGINT) AS n_channels,
      | CAST(bps AS BIGINT) AS bits_per_sample,
      | CAST(CASE WHEN doc_id % 2 = 0 THEN ds * 1000 // (sr * ch * (bps // 8))
      |      ELSE ns * 1000 // sr END AS BIGINT) AS duration_ms,
      | CAST(CASE WHEN doc_id % 2 = 0 THEN 44 ELSE 34 + 8 END + bl AS BIGINT)
      |   AS payload_len
      |FROM p ORDER BY doc_id""".stripMargin

  /** Corpus-level duration histogram over the PARSED audio metadata —
    * the distribution audit an audio-corpus curation pass reports (clip
    * length mix per container format). Runs the full synthesize→parse
    * pipeline of [[mmAudioProbe]] UNDER the aggregate, so the bucketing
    * is gated end-to-end; all sums are exact integer milliseconds.
    * Scale: map-side parse + one tiny keyed aggregate (bucket count is
    * bounded by max clip length, not corpus size).
    */
  def mmAudioBins(s: SparkSession, dir: String): DataFrame =
    parseAudioHeaders(synthAudio(s, dir))
      .groupBy(col("format"), expr("duration_ms div 1000").as("sec_bucket"))
      .agg(count(lit(1)).as("n_clips"),
        sum(col("duration_ms")).as("total_ms"),
        min(col("duration_ms")).as("min_ms"),
        max(col("duration_ms")).as("max_ms"))
      .orderBy("format", "sec_bucket")

  val mmAudioBinsOracle: String =
    """WITH p AS (
      | SELECT doc_id,
      |  8000 * (1 + doc_id % 6) AS sr,
      |  1 + (doc_id // 3) % 2 AS ch,
      |  8 * (1 + (doc_id // 2) % 3) AS bps,
      |  strlen(text) * 50 AS ds,
      |  strlen(text) * 37 + doc_id % 1000 AS ns
      | FROM documents),
      |d AS (
      | SELECT CASE WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'flac' END AS format,
      |  CAST(CASE WHEN doc_id % 2 = 0 THEN ds * 1000 // (sr * ch * (bps // 8))
      |       ELSE ns * 1000 // sr END AS BIGINT) AS duration_ms
      | FROM p)
      |SELECT format, CAST(duration_ms // 1000 AS BIGINT) AS sec_bucket,
      | count(*) AS n_clips, CAST(sum(duration_ms) AS BIGINT) AS total_ms,
      | CAST(min(duration_ms) AS BIGINT) AS min_ms,
      | CAST(max(duration_ms) AS BIGINT) AS max_ms
      |FROM d GROUP BY 1, 2 ORDER BY format, sec_bucket""".stripMargin

  /** Interleaved-sequence packing budget, per-image patch-token cost
    * (a 24×24 vision-encoder grid), and docs per packing block.
    */
  private val packBudget = 2048L
  private val patchTokens = 576L
  private val packBlockDocs = 128L

  /** Typed row for the packing fold. */
  final case class PackDoc(
      doc_id: Long, text_tokens: Long, n_images: Long,
      img_tokens: Long, w: Long, blk: Long)

  /** Interleaved image-text sequence packing — the vision-LLM training
    * packer: each document contributes its text tokens plus
    * [[patchTokens]] placeholder tokens per attached image (image count
    * derived `doc_id % 3` — the fixtures carry no media, same convention
    * as the decode stub), and documents pack FIRST-FIT into
    * [[packBudget]]-token sequences with both docs and images ATOMIC —
    * unlike `pack_sequences`' offset semantics, a hard budget means no
    * item ever straddles a pack (an oversized single doc gets a pack of
    * its own). Greedy close-when-full is inherently sequential, so it
    * runs as a typed `flatMapGroups` fold over [[packBlockDocs]]-doc
    * RANGE blocks: each block packs independently (≤1 partial pack of
    * waste per block buys full parallelism — the accepted sample-packing
    * trade at corpus scale), one shuffle on the block key, block state =
    * two longs. The oracle replays the EXACT fold as a DuckDB recursive
    * CTE — per-pack totals must match row for row.
    */
  def mmInterleavePack(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("text_tokens"),
        (col("doc_id") % 3).cast("long").as("n_images"))
      .withColumn("img_tokens", col("n_images") * patchTokens)
      .withColumn("w", col("text_tokens") + col("img_tokens"))
      .withColumn("blk", expr(s"doc_id div $packBlockDocs"))
      .as[PackDoc]
    val packed = docs.groupByKey(_.blk).flatMapGroups { (blk, it) =>
      val sorted = it.toSeq.sortBy(_.doc_id)
      var pack = 0L
      var fill = 0L
      sorted.map { d =>
        if (fill > 0 && fill + d.w > packBudget) { pack += 1; fill = d.w }
        else fill += d.w
        (blk, pack, d.text_tokens, d.img_tokens, d.n_images)
      }
    }.toDF("blk", "pack", "text_tokens", "img_tokens", "n_img")
    packed.groupBy(col("blk"), col("pack"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("text_tokens")).as("text_tokens"),
        sum(col("img_tokens")).as("image_tokens"),
        sum(col("text_tokens") + col("img_tokens")).as("total_tokens"),
        sum(col("n_img")).as("n_images"))
      .orderBy("blk", "pack")
  }

  val mmInterleavePackOracle: String =
    s"""WITH RECURSIVE d AS (
       | SELECT doc_id, doc_id // $packBlockDocs AS blk,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS text_tokens,
       |  CAST(doc_id % 3 AS BIGINT) AS n_images,
       |  CAST((doc_id % 3) * $patchTokens AS BIGINT) AS img_tokens,
       |  CAST(len(string_split(text, ' ')) + (doc_id % 3) * $patchTokens
       |    AS BIGINT) AS w,
       |  row_number() OVER (PARTITION BY doc_id // $packBlockDocs
       |                     ORDER BY doc_id) AS rn
       | FROM documents),
       |r AS (
       | SELECT blk, rn, text_tokens, n_images, img_tokens, w,
       |   CAST(0 AS BIGINT) AS pack, w AS fill
       | FROM d WHERE rn = 1
       | UNION ALL
       | SELECT d.blk, d.rn, d.text_tokens, d.n_images, d.img_tokens, d.w,
       |   CASE WHEN r.fill + d.w > $packBudget THEN r.pack + 1 ELSE r.pack END,
       |   CASE WHEN r.fill + d.w > $packBudget THEN d.w ELSE r.fill + d.w END
       | FROM r JOIN d ON d.blk = r.blk AND d.rn = r.rn + 1)
       |SELECT blk, pack, count(*) AS n_docs,
       | CAST(sum(text_tokens) AS BIGINT) AS text_tokens,
       | CAST(sum(img_tokens) AS BIGINT) AS image_tokens,
       | CAST(sum(text_tokens + img_tokens) AS BIGINT) AS total_tokens,
       | CAST(sum(n_images) AS BIGINT) AS n_images
       |FROM r GROUP BY 1, 2 ORDER BY blk, pack""".stripMargin

  /** Perceptual near-dup over media payloads — the image-dedup pass every
    * multimodal training pipeline runs (re-encoded/resized copies of one
    * image evade byte-exact dedup but collide under a perceptual hash).
    *
    * The "thumbnail" is the declared fake-decode step: an 8×8 grid of
    * payload bytes sampled at stride len/64 (a real deployment decodes +
    * downscales; the hash/banding/join below are untouched by that swap).
    * Average-hash: bit i set iff pixel_i >= the thumbnail mean, kept as
    * FOUR 16-bit band values (no 64-bit packing — band values stay small
    * and are the LSH join keys directly). Candidates via band equality —
    * by pigeonhole, exhaustive for hamming <= 3 across 4 bands — then
    * exact hamming verify, the SimHash topology on pixels instead of
    * token votes. An exact-replica slice (every 7th doc) is unioned in so
    * hamming-0 pairs provably exist at every SF.
    *
    * The oracle is REAL (not pinned): the corpus is ASCII, so DuckDB's
    * char codes equal the payload bytes and the whole pipeline — strided
    * sampling, mean, band packing, brute-force hamming — is mirrored in
    * SQL over ALL pairs; equality with the banded Spark plan proves the
    * pigeonhole recall argument on real data.
    *
    * Scale: map-only hashing (one pass over payloads), one exchange on
    * (band_id, band_val), verify cost ∝ colliding pairs. Same cost class
    * as [[graft.operators.Dedup.dedupSimhash]].
    */
  /** Replica-id offset for [[mmPhashNeardup]]'s injected exact copies —
    * 1e12 so a synthetic id can never collide with a real doc_id at any
    * plausible corpus size (a +200k offset would alias real documents
    * past 200k docs, corrupting pair semantics and the spec's
    * replica-pair invariant).
    */
  private val replicaOffset = 1000000000000L

  def mmPhashNeardup(s: SparkSession, dir: String): DataFrame = {
    graft.functions.TextKernels.register(s)
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    // the whole sampling→mean→band-pack stage is ONE codegen'd kernel
    // ([[graft.functions.PhashBands]], r11) — bit-identical to the HOF
    // cascade it replaced, which was interpreted AND needed a
    // repartition materialization barrier plus a posexplode_OUTER
    // workaround to stop CollapseProject / InferFiltersFromConstraints
    // re-inlining the 64-substring projection into every consumer
    // (measured 251 s / 122 s failure modes — see PhashBands' scaladoc);
    // a re-inlined kernel call is just another O(n) codegen'd call
    val hashedBase = docs
      .select(col("doc_id"), expr("graft_phash_bands(text)").as("bands"))
    // replica slice appended AFTER hashing: identical payloads hash
    // identically, so the replicas reuse the originals' bands (hash the
    // corpus once, not 1+1/7 times). This also sidesteps a Spark
    // optimizer edge (UnionBase.rewriteConstraints key-not-found when
    // the HOF projection is pushed through a pre-hash union).
    val hashed = hashedBase.unionByName(
      hashedBase.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + replicaOffset).as("doc_id"), col("bands")))
    val banded = hashed.select(col("doc_id"), col("bands"),
      posexplode(col("bands")).as(Seq("band_id", "band_val")))
    def ham(i: Int) = bit_count(
      col("x.bands").getItem(i).bitwiseXOR(col("y.bands").getItem(i)))
    banded.as("x").join(banded.as("y"),
        col("x.band_id") === col("y.band_id") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        (ham(0) + ham(1) + ham(2) + ham(3)).cast("long").as("hamming"))
      .filter(col("hamming") <= 3)
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  val mmPhashOracle: String =
    """WITH base AS (
      | SELECT doc_id, text FROM documents
      | UNION ALL
      | SELECT doc_id + 1000000000000, text FROM documents WHERE doc_id % 7 = 0),
      |px AS (
      | SELECT doc_id,
      |  list_transform(range(0, 64),
      |    i -> ascii(substr(text, CAST(floor(i * length(text) / 64.0) AS INT) + 1, 1))) AS px
      | FROM base),
      |h AS (SELECT doc_id, px, list_sum(px) / 64.0 AS m FROM px),
      |bands AS (
      | SELECT doc_id,
      |  list_transform(range(0, 4),
      |    b -> list_sum(list_transform(range(0, 16),
      |      j -> CASE WHEN px[b*16 + j + 1] >= m THEN (1 << j) ELSE 0 END))) AS bs
      | FROM h)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      | CAST(bit_count(xor(a.bs[1], b.bs[1])) + bit_count(xor(a.bs[2], b.bs[2]))
      |  + bit_count(xor(a.bs[3], b.bs[3])) + bit_count(xor(a.bs[4], b.bs[4])) AS BIGINT)
      |  AS hamming
      |FROM bands a JOIN bands b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.bs[1], b.bs[1])) + bit_count(xor(a.bs[2], b.bs[2]))
      |  + bit_count(xor(a.bs[3], b.bs[3])) + bit_count(xor(a.bs[4], b.bs[4])) <= 3
      |ORDER BY doc_a, doc_b""".stripMargin

  override def queries: Seq[RegisteredQuery] = Seq(
    RegisteredQuery("mm_binary_stats", mmBinaryStats, Some(mmBinaryStatsOracle)),
    // the brute-force SQL oracle vs the banded plan IS the pigeonhole
    // recall proof on real data
    RegisteredQuery("mm_phash_neardup", mmPhashNeardup, Some(mmPhashOracle)),
    RegisteredQuery("mm_decode_stub", mmDecodeStub, Some(mmDecodeStubOracle)),
    RegisteredQuery("mm_frame_sample", mmFrameSample, Some(mmFrameSampleOracle)),
    RegisteredQuery("mm_header_probe", mmHeaderProbe, Some(mmHeaderProbeOracle)),
    RegisteredQuery("mm_audio_probe", mmAudioProbe, Some(mmAudioProbeOracle)),
    RegisteredQuery("mm_audio_bins", mmAudioBins, Some(mmAudioBinsOracle)),
    RegisteredQuery("mm_interleave_pack", mmInterleavePack, Some(mmInterleavePackOracle)),
  )
}

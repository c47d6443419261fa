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

  override def queries: Seq[RegisteredQuery] = Seq(
    RegisteredQuery("mm_binary_stats", mmBinaryStats, Some(mmBinaryStatsOracle)),
    RegisteredQuery("mm_decode_stub", mmDecodeStub, Some(mmDecodeStubOracle)),
    RegisteredQuery("mm_frame_sample", mmFrameSample, Some(mmFrameSampleOracle)),
  )
}

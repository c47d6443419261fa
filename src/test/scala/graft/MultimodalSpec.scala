package graft

import graft.operators.Multimodal

/** The header parser is driver-gated against the synthesizer's arithmetic
  * (`mm_header_probe`); these golden-byte tests pin it against the FILE
  * FORMAT specs instead — hand-written bytes for a real 800×600 PNG IHDR
  * and a canonical 44.1 kHz stereo WAV header, plus the unknown-format
  * fallback. A parser bug that the synthesizer shares (same wrong offset
  * on both sides) would pass the oracle but fail here.
  */
class MultimodalSpec extends SparkSpec {

  private def parse(payloads: Seq[(Long, Array[Byte])]) = {
    val df = spark.createDataFrame(payloads).toDF("doc_id", "payload")
    Multimodal.parseHeaders(df).collect().map(r => r.getLong(0) -> r).toMap
  }

  test("golden PNG IHDR: magic + big-endian 800x600 at the spec offsets") {
    val png: Array[Byte] =
      Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, // magic
        0x00, 0x00, 0x00, 0x0D, // IHDR length 13
        'I', 'H', 'D', 'R',
        0x00, 0x00, 0x03, 0x20, // width 800 BE
        0x00, 0x00, 0x02, 0x58, // height 600 BE
        0x08, 0x06, 0x00, 0x00, 0x00 // bit depth / color type / ...
      ).map(_.toByte)
    val r = parse(Seq(1L -> png))(1L)
    assert(r.getString(1) == "png")
    assert(r.getLong(2) == 800L && r.getLong(3) == 600L)
    assert(r.isNullAt(4) && r.isNullAt(5), "wav fields must be NULL for png")
  }

  test("golden WAV header: RIFF/WAVE magic + little-endian 44100 Hz stereo") {
    val wav: Array[Byte] = (
      "RIFF".getBytes("US-ASCII") ++
        Array(0x24, 0x00, 0x00, 0x00).map(_.toByte) ++ // chunk size LE
        "WAVE".getBytes("US-ASCII") ++
        "fmt ".getBytes("US-ASCII") ++
        Array(0x10, 0x00, 0x00, 0x00).map(_.toByte) ++ // fmt size 16 LE
        Array(0x01, 0x00).map(_.toByte) ++ // PCM
        Array(0x02, 0x00).map(_.toByte) ++ // 2 channels LE
        Array(0x44, 0xAC, 0x00, 0x00).map(_.toByte) // 44100 LE
      )
    val r = parse(Seq(2L -> wav))(2L)
    assert(r.getString(1) == "wav")
    assert(r.getLong(4) == 44100L && r.getLong(5) == 2L)
    assert(r.isNullAt(2) && r.isNullAt(3), "png fields must be NULL for wav")
  }

  test("RIFF but not WAVE (an AVI): unknown format, audio fields stay NULL") {
    val avi: Array[Byte] = (
      "RIFF".getBytes("US-ASCII") ++
        Array(0x24, 0x00, 0x00, 0x00).map(_.toByte) ++
        "AVI ".getBytes("US-ASCII") ++
        "LIST".getBytes("US-ASCII") ++
        Array(0x10, 0x00, 0x00, 0x00, 0x01, 0x00, 0x02, 0x00,
          0x44, 0xAC, 0x00, 0x00).map(_.toByte) // would parse as 2ch/44100 if leaked
      )
    val r = parse(Seq(4L -> avi))(4L)
    assert(r.getString(1) == "unknown")
    (2 to 5).foreach(i => assert(r.isNullAt(i),
      s"col $i leaked metadata for a non-WAVE RIFF container"))
  }

  test("neither magic: format falls through to unknown with NULL metadata") {
    val junk = "not a media file at all".getBytes("US-ASCII")
    val r = parse(Seq(3L -> junk))(3L)
    assert(r.getString(1) == "unknown")
    (2 to 5).foreach(i => assert(r.isNullAt(i)))
    assert(r.getLong(6) == junk.length.toLong)
  }

  test("registered probe: every row lands in a format branch with its metadata") {
    val rows = Multimodal.mmHeaderProbe(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      r.getString(1) match {
        case "png" => assert(!r.isNullAt(2) && !r.isNullAt(3) && r.isNullAt(4))
        case "wav" => assert(r.isNullAt(2) && !r.isNullAt(4) && !r.isNullAt(5))
        case other => fail(s"unexpected format $other for synthesized payloads")
      }
    }
  }

  private def parseAudio(payloads: Seq[(Long, Array[Byte])]) = {
    val df = spark.createDataFrame(payloads).toDF("doc_id", "payload")
    Multimodal.parseAudioHeaders(df).collect().map(r => r.getLong(0) -> r).toMap
  }

  test("golden WAV: full 44-byte canonical header incl. byte rate and data size") {
    // 44100 Hz, stereo, 16-bit → block align 4, byte rate 176400;
    // data chunk 352800 bytes = exactly 2.000 s
    def le32(v: Long) = Array(v & 255, (v >> 8) & 255, (v >> 16) & 255, (v >> 24) & 255).map(_.toByte)
    def le16(v: Long) = Array(v & 255, (v >> 8) & 255).map(_.toByte)
    val wav: Array[Byte] =
      "RIFF".getBytes("US-ASCII") ++ le32(36 + 352800) ++ "WAVE".getBytes("US-ASCII") ++
        "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(2) ++
        le32(44100) ++ le32(176400) ++ le16(4) ++ le16(16) ++
        "data".getBytes("US-ASCII") ++ le32(352800)
    val r = parseAudio(Seq(1L -> wav))(1L)
    assert(r.getString(1) == "wav")
    assert(r.getLong(2) == 44100L && r.getLong(3) == 2L && r.getLong(4) == 16L)
    assert(r.getLong(5) == 2000L, s"duration should be exactly 2000 ms, got ${r.getLong(5)}")
  }

  test("golden FLAC: STREAMINFO bit fields at the spec layout (44100/2ch/16bit)") {
    // sample rate 44100 = 0x0AC44 (20 bits), channels-1 = 1 (3 bits),
    // bps-1 = 15 (5 bits), total samples 88200 = 0x0158 88 (36 bits)
    // → exactly 2.000 s; sr % 16 = 4 pins the low nibble split
    val flac: Array[Byte] =
      "fLaC".getBytes("US-ASCII") ++
        Array(0x80, 0x00, 0x00, 0x22).map(_.toByte) ++       // last-block, type 0, len 34
        Array(0x10, 0x00, 0x10, 0x00).map(_.toByte) ++       // min/max blocksize 4096
        Array(0x00, 0x00, 0x00, 0x00, 0x00, 0x00).map(_.toByte) ++ // frame sizes
        // 0x0A,0xC4 = sr bits 19-4; 0x42 = sr low nibble 4 | ch-1=1 | bps-1 hi bit 0;
        // 0xF0 = bps-1 low nibble 15 | ns bits 35-32 = 0
        Array(0x0A, 0xC4, 0x42, 0xF0).map(_.toByte) ++
        Array(0x00, 0x01, 0x58, 0x88).map(_.toByte) ++       // ns low 32 = 88200
        Array.fill(16)(0x00.toByte)                          // MD5
    val r = parseAudio(Seq(2L -> flac))(2L)
    assert(r.getString(1) == "flac")
    assert(r.getLong(2) == 44100L, s"sample rate: got ${r.getLong(2)}")
    assert(r.getLong(3) == 2L && r.getLong(4) == 16L)
    assert(r.getLong(5) == 2000L, s"duration should be exactly 2000 ms, got ${r.getLong(5)}")
  }

  test("audio parser: non-audio bytes fall through to unknown with NULLs") {
    val junk = "RIFFxxxxAVI LIST but not audio".getBytes("US-ASCII")
    val r = parseAudio(Seq(3L -> junk))(3L)
    assert(r.getString(1) == "unknown")
    (2 to 5).foreach(i => assert(r.isNullAt(i), s"col $i leaked for non-audio payload"))
  }

  test("registered audio probe: every row parses into a format branch") {
    val rows = Multimodal.mmAudioProbe(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(1) == "wav" || r.getString(1) == "flac")
      assert(r.getLong(2) >= 8000L && r.getLong(2) <= 48000L)
      assert(!r.isNullAt(5) && r.getLong(5) >= 0L)
    }
  }

  test("mm_interleave_pack: hard budget, every doc packed once, dense pack ids") {
    val rows = Multimodal.mmInterleavePack(spark, sfDir).collect()
    val nDocs = graft.engine.Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs,
      "atomicity: every doc lands in exactly one pack")
    rows.foreach { r =>
      val total = r.getAs[Long]("total_tokens")
      assert(total <= 2048L || r.getAs[Long]("n_docs") == 1L,
        s"pack over budget with multiple docs: $r")
      assert(total ==
        r.getAs[Long]("text_tokens") + r.getAs[Long]("image_tokens"))
      assert(r.getAs[Long]("image_tokens") == 576L * r.getAs[Long]("n_images"))
    }
    rows.groupBy(_.getAs[Long]("blk")).foreach { case (blk, ps) =>
      val ids = ps.map(_.getAs[Long]("pack")).sorted.toSeq
      assert(ids == (0L until ids.length.toLong), s"block $blk packs not dense: $ids")
    }
    assert(rows.length > nDocs / 10, "packing should produce many packs (images are heavy)")
  }

  test("PhashBands kernel: bit-identical to the HOF formulation it replaced") {
    import org.apache.spark.sql.functions._
    graft.functions.TextKernels.register(spark)
    val texts = Seq(
      "", "a", "hello world", "x" * 63, "y" * 64, "z" * 65,
      "päällystakki ääkkösiä éè字", // non-ASCII slow path
      (0 until 500).map(i => ('a' + i % 26).toChar).mkString,
      "the quick brown fox jumps over the lazy dog " * 20)
    val df = spark.createDataFrame(texts.zipWithIndex.map(_.swap))
      .toDF("id", "text")
    val hof =
      """transform(sequence(0, 3), b -> aggregate(sequence(0, 15), 0,
        | (acc, j) -> acc + IF(element_at(
        |   transform(sequence(0, 63), i ->
        |     ascii(substring(text, CAST(floor(i * length(text) / 64.0) AS INT) + 1, 1))),
        |   b*16 + j + 1) >=
        |   aggregate(transform(sequence(0, 63), i ->
        |     ascii(substring(text, CAST(floor(i * length(text) / 64.0) AS INT) + 1, 1))),
        |     0D, (a, x) -> a + x) / 64.0,
        |  shiftleft(1, j), 0)))""".stripMargin
    val rows = df.select(col("id"),
        expr("graft_phash_bands(text)").as("kernel"), expr(hof).as("hofv"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"kernel/HOF divergence for id ${r.getInt(0)}: ${r.getSeq[Int](1)} vs ${r.getSeq[Int](2)}")
    }
  }

  test("mm_phash_neardup: replica pairs at hamming 0, banded plan, no cartesian") {
    val df = graft.operators.Multimodal.mmPhashNeardup(spark, sfDir)
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"),
      "perceptual dedup regressed to an all-pairs plan")
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.forall(_._3 <= 3))
    // every injected exact replica must pair with its original at hamming 0
    val nReplicas = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("doc_id") % 7 === 0).count()
    val zeroPairs = rows.filter(r => r._3 == 0L && r._2 == r._1 + 1000000000000L)
    assert(zeroPairs.length == nReplicas,
      s"expected $nReplicas replica identity pairs, saw ${zeroPairs.length}")
  }
}

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

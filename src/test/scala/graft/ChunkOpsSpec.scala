package graft

import org.apache.spark.sql.functions._

import graft.operators.ChunkOps

/** Semantic invariants for the chunking / span-dedup family, beyond the
  * exact DuckDB oracle (which pins values): coverage, overlap arithmetic,
  * and that segment dedup actually fires on the corpus's near-duplicates.
  */
class ChunkOpsSpec extends SparkSpec {

  test("chunk_overlap: chunks tile every document with the right overlap") {
    val chunks = ChunkOps.chunkOverlap(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val docs = graft.engine.Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    chunks.foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_.getAs[Long]("chunk_id"))
      // starts sit on the stride grid and begin at 0
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("chunk_id") === i.toLong)
        assert(r.getAs[Long]("start_tok") === i.toLong * 24)
      }
      // the last chunk reaches the end of the document
      val last = sorted.last
      assert(last.getAs[Long]("start_tok") + last.getAs[Long]("n_tok") === docs(doc),
        s"doc $doc: final chunk stops short of the last token")
      // every non-final chunk is full-width
      sorted.init.foreach(r => assert(r.getAs[Long]("n_tok") === 32L))
    }
  }

  test("dedup_segments: kept count is the corpus-distinct segment count and dedup fires") {
    val rows = ChunkOps.dedupSegments(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_segs"))
      assert(r.getAs[Long]("n_kept") >= 0L)
    }
    // sum of kept == distinct segments in the corpus (first-occurrence is a
    // bijection onto distinct hashes)
    val totalKept = rows.map(_.getAs[Long]("n_kept")).sum
    val distinctSegs = graft.engine.Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("toks"), size(col("toks")).as("n"))
      .select(col("toks"), explode(expr("sequence(0, cast(ceil(n / 16.0) as int) - 1)")).as("si"))
      .select(md5(array_join(slice(col("toks"), col("si") * 16 + 1, lit(16)), " ")).as("h"))
      .distinct().count()
    assert(totalKept === distinctSegs)
    // the fixtures contain engineered near-duplicates: dedup must actually
    // drop spans somewhere, or the operator is vacuous on this corpus
    assert(rows.exists(r => r.getAs[Long]("n_kept") < r.getAs[Long]("n_segs")),
      "no document lost a segment — dedup never fired")
  }

  test("corpus_repack: chunks re-tile the CLEANED token counts from dedup_segments") {
    val repack = ChunkOps.corpusRepack(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val kept = ChunkOps.dedupSegments(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_kept")).toMap
    val docs = graft.engine.Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs losing everything vanish; everyone else re-chunks their kept spans
    kept.foreach { case (doc, nk) =>
      assert(repack.contains(doc) === (nk > 0L), s"doc $doc: kept=$nk presence mismatch")
    }
    repack.foreach { case (doc, cs) =>
      val last = cs.maxBy(_.getAs[Long]("chunk_id"))
      val cleanedTok = last.getAs[Long]("chunk_id") * 24 + last.getAs[Long]("n_tok")
      // every kept segment is 16 tokens except (at most) the doc's original
      // tail segment, so the cleaned length the chunk grid tiles must land
      // in [16*(kept-1)+1, 16*kept] — and never exceed the original doc
      val nk = kept(doc)
      assert(cleanedTok > 16 * (nk - 1) && cleanedTok <= 16 * nk,
        s"doc $doc: cleaned token count $cleanedTok inconsistent with $nk kept segments")
      assert(cleanedTok <= docs(doc), s"doc $doc: repack grew the document")
    }
  }

  test("boilerplate_ngrams: df threshold holds and grams really occur in that many docs") {
    val grams = ChunkOps.boilerplateNgrams(spark, sfDir).collect()
    assert(grams.nonEmpty, "no boilerplate found — threshold too high for the corpus")
    grams.foreach(r => assert(r.getAs[Long]("n_docs") >= 5L))
    // cross-check one gram's document frequency by direct containment scan
    val top = grams.head
    val gram = top.getAs[String]("gram")
    val nDocs = graft.engine.Tables.documents(spark, sfDir)
      .filter(col("text").contains(gram)).count()
    // containment is an upper bound only in pathological substring cases;
    // for space-joined grams over single-space text it is exact
    assert(nDocs === top.getAs[Long]("n_docs"),
      s"gram '$gram': census says ${top.getAs[Long]("n_docs")}, scan says $nDocs")
  }

  test("span_exact_dedup catches an off-grid copied run that the aligned segmenter misses") {
    import spark.implicits._
    // a 40-token run R planted at offset 5 in doc 0 and offset 12 in doc 1:
    // offsets differ by 7, so no 16-token GRID segment of doc 0's R copy
    // aligns with doc 1's — dedup_segments sees nothing; the sliding
    // window must see everything
    val run = (0 until 40).map(i => s"r$i")
    val doc0 = ((0 until 5).map(i => s"a$i") ++ run ++ (5 until 10).map(i => s"a$i"))
    val doc1 = ((0 until 12).map(i => s"b$i") ++ run ++ (12 until 16).map(i => s"b$i"))
    val doc2 = (0 until 50).map(i => s"c$i")
    val dir = tmpDir("graft-span-dedup")
    Seq((0L, doc0.mkString(" "), "en", "s", 1),
        (1L, doc1.mkString(" "), "en", "s", 1),
        (2L, doc2.mkString(" "), "en", "s", 1))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = ChunkOps.spanExactDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    // doc 0: R occupies tokens [5, 45); flagged window starts are
    // 5..15 (every 30-window inside R), island = [5, 45) → 40 tokens
    assert(rows(0L) == ((1L, 40L)), s"doc0: ${rows(0L)}")
    // doc 1: R at [12, 52) → same 40-token island
    assert(rows(1L) == ((1L, 40L)), s"doc1: ${rows(1L)}")
    assert(rows(2L) == ((0L, 0L)), "unique doc must not flag")

    // the aligned segmenter (16-token grid) indeed reports zero cross-doc
    // duplicate segments on the same corpus — the gap this operator closes
    val seg = ChunkOps.dedupSegments(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1) - r.getLong(2))).toMap
    assert(seg.values.sum == 0L,
      s"grid segmenter unexpectedly caught the off-grid run: $seg")
  }

  test("chunk_cdc_census: chunks tile every document exactly (per-source coverage)") {
    val rows = ChunkOps.chunkCdcCensus(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(5)))).toMap
    val expect = graft.engine.Tables.documents(spark, sfDir)
      .filter(length(col("text")) >= 1)
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("nd"),
        sum(length(col("text")).cast("long")).as("tc"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.keySet == expect.keySet)
    rows.foreach { case (src, (nDocs, totalChars)) =>
      assert((nDocs, totalChars) == expect(src),
        s"source $src: chunks must cover every doc char exactly once")
    }
  }

  test("CDC boundaries survive a prefix insertion; the fixed grid loses all alignment") {
    // deterministic pseudo-diverse body (~720 chars); doc 1 is doc 0 with
    // a 3-char prefix — every byte shifts, the exact failure mode that
    // breaks aligned segmenters and that content-defined cuts absorb
    val body = (1 to 120).map(i => s"w${i * 7919 % 997}").mkString(" ")
    val dir = tmpDir("graft-cdc-shift")
    import spark.implicits._
    Seq((0L, body, "en", "s", body.length),
        (1L, "XY " + body, "en", "s", body.length + 3))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val c = ChunkOps.chunkCdcCensus(spark, dir).collect().head
    val (dupChunks, dupChars, totalChars) = (c.getLong(3), c.getLong(4), c.getLong(5))
    // boundaries re-sync within ~one expected chunk of the edit: the
    // shared suffix chunks dup on BOTH docs, so dup mass must dominate
    assert(dupChunks >= 4, s"CDC re-sync failed: only $dupChunks dup chunks")
    assert(dupChars * 2 > totalChars,
      s"dup chars $dupChars must dominate $totalChars after a 3-char shift")

    // the token-aligned segmenter on the same pair: the one-token prefix
    // shifts every 16-token grid cell — zero duplicate segments
    val seg = ChunkOps.dedupSegments(spark, dir).collect()
      .map(r => r.getLong(1) - r.getLong(2)).sum
    assert(seg == 0L, s"grid segmenter should lose alignment, caught $seg")
  }

  test("CdcCuts kernel: char-exact md5 windows, multibyte-safe, matches a reference scan") {
    import java.nio.charset.StandardCharsets.UTF_8
    def reference(text: String): Seq[Long] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val n = text.length // the fixture and spec strings avoid surrogate pairs
      val nat = (8 to n).filter { p =>
        val d = md.digest(text.substring(p - 8, p).getBytes(UTF_8))
        val v = ((d(0) & 0xFF) << 16) | ((d(1) & 0xFF) << 8) | (d(2) & 0xFF)
        v % 32 == 0
      }.map(_.toLong)
      if (nat.lastOption.contains(n.toLong)) nat else nat :+ n.toLong
    }
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog repeatedly and often",
      "héllo wörld — naïve café über straße 中文分块测试 and ascii tail here",
      "short", "", "exactly8",
      (1 to 200).map(i => s"t${i * 31 % 97}").mkString(" "))
    import spark.implicits._
    graft.functions.TextKernels.register(spark)
    val got = samples.toDF("text")
      .select(expr(s"${graft.functions.CdcCuts.name}(text)").as("cuts"))
      .collect().map(_.getSeq[Long](0).toSeq)
    samples.zip(got).foreach { case (text, cuts) =>
      val expected = if (text.length < 8) Seq(text.length.toLong) else reference(text)
      assert(cuts == expected, s"kernel cuts differ for '${text.take(30)}...'")
    }
  }
}

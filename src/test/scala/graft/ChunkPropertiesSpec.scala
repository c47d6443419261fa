package graft

import org.apache.spark.sql.SaveMode
import org.scalacheck.{Gen, Prop}

import graft.operators.ChunkOps

/** ScalaCheck properties for the chunking family against brute-force
  * Scala references, with generators biased toward the shapes the
  * fixtures never produce: documents of 0–40 tokens — shorter than one
  * chunk span, shorter than one segment, shorter than one n-gram. (A
  * 2-token document crashes the pre-guard boilerplate census: Spark's
  * sequence(1, 0) runs DESCENDING and slice(toks, 0, ..) throws — this
  * suite exists so that trap class stays closed for every operator.)
  */
class ChunkPropertiesSpec extends SparkSpec {

  import spark.implicits._


  // mirrors ChunkOps' constants (private there by design — these specs
  // break if the operator constants change, which is the point: the
  // reference walk below must be re-derived alongside them)
  private val span = 32
  private val stride = 24
  private val segLen = 16
  private val gramN = 3
  private val dfMin = 5

  /** Tiny vocabulary so segments/grams actually repeat across docs. */
  private val docGen: Gen[List[(Long, String)]] = for {
    nDocs <- Gen.choose(6, 12)
    docs <- Gen.listOfN(nDocs, for {
      n <- Gen.oneOf(Gen.choose(0, 3), Gen.choose(1, 40)) // bias short
      toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "dd", "ee"))
    } yield toks.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def stage(docs: List[(Long, String)]): String = {
    val dir = tmpDir("graft-chunk-prop")
    docs.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  /** split(" ") semantics: an empty string still yields one "" token. */
  private def toks(t: String): Vector[String] = t.split(" ", -1).toVector

  test("chunk_overlap matches a brute-force window walk (incl. sub-span docs)") {
    checkProp(minTests = 6, p = Prop.forAll(docGen) { docs =>
      val dir = stage(docs)
      val got = ChunkOps.chunkOverlap(spark, dir)
        .orderBy("doc_id", "chunk_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      val expect = docs.flatMap { case (id, t) =>
        val ts = toks(t); val n = ts.length
        val last = math.max(0, math.ceil((n - span) / stride.toDouble).toInt)
        (0 to last).map { ci =>
          val chunk = ts.slice(ci * stride, ci * stride + span).mkString(" ")
          (id, ci.toLong, (ci * stride).toLong,
            math.min(span, n - ci * stride).toLong, chunk.length.toLong)
        }
      }.sortBy(t => (t._1, t._2))
      got.toSeq == expect
    })
  }

  test("dedup_segments matches brute-force corpus-order first-occurrence") {
    checkProp(minTests = 6, p = Prop.forAll(docGen) { docs =>
      val dir = stage(docs)
      val got = ChunkOps.dedupSegments(spark, dir)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val segs = docs.flatMap { case (id, t) =>
        val ts = toks(t)
        val nSeg = math.max(1, math.ceil(ts.length / segLen.toDouble).toInt)
        (0 until nSeg).map(si => (id, si.toLong, ts.slice(si * segLen, (si + 1) * segLen).mkString(" ")))
      }
      val firstOf = segs.groupBy(_._3).map { case (seg, occ) =>
        seg -> occ.map(o => (o._1, o._2)).min
      }
      val expect = segs.groupBy(_._1).toSeq.map { case (id, ss) =>
        val kept = ss.filter(s => firstOf(s._3) == ((s._1, s._2)))
        (id, ss.size.toLong, kept.size.toLong, kept.map(_._3.length.toLong).sum)
      }.sortBy(_._1)
      got.toSeq == expect
    })
  }

  test("boilerplate_ngrams matches a brute-force census; short docs contribute nothing") {
    checkProp(minTests = 6, p = Prop.forAll(docGen) { docs =>
      val dir = stage(docs)
      val got = ChunkOps.boilerplateNgrams(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val grams = docs.flatMap { case (id, t) =>
        val ts = toks(t)
        (0 to ts.length - gramN).map(i => (id, ts.slice(i, i + gramN).mkString(" ")))
      }
      val expect = grams.groupBy(_._2).toSeq
        .map { case (g, occ) => (g, occ.map(_._1).distinct.size.toLong, occ.size.toLong) }
        .filter(_._2 >= dfMin)
        .sortBy { case (g, nd, no) => (-nd, -no, g) }
        .take(20)
      got.toSeq == expect
    })
  }

  test("corpus_repack: exact duplicate docs vanish; chunk grids cover the cleaned text") {
    checkProp(minTests = 6, p = Prop.forAll(docGen) { docs =>
      // force at least one exact duplicate pair of a non-empty doc
      val withDup = docs ++ docs.find(_._2.nonEmpty).map { case (_, t) =>
        (docs.map(_._1).max + 1, t)
      }.toList
      val dir = stage(withDup)
      val out = ChunkOps.corpusRepack(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val kept = ChunkOps.dedupSegments(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toMap
      // a document appears in the repack iff it kept at least one segment
      val expectDocs = kept.collect { case (id, nKept) if nKept > 0 => id }.toSet
      val gotDocs = out.map(_._1).toSet
      gotDocs == expectDocs
    })
  }

  /** Driver reference of the CDC cut rule (mirrors `CdcCuts`). */
  private def cdcChunksOf(text: String): Vector[String] = {
    import java.nio.charset.StandardCharsets.UTF_8
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = text.length
    val nat = (8 to n).filter { p =>
      val d = md.digest(text.substring(p - 8, p).getBytes(UTF_8))
      (((d(0) & 0xFF) << 16) | ((d(1) & 0xFF) << 8) | (d(2) & 0xFF)) % 32 == 0
    }
    val cuts = if (nat.lastOption.contains(n)) nat else nat :+ n
    (0 +: cuts).sliding(2).collect {
      case Seq(a, b) if b > a => text.substring(a, b)
    }.toVector
  }

  test("PROPERTY: a random edit preserves every CDC chunk outside one window of the edit") {
    // the re-sync theorem, checked as a property: cut decisions depend
    // only on the trailing 8 chars, so chunks that end ≥8 chars after
    // the edit AND start after it are byte-identical between versions —
    // a random insertion must keep the entire post-edit chunk multiset
    // beyond the first re-synced boundary
    val gen = for {
      n <- Gen.choose(60, 300)
      body <- Gen.listOfN(n, Gen.oneOf(('a' to 'z') :+ ' ')).map(_.mkString)
      at <- Gen.choose(0, body.length)
      ins <- Gen.listOfN(5, Gen.oneOf('a' to 'z')).map(_.mkString)
    } yield (body, at, ins)
    checkProp(Prop.forAll(gen) { case (body, at, ins) =>
      val edited = body.substring(0, at) + ins + body.substring(at)
      val origChunks = cdcChunksOf(body)
      val editChunks = cdcChunksOf(edited)
      // chunks whose START cut persists (prev cut ≥ at+8: its trailing
      // window reads only post-edit bytes). For those, the theorem is
      // exact: interior cuts persist too (all ≥ start), and new cuts
      // only appear where a window overlaps the insertion (original
      // coords < at+8, below every safe start) — so EVERY safe chunk
      // must reappear, no exceptions
      var off = 0
      val safeOrig = origChunks.flatMap { c =>
        val start = off; off += c.length
        if (start >= at + 8) Some(c) else None
      }
      val editSet = editChunks.groupBy(identity).view.mapValues(_.size).toMap
      val missing = safeOrig.groupBy(identity).view.mapValues(_.size)
        .filter { case (c, k) => editSet.getOrElse(c, 0) < k }
      missing.isEmpty
    })
  }
}

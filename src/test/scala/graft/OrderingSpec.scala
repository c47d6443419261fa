package graft

import org.apache.spark.sql.functions._

import graft.operators.OrderingOps

/** Data-ordering operator semantics (the registered queries' oracles check
  * corpus-level parity with DuckDB; this pins the invariants).
  */
class OrderingSpec extends SparkSpec {

  test("split_assign: every doc gets exactly one split, fractions near 80/10/10, stable across runs") {
    val out = OrderingOps.splitAssign(spark, sfDir).cache()
    try {
      val n = out.count()
      val byCounts = out.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byCounts.keySet.subsetOf(Set("train", "val", "test")))
      assert(byCounts.values.sum === n)
      // hash split on a 50-doc fixture is noisy; just require the ordering
      // train > val+test and a non-degenerate train share
      assert(byCounts.getOrElse("train", 0L) > n / 2)
      // determinism: a second build produces the identical assignment
      val again = OrderingOps.splitAssign(spark, sfDir)
      assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    } finally out.unpersist()
  }

  test("split_assign buckets match an independent md5 computation") {
    val row = OrderingOps.splitAssign(spark, sfDir)
      .filter(col("doc_id") === 0L).collect().head
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("0".getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 4)
    assert(row.getAs[Long]("bucket") === java.lang.Long.parseLong(hex, 16))
  }

  test("quota_rebalance: kept+dropped = total, kept <= quota, kept_chars <= total chars") {
    val quota = 5
    val out = OrderingOps.quotaRebalance(spark, sfDir, quota).collect()
    assert(out.nonEmpty)
    val totals = graft.engine.Tables.documents(spark, sfDir)
      .groupBy("source").agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    out.foreach { r =>
      val (src, nDocs, nKept, nDropped, keptChars) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nKept + nDropped === nDocs)
      assert(nKept <= quota)
      assert(nKept === math.min(nDocs, quota))
      val (expN, expChars) = totals(src)
      assert(nDocs === expN)
      assert(keptChars <= expChars)
      if (nDropped > 0) assert(keptChars < expChars)
    }
  }

  test("mix_sample: weights sum to ~1, targets track sqrt weighting, selection is bounded") {
    val rows = OrderingOps.mixSample(spark, sfDir, totalTarget = 40).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val wSum = rows.map(_._3).sum
    assert(math.abs(wSum - 1.0) < 1e-3, s"weights sum to $wSum")
    // temperature 0.5 up-samples small sources: the selected FRACTION of a
    // small source must be >= that of a strictly larger source
    rows.sortBy(_._2).sliding(2).foreach {
      case Array(small, large) if small._2 < large._2 =>
        val fs = math.min(small._4, small._2).toDouble / small._2
        val fl = math.min(large._4, large._2).toDouble / large._2
        assert(fs >= fl - 1e-9, s"small source $small under-sampled vs $large")
      case _ =>
    }
    // sel_chars only counts docs that exist
    rows.foreach { case (_, n, _, target, selChars) =>
      if (target >= n) assert(selChars > 0 || n == 0)
    }
  }

  test("length_histogram: buckets cover all docs, shares sum to ~1, last bucket capped at 9") {
    val rows = graft.operators.ProfilingOps.lengthHistogram(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val total = graft.engine.Tables.documents(spark, sfDir).count()
    assert(rows.map(_._2).sum === total)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-2)
    assert(rows.forall(r => r._1 >= 0 && r._1 <= 9))
  }

  test("shuffle_blocks: global_pos is a dense permutation and equals the true md5-global rank") {
    val out = OrderingOps.shuffleBlocks(spark, sfDir).collect()
    val n = out.length
    assert(out.map(_.getAs[Long]("global_pos")).toSeq === (1L to n.toLong))
    // block id must be the prefix of the sort key: positions within one
    // block are contiguous in the global order
    val byBlock = out.groupBy(_.getAs[Long]("block"))
    byBlock.values.foreach { rows =>
      val ps = rows.map(_.getAs[Long]("global_pos")).sorted
      assert(ps.last - ps.head === ps.length - 1, "block positions not contiguous")
    }
    // blocks appear in id order along the global order
    val firstPosPerBlock = byBlock.toSeq
      .map { case (b, rows) => (b, rows.map(_.getAs[Long]("global_pos")).min) }
      .sortBy(_._2).map(_._1)
    assert(firstPosPerBlock === firstPosPerBlock.sorted)
  }

  test("corpus_to_training: splits partition the cleaned corpus; packs respect the budget") {
    val budget = 2048
    val rows = graft.operators.CorpusOps.corpusToTraining(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(3), r.getLong(2), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val cleaned = graft.operators.CorpusOps.corpusFilter(spark, sfDir).count()
    assert(rows.length.toLong === cleaned)
    rows.groupBy(r => (r._2, r._5)).foreach { case ((split, pack), docs) =>
      val total = docs.map(_._3).sum
      val maxDoc = docs.map(_._3).max
      assert(total <= budget + maxDoc, s"pack ($split, $pack) holds $total tokens")
    }
    // ranks are dense 1..n within each split
    rows.groupBy(_._2).values.foreach { docs =>
      assert(docs.map(_._4).sorted.toSeq === (1L to docs.length.toLong))
    }
  }

  test("epoch_token_budget: selection is the MAXIMAL quality-ordered prefix under each budget") {
    import org.apache.spark.sql.functions._
    val census = graft.operators.OrderingOps.epochTokenBudget(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // driver replay from raw docs
    val docs = graft.engine.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)").as("arr"))
      .select(col("doc_id"), col("source"), size(col("arr")).cast("long").as("n"),
        (size(array_distinct(col("arr"))).cast("double") /
          size(col("arr")).cast("double")).as("q"))
      .filter(col("n") >= 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    docs.groupBy(_._2).foreach { case (src, ds) =>
      val budget = ds.map(_._3).sum * 35 / 100
      val ordered = ds.sortBy(d => (-d._4, d._1))
      val prefix = ordered.scanLeft(0L)(_ + _._3).tail.zip(ordered)
        .takeWhile(_._1 <= budget).map(_._2)
      val (gotBudget, nSel, tokSel) = census(src)
      assert(gotBudget == budget, s"$src: budget")
      assert(nSel == prefix.length.toLong, s"$src: prefix length")
      assert(tokSel == prefix.map(_._3).sum, s"$src: selected tokens")
      // maximality: the next doc in quality order would burst the budget
      if (prefix.length < ordered.length)
        assert(tokSel + ordered(prefix.length)._3 > budget,
          s"$src: selection stopped early — not maximal")
    }
  }
}

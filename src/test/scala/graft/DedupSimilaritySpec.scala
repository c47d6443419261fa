package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** LSH paths vs their exact baselines on sf0.001 (500 docs / 500 vectors). */
class DedupSimilaritySpec extends SparkSpec {

  test("MinHash LSH finds every lang-blocked brute-force pair, with equal jaccard") {
    val brute = Dedup.dedupNgramJaccard(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Dedup.dedupMinhashLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // brute is lang-blocked, LSH is global: brute ⊆ lsh, scores identical
    brute.foreach { case (pair, j) =>
      assert(lsh.contains(pair), s"LSH missed brute pair $pair")
      assert(lsh(pair) === j)
    }
    // every LSH pair genuinely clears the threshold
    lsh.values.foreach(j => assert(j >= 0.4))
  }

  test("SimHash bands find the high-similarity Jaccard pairs (hamming<=3 exhaustive)") {
    val near = Dedup.dedupMinhashLsh(spark, sfDir).filter(col("jaccard") >= 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.dedupSimhash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // near-identical token bags should collapse to near-identical simhashes
    val found = near.count(sim.contains)
    assert(near.isEmpty || found >= near.size / 2,
      s"simhash found only $found of ${near.size} high-jaccard pairs")
  }

  test("exact dedup collapses replicated docs to one survivor with min key") {
    val rows = Dedup.dedupExact(spark, sfDir).collect()
    assert(rows.forall(_.getLong(0) < 100000L), "survivor must be the original key")
    val copies = rows.map(_.getLong(1)).toSeq
    assert(copies.forall(c => c === 1L || c === 2L))
    assert(copies.count(_ === 2L) > 0)
  }

  test("LSH top-k returns a subset of exact scores and beats random probing") {
    val brute = Similarity.simTopkBrute(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bruteAll = brute.keySet
    val lsh = Similarity.simLshTopk(spark, sfDir).collect()
    // every LSH hit that is also a brute hit must carry the identical score
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      brute.get(key).foreach(exact => assert(r.getDouble(2) === exact))
    }
    // recall floor: at least 1 of the exact top-3 across the 5 queries
    val hits = lsh.count(r => bruteAll.contains((r.getLong(0), r.getLong(1))))
    assert(hits >= 1, s"LSH recall collapsed: $hits overlapping pairs")
  }

  test("IVF top-k returns exact scores for its hits and nontrivial recall") {
    val brute = Similarity.simTopkBrute(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = Similarity.simIvfTopk(spark, sfDir).collect()
    ivf.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      brute.get(key).foreach(exact => assert(r.getDouble(2) === exact))
    }
    val hits = ivf.count(r => brute.contains((r.getLong(0), r.getLong(1))))
    // nprobe=4 of k=16 cells probes ~25% of candidates; top-1 neighbors
    // concentrate in the nearest cells, so recall must beat that share
    assert(hits >= 5, s"IVF recall too low: $hits of ${brute.size}")
    info(s"IVF recall@3: $hits/${brute.size}")
  }
}

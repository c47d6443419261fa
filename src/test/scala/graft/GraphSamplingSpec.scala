package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.{GraphOps, LayoutOps, SamplingOps, Similarity}

/** Semantics of the round-10 additions: the Efraimidis–Spirakis weighted
  * sampler, the rendezvous-sharding audit, trade-graph PageRank, and the
  * Matryoshka prefix-dim retrieval gate. (Cross-engine parity is the
  * driver oracle's job; these pin the operator-level invariants.)
  */
class GraphSamplingSpec extends SparkSpec {

  test("sample_weighted: exactly k rows, dense ranks, biased toward long docs, deterministic") {
    val k = 20
    val out = SamplingOps.sampleWeighted(spark, sfDir, k).cache()
    try {
      assert(out.count() == k)
      val rks = out.select("rk").collect().map(_.getLong(0)).sorted
      assert(rks.sameElements(Array.tabulate(k)(i => (i + 1).toLong)), "ranks must be dense 1..k")
      val sampleMean = out.agg(avg("n_chars")).head.getDouble(0)
      val corpusMean = Tables.documents(spark, sfDir).agg(avg("n_chars")).head.getDouble(0)
      assert(sampleMean > corpusMean,
        s"n_chars^0.5-weighted sample mean $sampleMean should exceed corpus mean $corpusMean")
      val again = SamplingOps.sampleWeighted(spark, sfDir, k)
      assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    } finally out.unpersist()
  }

  test("sample_weighted matches a from-first-principles driver recomputation of the A-ES keys") {
    def md5Top32(x: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(x.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val docs = Tables.documents(spark, sfDir).select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = docs.map { case (id, nc) =>
      val u = (md5Top32(id.toString) + 1.0) / 4294967296.0
      (math.log(u) / math.pow(nc.toDouble, 0.5), id)
    }.sortBy { case (key, id) => (-key, id) }.take(20).map(_._2).toSet
    val got = SamplingOps.sampleWeighted(spark, sfDir, 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
  }

  test("shard_rendezvous: movers land only on the new shards and move far less than mod-hash") {
    val r = LayoutOps.shardRendezvous(spark, sfDir).head()
    val n = r.getAs[Long]("n_docs")
    val moved = r.getAs[Long]("rw_moved")
    assert(n > 0)
    // the minimal-disruption guarantee: every mover's new home is shard 8 or 9
    assert(moved == r.getAs[Long]("rw_moved_to_new"))
    assert(moved < r.getAs[Long]("mod_moved"),
      "rendezvous must relocate fewer keys than mod-hash on 8->10 growth")
    // expectation 2/10 of keys; generous band for a small fixture
    assert(moved >= n / 25 && moved <= n * 2 / 5, s"moved=$moved of n=$n outside the 2/10 band")
    assert(r.getAs[Long]("rw_min_occ8") >= 1, "no shard should be empty")
  }

  test("graph_pagerank: a (sub-)distribution with the teleport floor, mass bounded by 1") {
    val rows = GraphOps.pageRank(spark, sfDir).collect()
    val nNations = Tables.nation(spark, sfDir).count().toInt
    assert(rows.length == nNations)
    val ranks = rows.map(_.getAs[Double]("pagerank"))
    val base = 0.15 / nNations
    assert(ranks.forall(_ >= base - 1e-9), "every node keeps at least the teleport mass")
    val total = ranks.sum
    // mass is conserved when no nation is dangling; leaks only through
    // dangling nations (none in TPC-H data) and 6dp rounding
    assert(total <= 1.0 + 1e-4 && total >= 0.5, s"total rank mass $total out of range")
    assert(ranks.max > base * 2, "the trade graph should concentrate rank somewhere")
  }

  test("sim_matryoshka: overlap@10 in range, wider prefixes no worse in aggregate") {
    val rows = Similarity.simMatryoshka(spark, sfDir).collect()
    val nQueries = rows.map(_.getAs[Long]("query_id")).distinct.length
    assert(rows.length == nQueries * 3)
    assert(rows.forall { r =>
      val o = r.getAs[Long]("overlap10"); o >= 0 && o <= 10
    })
    val byDim = rows.groupBy(_.getAs[Long]("prefix_dim"))
      .view.mapValues(_.map(_.getAs[Long]("overlap10")).sum).toMap
    assert(byDim(32L) >= byDim(8L),
      s"aggregate overlap should not degrade with a wider prefix: $byDim")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Gates for the IVF-blocked all-pairs kNN join: the blocking must prune
  * (otherwise it IS the brute-force cross join), the surviving scores must
  * be EXACT (blocking changes which pairs are scored, never the score),
  * and recall of the true top-3 must clear a measured floor. The floor is
  * data-dependent: this corpus's typical top-3 neighbor sits near cosine
  * 0.33 (near-orthogonal), which is the hard regime for any ANN blocker.
  * At the r10 assignment default (6 of 32 — the measured knee from
  * `RecallProbe`, lifted off r9's 5 per the r9 verdict) global recall is
  * 0.966 at sf0.01; the gate asserts a 0.90 floor (headroom for
  * centroid-sample jitter) so a regression in assignment or blocking
  * shows up. The candidate-rate ceiling is likewise the measured 0.723 +
  * headroom: on noise-floor data high recall is BOUGHT with candidate
  * volume (the r8 8/15-recall default pruned to 0.26), and the regime
  * where the blocker prunes hard is pinned separately by the
  * clustered-corpus test below.
  */
class KnnJoinSpec extends SparkSpec {

  private def bruteTop3(): Map[Long, Seq[(Long, Double)]] = {
    val e = graft.engine.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val en = e.map { case (k, v) => k -> unit(v) }
    en.map { case (i, vi) =>
      val sims = en.collect { case (j, vj) if j != i =>
        j -> vi.zip(vj).map { case (a, b) => a * b }.sum
      }.toSeq
      // mirror the query's tie-break: rounded score desc, then neighbor id
      val rounded = sims.map { case (j, s) => (j, math.floor(s * 1e6 + 0.5) / 1e6) }
      i -> rounded.sortBy { case (j, s) => (-s, j) }.take(3)
    }
  }

  test("knn_join_ivf: exact scores, k rows per vector, measured recall floor") {
    val knn = Similarity.knnJoinIvf(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"),
        r.getAs[Double]("cos_sim"), r.getAs[Long]("rank")))
    val brute = bruteTop3()
    val n = brute.size

    // every vector reports at least one neighbor, never more than k
    val byVec = knn.groupBy(_._1)
    assert(byVec.size === n, s"${n - byVec.size} vectors produced no neighbors")
    byVec.values.foreach { rs =>
      assert(rs.length <= 3)
      assert(rs.map(_._4).sorted.toSeq === (1L to rs.length).toSeq)
    }

    // scores are exact: each reported cosine equals the brute-force cosine
    val bruteAll = brute // top-3 only covers top pairs; recompute per pair
    val e = graft.engine.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def unit(v: Array[Double]) = { val m = math.sqrt(v.map(x => x * x).sum); v.map(_ / m) }
    val en = e.map { case (k, v) => k -> unit(v) }
    knn.foreach { case (a, b, s, _) =>
      val exact = en(a).zip(en(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(math.floor(exact * 1e6 + 0.5) / 1e6 - s) < 1e-9,
        s"pair ($a,$b): reported $s, exact $exact")
    }

    // recall of the true top-3 neighbor sets
    val found = knn.map(t => (t._1, t._2)).toSet
    val hits = brute.toSeq.map { case (i, nbrs) => nbrs.count(p => found((i, p._1))) }.sum
    val recall = hits.toDouble / (3 * n)
    assert(recall >= 0.90, f"kNN recall $recall%.3f below floor 0.90")
    assert(bruteAll.nonEmpty)
  }

  test("emb_neardup_clusters_blocked == brute clusters (exact edges at the 0.4 threshold)") {
    // the triangle-inequality bound guarantees every threshold edge is a
    // candidate, so the blocked cluster collapse must reproduce the brute
    // crossJoin clusters EXACTLY, not approximately — this is the
    // agreement gate that lets the blocked query replace the baseline at
    // scale (multi-probe IVF was measured and rejected here: 3/32 probes
    // recover only 47/66 fixture edges at this noise-floor threshold)
    val brute = Similarity.embNearDupClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq.sorted
    val blocked = Similarity.embNearDupClustersBlocked(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq.sorted
    assert(brute.nonEmpty, "fixture produced no near-dup clusters — gate is vacuous")
    assert(blocked === brute)
  }

  test("blocked near-dup edge generator plans a keyed cell join, no cartesian product") {
    val phys = Similarity.embNearDupEdgesBlocked(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"),
      "blocked edge generator regressed to an all-pairs plan")
  }

  test("triangle-bound blocking: exact for arbitrary centroids, prunes a clustered corpus") {
    import spark.implicits._
    val dim = 16; val nClusters = 10; val perCluster = 20
    val rnd = new scala.util.Random(42)
    def unit(v: Array[Double]) = { val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n) }
    // orthogonal cluster directions; members = direction + bounded noise
    val dirs = Array.tabulate(nClusters) { c =>
      val v = new Array[Double](dim); v(c) = 1.0; v
    }
    val vecs = for (c <- 0 until nClusters; i <- 0 until perCluster) yield {
      val v = dirs(c).map(_ + (rnd.nextDouble() - 0.5) * 0.2)
      ((c * perCluster + i).toLong, unit(v).toSeq)
    }
    val emb = vecs.toDF("vec_id", "e")
      .select(col("vec_id"), col("e").cast("array<double>").as("e"))
    val cand = Similarity.nearDupCandidatesBlocked(emb, dirs.map(unit), 0.9)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1)))

    // exactness: every rounded-cosine >= 0.9 edge is among the candidates
    val en = vecs.map { case (id, e) => id -> e.toArray }.toMap
    val all = for (a <- en.keys.toSeq.sorted; b <- en.keys.toSeq.sorted if a < b) yield (a, b)
    val edges = all.filter { case (a, b) =>
      val d = en(a).zip(en(b)).map { case (x, y) => x * y }.sum
      math.floor(d * 1e6 + 0.5) / 1e6 >= 0.9
    }
    assert(edges.nonEmpty, "clustered corpus produced no edges — gate is vacuous")
    val candSet = cand.toSet
    edges.foreach(e => assert(candSet(e), s"edge $e missed by the triangle bound"))

    // pruning: tight clusters must keep candidates well under all-pairs
    // (this is the regime the fixture can't exercise — its threshold sits
    // at the noise floor, where no exact blocker can prune)
    val frac = cand.length.toDouble / all.size
    assert(frac <= 0.2, f"clustered corpus admitted $frac%.3f of all pairs")
  }

  test("knn_join_ivf blocking prunes: candidate pairs well under the cross join") {
    val nVec = graft.engine.Tables.embeddings(spark, sfDir).count()
    val cand = Similarity.knnJoinCandidates(spark, sfDir).count()
    val allPairs = nVec * (nVec - 1) / 2
    val rate = cand.toDouble / allPairs
    assert(rate <= 0.78, f"blocking passes $rate%.3f of all pairs — not pruning")
    assert(cand > 0)
  }

  test("sim_ivf_stored: served rows equal the in-memory probe; the scan prunes to the probed cells") {
    val served = Similarity.simIvfStored(spark, sfDir)
    val rows = served.collect()
    // identical to the in-memory path's query-0 slice — the persisted
    // index quantizes and ranks exactly like the live one
    val mem = Similarity.simIvfTopk(spark, sfDir).collect()
      .filter(_.getLong(0) == 0L)
    assert(rows.map(_.toSeq).toSeq == mem.map(_.toSeq).toSeq,
      s"stored-index serve drifted from the in-memory probe:\n" +
        s"  stored: ${rows.mkString(", ")}\n  memory: ${mem.mkString(", ")}")

    // the layout claim: the candidates scan lists ONLY the probed cell
    // partitions (static PartitionFilters), not the whole index
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell#") || plan.contains("PartitionFilters: [cell "),
      s"candidates scan carries no partition filter:\n$plan")
    val helper = new org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {}
    val scans = helper.collectWithSubqueries(served.queryExecution.executedPlan) {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec
          if sc.relation.partitionSchema.nonEmpty => sc
    }
    assert(scans.nonEmpty, "no partitioned scan in the served plan")
    val root = Similarity.ivfStoredRoot(spark, sfDir)
    val totalCells = new java.io.File(s"$root/candidates").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("cell="))
    val listedFiles = scans.map(_.metrics("numFiles").value).sum
    val totalFiles = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$root/candidates"))
        .count(_.getName.endsWith(".parquet"))
    }
    assert(totalCells == 16, s"index must persist 16 cell partitions, got $totalCells")
    assert(listedFiles < totalFiles,
      s"scan listed $listedFiles of $totalFiles files — no partitions pruned")
  }

  test("sim_ivf_append: delta appends into the live layout; serving needs it; base files untouched") {
    // sf0.01: the fixture whose VALUES pin puts two of the three served
    // neighbors (365, 387) in the delta — at sf0.001 query 0's top-3
    // happens to predate the split, which would make the
    // delta-relevance assertion vacuous
    val probeSf = "/root/testdata/sf0.01"
    val appended = Similarity.simIvfAppend(spark, probeSf).collect()
    val stored = Similarity.simIvfStored(spark, probeSf).collect()
    assert(appended.map(_.toSeq).toSeq == stored.map(_.toSeq).toSeq,
      "append-maintained index must serve exactly the full-build rows")

    val root = Similarity.ivfAppendRoot(spark, probeSf)
    // physical append evidence: some cell directory holds files from
    // BOTH writes (base + delta), i.e. more than one parquet file
    val cellDirs = new java.io.File(s"$root/candidates").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    val multiFile = cellDirs.count(d =>
      d.listFiles().count(_.getName.endsWith(".parquet")) > 1)
    assert(multiFile > 0, "no cell directory shows an appended file")

    // the pin is non-vacuous: the base alone (cand_id < split) serves a
    // DIFFERENT top-3 — two pinned neighbors live in the delta
    import org.apache.spark.sql.functions._
    val baseOnly = spark.read.parquet(s"$root/candidates")
      .filter(col("cand_id") < Similarity.ivfAppendSplit)
    val served = appended.map(_.getLong(1)).toSet
    val baseIds = baseOnly.select("cand_id").collect().map(_.getLong(0)).toSet
    assert(served.exists(!baseIds.contains(_)),
      "every served neighbor predates the append — the delta is dead weight")
  }
}

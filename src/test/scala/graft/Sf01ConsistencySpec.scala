package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Cross-checks of the scale-path operators against their exact baselines
  * at sf0.1 (5000 docs / 2000 vectors) — ten times the data the unit
  * suites use, exercising real bucket collision rates and multi-partition
  * shuffles.
  */
class Sf01ConsistencySpec extends SparkSpec {
  private val bigDir = "/root/testdata/sf0.1"

  test("sf0.1: MinHash LSH superset of lang-blocked brute force, identical scores") {
    val brute = Dedup.dedupNgramJaccard(spark, bigDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Dedup.dedupMinhashLsh(spark, bigDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(brute.nonEmpty, "expected planted near-dups at sf0.1")
    brute.foreach { case (pair, j) =>
      assert(lsh.contains(pair), s"LSH missed $pair")
      assert(lsh(pair) === j)
    }
  }

  test("sf0.1: LSH and IVF top-k scores agree with brute force on shared pairs") {
    val brute = Similarity.simTopkBrute(spark, bigDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    Seq[(org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame](
      Similarity.simLshTopk, Similarity.simIvfTopk(_, _), Similarity.simPqTopk).foreach { variant =>
      variant(spark, bigDir).collect().foreach { r =>
        brute.get((r.getLong(0), r.getLong(1)))
          .foreach(exact => assert(r.getDouble(2) === exact))
      }
    }
  }

  test("sf0.1: split fractions approach 80/10/10 at 5000 docs") {
    val n = graft.engine.Tables.documents(spark, bigDir).count().toDouble
    val frac = graft.operators.OrderingOps.splitAssign(spark, bigDir)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / n).toMap
    assert(math.abs(frac("train") - 0.8) < 0.03, frac.toString)
    assert(math.abs(frac.getOrElse("val", 0.0) - 0.1) < 0.02, frac.toString)
    assert(math.abs(frac.getOrElse("test", 0.0) - 0.1) < 0.02, frac.toString)
  }

  test("sf0.1: shuffle_blocks stays a dense permutation across many blocks") {
    val out = graft.operators.OrderingOps.shuffleBlocks(spark, bigDir)
    val n = out.count()
    val stats = out.agg(min("global_pos"), max("global_pos"),
      countDistinct("global_pos"), countDistinct("block")).collect().head
    assert(stats.getLong(0) === 1L && stats.getLong(1) === n)
    assert(stats.getLong(2) === n)
    // 5000 keys over 256 hash-prefix blocks: essentially all blocks hit
    assert(stats.getLong(3) > 200, s"only ${stats.getLong(3)} blocks used")
  }

  test("sf0.1: native as-of join == window composition (100k events)") {
    val a = graft.operators.AsofOps.asofClicks(spark, bigDir).collect()
    val b = graft.operators.AsofOps.asofClicksNative(spark, bigDir).collect()
    assert(a.length == b.length && a.length > 1000)
    assert(a.sameElements(b))
  }

  test("sf0.1: range-join tiers agree (pair join == sweep-line)") {
    val pair = graft.operators.RangeOps.rangeJoinInflight(spark, bigDir).collect()
    val sweep = graft.operators.RangeOps.rangeCountSweep(spark, bigDir).collect()
    assert(pair.length == sweep.length && pair.length > 1000)
    assert(pair.sameElements(sweep))
  }

  test("sf0.1: emb cluster collapse converges and every pair lands in one cluster") {
    val pairs = Similarity.embNearDupPairs(spark, bigDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val roots = Similarity.embNearDupClusters(spark, bigDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(roots(a) === roots(b), s"pair ($a,$b) split across clusters")
    }
    roots.foreach { case (_, r) => assert(roots(r) === r, "root must be its own root") }
  }

  test("sf0.1: blocked cluster collapse == brute (triangle bound at 2000 vectors)") {
    val brute = Similarity.embNearDupClusters(spark, bigDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq.sorted
    val blocked = Similarity.embNearDupClustersBlocked(spark, bigDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq.sorted
    assert(brute.nonEmpty)
    assert(blocked === brute)
  }

  test("sf0.1: semantic-dedup collapse counts partition the whole corpus") {
    // every doc lands in exactly one survivor's n_collapsed (clustered
    // docs via their cluster, embedding-less docs as singletons), so the
    // kept set's counts must sum to the corpus size
    val kept = graft.operators.CorpusOps.corpusSemanticDedup(spark, bigDir).collect()
    val total = graft.engine.Tables.documents(spark, bigDir).count()
    assert(kept.map(_.getLong(4)).sum === total)
    assert(kept.length < total, "expected at least one collapsed cluster")
  }

  test("sf0.1: salted join == plain join over 600k lineitems") {
    val salted = graft.operators.SkewOps.saltedJoin(spark, bigDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val o = graft.engine.Tables.orders(spark, bigDir)
    val li = graft.engine.Tables.lineitem(spark, bigDir)
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        graft.functions.Scalars.roundTo(sum("l_extendedprice"), 2).as("tp"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted === plain)
  }

  test("sf0.1: lifecycle invariants hold over the full event stream") {
    // funnel monotone at 10x the unit-suite data
    val f = graft.operators.EventLifecycleOps.funnelSteps(spark, bigDir)
      .orderBy("step").collect().map(_.getLong(1))
    assert(f(0) >= f(1) && f(1) >= f(2), s"funnel not monotone: ${f.toSeq}")
    // SCD2 intervals stay contiguous and single-current per user
    val scd = graft.operators.EventLifecycleOps.scd2Intervals(spark, bigDir)
      .orderBy("user_id", "version").collect()
    scd.groupBy(_.getLong(0)).foreach { case (u, rs) =>
      assert(rs.count(_.getLong(5) == 1L) == 1, s"user $u current != 1")
      rs.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(4) == b.getLong(3), s"user $u gap")
        case _           => ()
      }
    }
  }

  test("sf0.1: k-means partitions all 2000 vectors; prune stays inside the global truth") {
    val total = graft.engine.Tables.embeddings(spark, bigDir).count()
    val km = graft.operators.Clustering.embKmeans(spark, bigDir).collect()
    assert(km.map(_.getLong(1)).sum == total, "k-means summary must cover every vector")
    val (_, hist) = graft.operators.Clustering.trained(spark, bigDir)
    hist.sliding(2).foreach { case Seq(a, b) =>
      // 2^-20 = the objective's grid-snap quantum (see ClusteringSpec)
      assert(b >= a - math.pow(2, -20), s"Lloyd objective regressed at sf0.1: $hist")
    }
    val cov = graft.operators.Clustering.semdedupCoverage(spark, bigDir).collect().head
    assert(cov.getLong(0) == total)
    assert(cov.getLong(1) <= cov.getLong(2),
      "within-cluster prune exceeded the global rule — subset invariant broken")
  }

  test("sf0.1: kmv_merge_stress saturates every group (k_used = k) inside the 3-sigma error band") {
    // the k=4096 twin must actually cycle the buffer at this SF (110k
    // distinct orderkeys per flag): every group saturates, and the
    // (k-1)*2^48 div h_k estimate stays within ~3 sigma = 500 bp of the
    // exact count (sigma ~= 1/sqrt(k-2) ~= 156 bp at k=4096)
    val rows = graft.operators.ProfilingOps.kmvMergeStress(spark, bigDir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("k_used") == 4096L,
        s"group ${r.getString(0)} did not saturate: ${r.getAs[Long]("k_used")}")
      assert(r.getAs[Long]("exact") > 4096L)
      val err = r.getAs[Long]("err_bp")
      assert(math.abs(err) <= 500L,
        s"KMV estimate off by $err bp on group ${r.getString(0)}")
    }
  }

  test("sf0.1: bottom-k quantile sample stays within 800 bp of the exact selection") {
    val rows = graft.operators.ProfilingOps.bottomkQuantileSketch(spark, bigDir).collect()
    assert(rows.length == 5)
    assert(rows.map(_.getDouble(0)).toSeq == Seq(0.25, 0.5, 0.75, 0.9, 0.99))
    // quantile estimates are monotone in p and inside the sampling band
    val qs = rows.map(_.getAs[Double]("sample_q"))
    assert(qs.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    rows.foreach { r =>
      val ratio = r.getAs[Long]("ratio_bp")
      assert(math.abs(ratio - 10000L) <= 800L,
        s"bottom-k quantile off by ${ratio - 10000L} bp at p=${r.getDouble(0)}")
    }
    // scale-honesty plan pin (r13): the only GLOBAL-order window in the
    // plan is the k-row sample's (bounded by k at any corpus size); the
    // exact-population leg ranks WITHIN deterministic value buckets, so
    // no task ever sorts the population
    val windows = graft.operators.ProfilingOps.bottomkQuantileSketch(spark, bigDir)
      .queryExecution.sparkPlan.collect {
        case we: org.apache.spark.sql.execution.window.WindowExec => we
        case wg: org.apache.spark.sql.execution.window.WindowGroupLimitExec => wg
      }
    val (global, keyed) = windows.partition {
      case we: org.apache.spark.sql.execution.window.WindowExec =>
        we.partitionSpec.isEmpty
      case wg: org.apache.spark.sql.execution.window.WindowGroupLimitExec =>
        wg.partitionSpec.isEmpty
      case _ => false
    }
    assert(global.size <= 1,
      s"more than one single-task window in the plan: ${global.map(_.nodeName)}")
    assert(keyed.nonEmpty,
      "the population rank must be a bucket-partitioned window, not a global sort")
  }

  test("sf0.1: the analytics wave holds its invariants at 20k-node / 5000-doc scale") {
    import graft.operators.{GraphOps, OrderingOps}
    // triangles: 20 distinct parts, counts positive and non-increasing
    val tri = GraphOps.triangles(spark, bigDir).collect()
    assert(tri.length == 20 && tri.map(_.getLong(0)).distinct.length == 20)
    assert(tri.forall(_.getLong(1) > 0))
    assert(tri.map(_.getLong(1)).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    // k-core: the relative threshold keeps a strict, non-empty core
    val core = GraphOps.kCore(spark, bigDir).collect()
    assert(core.length == 20 && core.forall(_.getLong(1) > 0))
    // pareto: the staircase invariant (both axes strictly increasing)
    val pf = OrderingOps.paretoFrontier(spark, bigDir).collect()
    assert(pf.nonEmpty)
    assert(pf.map(_.getDouble(0)).sliding(2).forall(w => w.length < 2 || w(0) < w(1)))
    assert(pf.map(_.getInt(1)).sliding(2).forall(w => w.length < 2 || w(0) < w(1)))
    // split health: a hash split must show near-zero drift at 4500 docs
    // (two-sample KS 95% band for ~4000/500 is ~0.066; 0.1 = red-flag bar)
    val ks = OrderingOps.splitKs(spark, bigDir).head()
    assert(ks.getAs[Double]("ks_stat") < 0.1,
      s"hash split drifted: KS=${ks.getAs[Double]("ks_stat")}")
    // phrase search: ranks dense 1..<=3 within each of the 5 phrases
    val ph = graft.operators.LexiconOps.phraseSearch(spark, bigDir).collect()
    val byPhrase = ph.groupBy(_.getString(0))
    assert(byPhrase.size == 5)
    byPhrase.values.foreach { rows =>
      assert(rows.map(_.getLong(1)).sorted.sameElements(
        Array.tabulate(rows.length)(i => (i + 1).toLong)))
    }
    // coreset: 16 distinct picks, radii non-increasing and positive
    val cs = graft.operators.Clustering.coresetKcenter(spark, bigDir).collect()
    assert(cs.map(_.getLong(1)).distinct.length == 16)
    val radii = cs.flatMap(r => if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    assert(radii.forall(_ > 0))
    assert(radii.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    // pca: ratios in (0,1), eigenvalues non-increasing, 8 ranks
    val pca = graft.operators.Clustering.embPca(spark, bigDir).collect()
    assert(pca.length == 8)
    val evs = pca.map(_.getAs[Double]("eigenvalue"))
    assert(evs.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    assert(pca.map(_.getAs[Double]("var_ratio")).forall(r => r > 0 && r < 1))
  }
}

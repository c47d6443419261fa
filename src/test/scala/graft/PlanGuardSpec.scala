package graft

import graft.operators.{Dedup, Similarity}

/** Plan-shape regression guards for the dedup/similarity family — round 2
  * proved these two queries are where scale-killers creep in (corpus-wide
  * verify inside the LSH path; an interpreted signature pass). These specs
  * pin the OPTIMIZED/physical plan shapes so a refactor that quietly
  * reintroduces either pattern fails loudly.
  */
class PlanGuardSpec extends SparkSpec {

  private def plans(df: org.apache.spark.sql.DataFrame): (String, String) =
    (df.queryExecution.optimizedPlan.toString, df.queryExecution.executedPlan.toString)

  test("dedup_minhash_lsh: candidate-driven verify, no corpus-wide pair aggregation") {
    val (opt, phys) = plans(Dedup.dedupMinhashLsh(spark, sfDir))
    // the corpus-wide exact pass groups postings per shingle into arrays
    // (collect_list) and explodes all co-occurring pairs; the LSH path must
    // never contain it — its verify joins candidates back to postings
    assert(!opt.toLowerCase.contains("collect_list"),
      "LSH verify regressed to the corpus-wide pairJaccard pass")
    assert(!phys.contains("CartesianProduct"), "cartesian product in MinHash LSH plan")
  }

  test("raw postings are a MAP-ONLY stage (shingle kernel, no exchange)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val phys = Dedup.rawPostingsOf(docs).queryExecution.executedPlan.toString
    assert(phys.toLowerCase.contains("shinglehashes"),
      "postings no longer use the ShingleHashes kernel")
    assert(!phys.contains("Exchange"),
      "postings regressed to a shuffling formulation (window/distinct)")
  }

  test("dedup_ngram_jaccard (the exact baseline) is the one allowed corpus-wide pass") {
    val (opt, _) = plans(Dedup.dedupNgramJaccard(spark, sfDir))
    assert(opt.toLowerCase.contains("collect_list"),
      "baseline lost its inverted-index shape — update PlanGuardSpec if intentional")
  }

  test("sim_lsh_topk: compact signature kernel, keyed band join, no cartesian") {
    val (opt, phys) = plans(Similarity.simLshTopk(spark, sfDir))
    // the 160-plane signature must stay ONE HyperplaneSignature kernel —
    // 160 inlined per-plane projections exceed HotSpot's huge-method limit
    // and run interpreted (~6.5x, VERDICT r2 #2)
    assert(opt.toLowerCase.contains("hyperplanesignature"),
      "signature pass no longer uses the HyperplaneSignature kernel")
    assert(!opt.contains("element_at(__planes"),
      "signature pass regressed to nested-literal element_at indexing")
    assert(!phys.contains("CartesianProduct"), "cartesian product in LSH top-k plan")
  }

  test("window top-k queries keep Spark's native WindowGroupLimit heap pushdown") {
    // rank-filter-over-window is planned with per-partition heaps
    // (InferWindowGroupLimit, Spark 3.5+) — pin it so a formulation change
    // doesn't silently fall back to full per-partition sorts. (This is why
    // the engine does NOT ship a custom top-k-per-key strategy: the
    // built-in already plans the bounded-heap shape.)
    val phys = graft.operators.Relational.w1LatestPerUserWindow(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(phys.contains("WindowGroupLimit"), phys)
  }

  test("lm_score: trigram extraction stays the O(n) CharTrigrams kernel") {
    val phys = graft.operators.LexiconOps.lmScore(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(phys.toLowerCase.contains("chartrigrams"),
      "lm_score regressed to the interpreted quadratic HOF trigram pass")
  }

  test("q5: nation/region stay hint-broadcast, customer join is left to the planner") {
    val df = graft.operators.Relational.q5RegionRevenue(spark, sfDir)
    val opt = df.queryExecution.optimizedPlan.toString
    // exactly the two dimension hints survive into the optimized joins —
    // a third would mean the fixture-scale customer broadcast was re-forced
    // (at 100 TB customer is corpus-sized; its strategy belongs to the
    // planner/AQE, not a hardcoded hint)
    val hints = "strategy=broadcast".r.findAllIn(opt).length
    assert(hints == 2, s"expected 2 broadcast hints (nation, region), got $hints:\n$opt")
  }

  test("contamination_bloom: the sketch pre-screen sits in the plan, results equal the exact path") {
    val df = Dedup.contaminationBloom(spark, sfDir)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.toLowerCase.contains("might_contain") || phys.contains("BloomFilterMightContain"),
      "bloom pre-screen disappeared from the plan")
    val exact = Dedup.contaminationCheck(spark, sfDir)
    assert(df.exceptAll(exact).isEmpty && exact.exceptAll(df).isEmpty,
      "bloom variant diverged from the exact path")
  }

  test("semdedup_prune: cluster-keyed join over ONE materialized assignment, no cartesian") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
    val helper = new AdaptiveSparkPlanHelper {}
    val df = graft.operators.Clustering.semdedupPrune(spark, sfDir)
    df.collect() // finalize the AQE physical plan so the scans are visible
    val phys = df.queryExecution.executedPlan
    assert(!phys.toString.contains("CartesianProduct"),
      "within-cluster self-join regressed to a cartesian — the join must key on cluster")
    // every ExistingRDD scan must read the SAME localCheckpoint RDD: a second
    // distinct RDD means the assignment (argmax + cluster shuffle) ran twice
    val rddIds = helper.collectWithSubqueries(phys) {
      case r: org.apache.spark.sql.execution.RDDScanExec => r.rdd.id
    }
    assert(rddIds.nonEmpty && rddIds.distinct.size == 1,
      s"expected one shared assignment checkpoint, got RDD ids $rddIds")
  }

  test("emb_kmeans summary: map-side partial aggregation, no cartesian") {
    val df = graft.operators.Clustering.embKmeans(spark, sfDir)
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"))
    // partial + final HashAggregate around the cluster exchange — the same
    // map-side-combine topology each Lloyd iteration relies on
    assert("HashAggregate".r.findAllIn(phys).length >= 2,
      s"expected partial+final aggregation:\n$phys")
  }

  test("graph_pagerank: every per-iteration join broadcasts, zero sort-merge joins") {
    val df = graft.operators.GraphOps.pageRank(spark, sfDir)
    df.collect() // finalize AQE
    val phys = df.queryExecution.executedPlan.toString
    // ranks and contrib are both |V|-bounded: an SMJ means an iteration
    // regressed to shuffling the edge table against a 25-row side
    assert(!phys.contains("SortMergeJoin"),
      "pagerank iteration planned a sort-merge join — broadcast hint lost")
    assert(!phys.contains("CartesianProduct"))
    assert(phys.contains("BroadcastHashJoin"), "expected broadcast rank joins")
  }
}

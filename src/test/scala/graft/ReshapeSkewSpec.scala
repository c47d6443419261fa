package graft

import org.apache.spark.sql.functions._

import graft.operators.{ReshapeOps, SkewOps, WindowsAndStats}

/** Reshape (pivot/unpivot/grouping sets) and skew-mitigation operators:
  * semantic equivalences plus the plan shapes that make them scale.
  */
class ReshapeSkewSpec extends SparkSpec {

  test("pivot round-trips against its groupBy-filter rendition") {
    val piv = ReshapeOps.pivotStatusMatrix(spark, sfDir).collect()
    val flat = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag", "l_linestatus").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    piv.foreach { r =>
      val flag = r.getString(r.fieldIndex("l_returnflag"))
      assert(r.getLong(r.fieldIndex("F_n")) === flat.getOrElse((flag, "F"), 0L))
      assert(r.getLong(r.fieldIndex("O_n")) === flat.getOrElse((flag, "O"), 0L))
    }
  }

  test("pivot with explicit values plans WITHOUT an extra values-discovery scan") {
    // pivot(col) with no value list runs an eager collect job at plan TIME;
    // the explicit-values form must plan lazily as a plain aggregate chain
    val df = ReshapeOps.pivotStatusMatrix(spark, sfDir)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("HashAggregate"), "pivot lost its hash-aggregate shape")
  }

  test("unpivot emits one row per (group, metric) and inverts the wide row") {
    val rows = ReshapeOps.unpivotMetrics(spark, sfDir).collect()
    val flags = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_returnflag").distinct().count()
    assert(rows.length === flags * 3)
    val metrics = rows.map(_.getString(1)).distinct.sorted
    assert(metrics === Array("n_items", "sum_price", "sum_qty"))
  }

  test("grouping sets computes all four sets in ONE pass (single Expand, no union of scans)") {
    val df = ReshapeOps.groupingSetsAgg(spark, sfDir)
    val opt = df.queryExecution.optimizedPlan.toString
    assert("(?i)expand".r.findAllIn(opt).length >= 1, "grouping sets lost its Expand shape")
    assert(!opt.contains("Union"), "grouping sets regressed to a union-of-aggregates")
    // grand-total row present exactly once
    val total = df.filter(col("g_status") === 1 && col("g_priority") === 1).collect()
    assert(total.length === 1)
    val n = spark.read.parquet(s"$sfDir/orders.parquet").count()
    assert(total.head.getAs[Long]("n_orders") === n)
  }

  test("salted join equals the plain join and never broadcasts the replicated side") {
    val salted = SkewOps.saltedJoin(spark, sfDir).collect()
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"), sum("l_extendedprice").as("tp"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted.length === plain.size)
    salted.foreach { r =>
      val (n, tp) = plain(r.getString(0))
      assert(r.getLong(1) === n)
      assert(math.abs(r.getDouble(2) - tp) < 1e-4)
    }
    val phys = SkewOps.saltedJoin(spark, sfDir).queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastHashJoin"),
      "salted join must exercise the shuffled shape (broadcast defeats the pattern under test)")
  }

  test("salted join spreads each order key across multiple join partitions") {
    // the point of salting: one hot key's rows hash to saltFactor distinct
    // (key, salt) shuffle keys instead of one
    val salts = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"),
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(SkewOps.saltFactor)).as("salt"))
      .groupBy("l_orderkey").agg(countDistinct("salt").as("nsalts"))
      .agg(max("nsalts")).head.getLong(0)
    assert(salts > 1, "salt column is constant per key — no spreading happens")
  }

  test("skew_guided_join: profiler's factor drives the join, result equals plain join") {
    val rows = SkewOps.skewGuidedJoin(spark, sfDir).collect()
    // the emitted factor IS the profiler's recommendation
    val rec = SkewOps.skewProfile(spark, sfDir)
      .select("salt_factor").head().getLong(0)
    assert(rows.forall(_.getAs[Long]("salt_factor") == math.max(1L, rec)),
      "guided join must carry the profiled factor, not a default")
    assert(rec > 1, "fixture key distribution should recommend a factor > 1")
    // the rewrite stays pure: equals the plain unsalted join
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"), sum("l_extendedprice").as("tp"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.length === plain.size)
    rows.foreach { r =>
      val (n, tp) = plain(r.getString(0))
      assert(r.getLong(1) === n)
      assert(math.abs(r.getDouble(2) - tp) < 1e-4)
    }
    // plan shape unchanged from the hardcoded form: shuffled join, no broadcast
    val phys = SkewOps.skewGuidedJoin(spark, sfDir).queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastHashJoin"),
      "guided salted join must keep the shuffled shape")
  }

  test("two-phase salted aggregation matches direct aggregation on the fixtures") {
    val salted = SkewOps.saltedAgg(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    val direct = graft.engine.Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("s"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(salted.keySet === direct.keySet)
    direct.foreach { case (k, (n, sv)) =>
      assert(salted(k)._1 === n, s"count mismatch for user $k")
      (salted(k)._2, sv) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-6, s"sum mismatch for user $k")
        case (a, b)             => assert(a === b)
      }
    }
  }

  test("rank suite: rank/dense_rank agree on tie structure, ntile is balanced") {
    val df = WindowsAndStats.w6RankSuite(spark, sfDir).cache()
    try {
      // dense_rank never exceeds rank; both are ≥ 1
      assert(df.filter(col("bucket_dense_rank") > col("bucket_rank")).count() === 0)
      // per segment: row_number is a permutation of 1..n
      val bad = df.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), max("rn").as("mx"), countDistinct("rn").as("d"))
        .filter(col("n") =!= col("mx") || col("n") =!= col("d")).count()
      assert(bad === 0)
      // ntile bucket sizes differ by at most 1 per segment
      val spread = df.groupBy("c_mktsegment", "quartile").count()
        .groupBy("c_mktsegment").agg((max("count") - min("count")).as("spread"))
        .filter(col("spread") > 1).count()
      assert(spread === 0)
    } finally df.unpersist()
  }

  test("rank suite plans ONE hash-partitioning exchange (both windows share the segment key)") {
    val df = WindowsAndStats.w6RankSuite(spark, sfDir)
    df.collect()
    // AQE plan toString prints the final AND the initial plan — count only
    // the final section or every exchange is seen twice
    val phys = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val hashEx = "Exchange hashpartitioning".r.findAllIn(phys).length
    assert(hashEx <= 1, s"expected a single window shuffle, saw $hashEx:\n$phys")
  }

  test("top-k per group keeps the WindowGroupLimit heap pushdown") {
    val df = WindowsAndStats.t6TopkPerGroup(spark, sfDir)
    df.collect()
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("WindowGroupLimit"),
      "t6 lost the bounded-heap pushdown — the shuffle now moves the whole join output")
    // and every segment yields exactly k=3 rows on non-degenerate fixtures
    val counts = df.groupBy("c_mktsegment").count().collect().map(_.getLong(1))
    assert(counts.forall(_ === 3L))
  }
}

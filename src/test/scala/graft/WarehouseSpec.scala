package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.{ProfilingOps, WarehouseOps, WindowsAndStats}

/** The r11 warehouse/sketch wave, beyond the driver oracle: plan-shape
  * guards for the multi-join family, the IVM partition identity checked
  * against a direct Spark recompute, the KMV mergeability property, and
  * the native-session-window ↔ island-derivation twin equivalence.
  */
class WarehouseSpec extends SparkSpec {

  test("q7/q8: dims broadcast, no cartesian product in the physical plan") {
    Seq(WarehouseOps.q7NationVolume(spark, sfDir),
      WarehouseOps.q8MarketShare(spark, sfDir)).foreach { df =>
      val phys = df.queryExecution.executedPlan.toString
      assert(phys.contains("BroadcastHashJoin"), "dimension joins should broadcast")
      assert(!phys.contains("CartesianProduct"), "multi-join regressed to a cartesian")
    }
  }

  test("q1/q3/q4/q9/q10 wave: semi join survives, dims broadcast, no cartesian") {
    val q4Phys = WarehouseOps.q4OrderPriority(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(q4Phys.contains("LeftSemi"),
      "q4's EXISTS must stay a semi join, not a join+dedup")
    Seq(WarehouseOps.q3ShippingPriority(spark, sfDir),
      WarehouseOps.q9ProfitByNation(spark, sfDir),
      WarehouseOps.q10ReturnedItems(spark, sfDir)).foreach { df =>
      val phys = df.queryExecution.executedPlan.toString
      assert(phys.contains("BroadcastHashJoin"), "dimension joins should broadcast")
      assert(!phys.contains("CartesianProduct"))
    }
    // q1: the six (returnflag, linestatus) classes partition every
    // in-cutoff line — count_order must total the filtered scan
    val q1 = WarehouseOps.q1PricingSummary(spark, sfDir).collect()
    assert(q1.length == 6)
    val total = q1.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("2001-09-01")).count()
    assert(total == expected, "q1 classes must partition the filtered lineitems")
  }

  test("q19: the disjunction is projected onto BOTH scans' pushed filters") {
    // The Q19 hazard: the OR-of-ANDs references both sides, so a plan
    // that doesn't derive per-side disjunctions scans everything and
    // filters after the join. Pin the derivation: the part scan's pushed
    // filters carry the brand disjunction, the lineitem scan's carry the
    // quantity-band hull, and the join itself broadcasts (no shuffle).
    val df = WarehouseOps.q19DisjunctiveRevenue(spark, sfDir)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"), "part side should broadcast")
    assert(!phys.contains("CartesianProduct"))
    val scans = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val partScan = scans.find(_.contains("part.parquet")).getOrElse(fail("no part scan"))
    val liScan = scans.find(_.contains("lineitem.parquet")).getOrElse(fail("no lineitem scan"))
    assert(partScan.contains("Or(") && partScan.contains("Brand#1"),
      "brand/type/size disjunction did not reach the part scan's PushedFilters")
    assert(liScan.contains("Or(") && liScan.contains("l_quantity"),
      "quantity-band disjunction did not reach the lineitem scan's PushedFilters")
  }

  test("q12: the two conditional counts partition the joined lines exactly") {
    val rows = WarehouseOps.q12ShipmodePriority(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq == rows.map(_.getString(0)).sorted.toSeq)
    assert(rows.nonEmpty)
    val total = rows.map(r => r.getAs[Long]("high_line_count") +
      r.getAs[Long]("low_line_count")).sum
    val expected = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(total == expected, "high+low must cover every joined line exactly once")
  }

  test("q8: market share is a true fraction and totals are positive") {
    val rows = WarehouseOps.q8MarketShare(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("total_volume") > 0)
      val sh = r.getAs[Double]("mkt_share")
      assert(sh >= 0.0 && sh <= 1.0, s"share out of range: $sh")
    }
  }

  test("q11: every emitted part clears the 1.5x-average threshold, none missed") {
    val pv = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
        .cast("long")).as("v"))
    val cut = pv.agg(avg(col("v"))).head().getDouble(0) * 1.5
    val expected = pv.filter(col("v") > cut).count()
    val got = WarehouseOps.q11ImportantParts(spark, sfDir).count()
    assert(got == expected, s"threshold filter mismatch: $got vs $expected")
    assert(got > 0, "threshold selected nothing — gate is vacuous at this SF")
  }

  test("q15: emitted supplier(s) carry exactly the max rounded revenue") {
    val rows = WarehouseOps.q15TopSupplier(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length == 1, "all emitted rows must share the max revenue")
  }

  test("ivm: the four-term decomposition equals the direct full join exactly") {
    val inc = WarehouseOps.ivmJoinDelta(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val direct = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
      // the query's integer-cents discipline: exact under any order
      .agg((sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
          .cast("long")) / 100.0).as("revenue"),
        count(lit(1)).as("n_items"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .sortBy(_._1)
    assert(inc.toSeq == direct.toSeq,
      "incremental view maintenance diverged from the direct join")
    // the delta terms are non-trivial at this fixture (rows on both sides
    // of the watermark) — otherwise the partition identity is vacuous
    val n = Tables.orders(spark, sfDir)
      .agg(count(when(col("o_orderdate") < lit("1999-01-01"), 1)).as("old"),
        count(when(col("o_orderdate") >= lit("1999-01-01"), 1)).as("new"))
      .head()
    assert(n.getLong(0) > 0 && n.getLong(1) > 0, "watermark split is one-sided")
  }

  test("ivm property: the decomposition equals the direct join at EVERY watermark cut") {
    // edges of the data range, a mid-range cut, and cuts landing ON
    // month boundaries (the group key derives from o_orderdate, so a
    // boundary cut is the off-by-one hazard)
    val direct = WarehouseOps.ivmJoinDeltaAt(spark, sfDir, "1800-01-01").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    Seq("1995-01-01", "1996-06-15", "1998-01-01", "2001-08-01", "2100-01-01")
      .foreach { wm =>
        val inc = WarehouseOps.ivmJoinDeltaAt(spark, sfDir, wm).collect()
          .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
        assert(inc == direct, s"IVM diverged from the direct join at cut $wm")
      }
  }

  test("ivm_refresh_stored: reads the staged view, NO shuffle join, matches full recompute") {
    val df = WarehouseOps.ivmRefreshStored(spark, sfDir)
    // the 100 TB claim as a plan property: every join in the REFRESH is
    // a broadcast probe (the base fact-fact join ran once at stage time)
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("SortMergeJoin") && !phys.contains("ShuffledHashJoin"),
      "refresh plan contains a shuffle join — the stored base is being recomputed")
    val leaves = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
    assert(leaves.exists(_.contains("view_base")),
      "refresh plan does not read the staged base snapshot")
    // both delta slices are non-trivial at the fixture, or the gate is vacuous
    val wm = WarehouseOps.ivmStoredWatermark
    val nDeltaO = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit(wm)).count()
    val nDeltaL = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit(wm)).count()
    assert(nDeltaO > 0 && nDeltaL > 0, "watermark leaves an empty delta slice")
    // snapshot + three deltas reproduce the direct join cell-exactly
    val refreshed = df.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val direct = WarehouseOps.ivmJoinDelta(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(refreshed.toSeq == direct.toSeq,
      "stored-base refresh diverged from the full recompute")
  }

  test("kmv: global k-minima set IS the k smallest of the per-type union (mergeability)") {
    val k = 256
    val ev = Tables.events(spark, sfDir).filter(col("user_id").isNotNull)
    def minima(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select(conv(substring(md5(col("user_id").cast("string")), 1, 12), 16, 10)
          .cast("long").as("h"))
        .distinct().orderBy(col("h")).limit(k)
        .collect().map(_.getLong(0)).toSeq
    val global = minima(ev)
    val types = ev.select(col("event_type")).distinct().collect().map(_.getString(0))
    val merged = types.flatMap(t => minima(ev.filter(col("event_type") === t)))
      .distinct.sorted.take(k).toSeq
    assert(global == merged,
      "merging per-type KMV sketches must reproduce the global sketch")
  }

  test("KmvSketch aggregator: layout-invariant (1 vs 13 partitions) and unit rules hold") {
    import graft.functions.KmvSketch
    // unit rules: fast-path rejection, dedup, cap, merge=union-of-minima
    assert(KmvSketch.insert(Seq(1L, 5L), 3L, 4) == Seq(1L, 3L, 5L))
    assert(KmvSketch.insert(Seq(1L, 3L, 5L), 3L, 4) == Seq(1L, 3L, 5L), "dedup")
    assert(KmvSketch.insert(Seq(1L, 2L, 3L), 9L, 3) == Seq(1L, 2L, 3L), "fast path")
    assert(KmvSketch.insert(Seq(2L, 3L, 9L), 1L, 3) == Seq(1L, 2L, 3L), "cap")
    assert(KmvSketch.union(Seq(1L, 4L), Seq(1L, 2L, 9L), 3) == Seq(1L, 2L, 4L))
    // layout invariance through the real plan
    def run(parts: Int) = {
      val kmvUdaf = org.apache.spark.sql.functions.udaf(
        KmvSketch.aggregator(64), org.apache.spark.sql.Encoders.scalaLong)
      Tables.events(spark, sfDir).filter(col("user_id").isNotNull)
        .repartition(parts)
        .select(col("event_type").as("scope"),
          conv(substring(md5(col("user_id").cast("string")), 1, 12), 16, 10)
            .cast("long").as("h"))
        .groupBy("scope").agg(kmvUdaf(col("h")).as("sk"))
        .select(col("scope"), col("sk.k_used"), col("sk.kth_min"))
        .orderBy("scope").collect().toSeq
    }
    assert(run(1) == run(13), "KMV summary depends on partition layout")
  }

  test("kmv estimate: exact for small domains (k_used < k) and sane otherwise") {
    val rows = ProfilingOps.kmvDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact")
      val est = r.getAs[Long]("kmv_estimate")
      if (r.getAs[Long]("k_used") < 256)
        assert(est == exact, s"sub-k sketch must be exact: $r")
      else
        assert(math.abs(est - exact).toDouble / exact < 0.25,
          s"KMV estimate off by >25%: $r")
    }
  }

  test("native session_window twin: same session count and totals as the island form") {
    val native = WindowsAndStats.w10SessionWindow(spark, sfDir)
    val nNative = native.count()
    val nEvents = Tables.events(spark, sfDir).count()
    val sums = native.agg(sum(col("n_events"))).head().getLong(0)
    assert(sums == nEvents, "every event must land in exactly one session")
    // island derivation (the sessionize topology) agrees on the count
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts")
    val islands = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"))
      .withColumn("brk", when(lag(col("ts"), 1).over(w).isNull ||
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) > 1800000000L, 1)
        .otherwise(0))
      .agg(sum(col("brk"))).head().getLong(0)
    assert(nNative == islands,
      s"native session_window found $nNative sessions, island form $islands")
  }

  test("dynamic-gap session_window consults the per-row gap and matches the interval-union replay") {
    val dyn = WindowsAndStats.w11SessionDynGap(spark, sfDir)
    val ev = Tables.events(spark, sfDir)
    assert(dyn.agg(sum(col("n_events"))).head().getLong(0) == ev.count(),
      "every event must land in exactly one session")
    // the per-row gap is load-bearing: both fixed-gap extremes disagree
    def fixedSessions(gap: String): Long = ev
      .groupBy(col("user_id"),
        org.apache.spark.sql.functions.session_window(col("ts"), gap))
      .agg(count(lit(1))).count()
    val nDyn = dyn.count()
    assert(nDyn != fixedSessions("10 minutes") && nDyn != fixedSessions("45 minutes"),
      "dynamic result must differ from both constant-gap extremes")
    // exact interval-union replay: proposed end rides each row; a session
    // breaks where ts exceeds the running max of strictly-preceding ends
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts")
    val replay = ev
      .withColumn("t_us", unix_micros(col("ts")))
      .withColumn("e_us", col("t_us") +
        when(col("event_type") === "error", 600000000L).otherwise(2700000000L))
      .withColumn("prev_end",
        max(col("e_us")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("prev_end").isNull || col("t_us") > col("prev_end"), 1).otherwise(0))
      .withColumn("grp", sum(col("brk")).over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(min(col("t_us")).as("s_start_us"), max(col("e_us")).as("s_end_us"),
        count(lit(1)).as("n_events"),
        graft.functions.Scalars.roundTo(sum(col("value")), 2).as("sum_value"))
      .drop("grp")
      .orderBy("user_id", "s_start_us")
    assert(dyn.collect().toSeq === replay.collect().toSeq)
  }

  test("q16: anti join survives, part filters pushed, equals the distinct-pair form") {
    val df = WarehouseOps.q16PartsSuppliers(spark, sfDir)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("LeftAnti"),
      "the NOT-IN exclusion must stay an anti join")
    assert(phys.contains("BroadcastHashJoin"), "the filtered part side should broadcast")
    assert(!phys.contains("CartesianProduct"))
    // metadata strings truncate at 100 chars, so inspect dataFilters directly
    // (on the pre-adaptive plan: an AQE plan's collectLeaves is the
    // AdaptiveSparkPlanExec itself, not the scans)
    val partScan = df.queryExecution.sparkPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.metadata("Location").contains("part.parquet") => f
      }.getOrElse(fail("no part scan"))
    assert(partScan.dataFilters.exists(e =>
        e.toString.contains("p_size") && e.toString.contains("IN")),
      "the size IN-list did not reach the part scan")
    assert(partScan.dataFilters.exists(_.toString.contains("Brand#12")),
      "the brand exclusion did not reach the part scan")
    // twin recompute through the classic DISTINCT-pair staging: countDistinct
    // over the joined fact must equal count over pre-deduped pairs
    val pairs = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val excl = Tables.supplier(spark, sfDir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val twin = pairs
      .join(Tables.part(spark, sfDir)
          .filter(col("p_brand") =!= "Brand#12" &&
            !col("p_type").startsWith("MEDIUM") &&
            col("p_size").isin(3, 9, 14, 19, 23, 36, 45, 49)),
        col("l_partkey") === col("p_partkey"))
      .join(excl, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(count(lit(1)).as("supplier_cnt"))
    val got = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getInt(2)) -> r.getLong(3)).toMap
    val want = twin.collect().map(r =>
      (r.getString(0), r.getString(1), r.getInt(2)) -> r.getLong(3)).toMap
    assert(got == want, "countDistinct-over-fact must equal the distinct-pair form")
    assert(got.nonEmpty)
  }

  test("runtime bloom join: might_contain present under the confs, absent without") {
    val saved = WarehouseOps.bloomConfs.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      WarehouseOps.bloomConfs.foreach { case (k, v) => spark.conf.set(k, v) }
      val plan = WarehouseOps.bloomJoinPlan(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        "runtime bloom filter was not injected into the lineitem side")
      assert(plan.contains("bloom_filter_agg") || plan.contains("BloomFilter"),
        "no BloomFilterAggregate creation subquery in the plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
    // control: without the confs the same plan has NO bloom guard, so the
    // gate cannot silently pass on an unfiltered plan
    val bare = WarehouseOps.bloomJoinPlan(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!bare.contains("might_contain"),
      "control failed: bloom filter present without the confs")
  }

  test("q2: window-min decorrelation equals the groupBy+join-back twin, dims broadcast") {
    val df = WarehouseOps.q2MinCostSupplier(spark, sfDir)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"), "part + euro suppliers should broadcast")
    assert(!phys.contains("CartesianProduct"))
    // twin: the correlated MIN spelled as a grouped aggregate joined back
    // (the other decorrelation Catalyst could pick) — same survivors
    val costC = floor(col("l_extendedprice") * 100 / col("l_quantity") + 0.5).cast("long")
    val ps = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(costC).as("cost_c"))
    val euro = Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sfDir).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"))
    val p = Tables.part(spark, sfDir)
      .filter(col("p_size") === 16 && col("p_type").endsWith("MALL"))
      .select(col("p_partkey"))
    val cand = ps.join(p, col("l_partkey") === col("p_partkey"))
      .join(euro, col("l_suppkey") === col("s_suppkey"))
    val mins = cand.groupBy(col("p_partkey").as("mk"))
      .agg(min(col("cost_c")).as("min_c"))
    val want = cand.join(mins,
        col("p_partkey") === col("mk") && col("cost_c") === col("min_c"))
      .select(col("s_name"), col("p_partkey"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = df.collect().map(r => (r.getString(1), r.getLong(3))).toSet
    assert(got == want, "q2 survivors must match the join-back decorrelation")
    assert(got.nonEmpty, "q2 should select someone at sf0.001")
    // ties keep EVERY minimum-cost supplier: per part, all emitted costs equal
    val perPart = df.collect().groupBy(_.getLong(3))
    perPart.foreach { case (pk, rows) =>
      assert(rows.map(_.getDouble(4)).distinct.length == 1,
        s"part $pk emitted non-minimal costs")
    }
  }

  test("q20: semi join + one pair shuffle; survivors exactly match a two-agg twin") {
    val df = WarehouseOps.q20ExcessStock(spark, sfDir)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("LeftSemi"),
      "the supplier IN-list must stay a semi join, not a join+dedup")
    assert(phys.contains("BroadcastHashJoin"))
    assert(!phys.contains("CartesianProduct"))
    // twin recompute with the two correlated sums as SEPARATE aggregations
    // joined on the pair key (the un-fused spelling of the same semantics;
    // an outer join keeps avail-only pairs, which must then NULL-drop)
    val li = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir).filter(col("p_name").startsWith("red")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"), col("l_shipdate"))
    val win = col("l_shipdate") >= lit("1997-01-01") &&
      col("l_shipdate") < lit("1998-01-01")
    val demand = li.filter(win).groupBy("l_partkey", "l_suppkey")
      .agg(sum("l_quantity").as("demand"))
    val avail = li.filter(!win).groupBy("l_partkey", "l_suppkey")
      .agg(sum("l_quantity").as("avail"))
    val wantSupp = avail.join(demand, Seq("l_partkey", "l_suppkey"), "left")
      .filter(col("avail") > lit(4.0) * col("demand"))
      .select("l_suppkey").distinct().collect().map(_.getLong(0)).toSet
    val wantNames = Tables.supplier(spark, sfDir)
      .filter(col("s_suppkey").isin(wantSupp.toSeq: _*))
      .select("s_name").collect().map(_.getString(0)).sorted.toSeq
    val got = df.collect().map(_.getString(0)).toSeq
    assert(got == wantNames, "q20 survivors must match the two-aggregation twin")
    assert(got.nonEmpty, "the cover-factor predicate should select someone at sf0.001")
  }
}

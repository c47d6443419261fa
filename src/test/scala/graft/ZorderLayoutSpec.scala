package graft

import org.apache.spark.sql.functions._

import graft.operators.LayoutOps

/** The z-order layout must actually buy multi-dimensional pruning: after
  * range-partitioning files by z-key, each file's min/max span in BOTH
  * dimensions should be a small fraction of the domain — whereas a
  * one-dimensional date sort leaves the customer dimension unclustered
  * (every file spans ~the whole customer domain). Footer-stats pruning is
  * proportional to span, so tighter per-file spans = more skipped files
  * for conjunctive predicates.
  */
class ZorderLayoutSpec extends SparkSpec {

  test("zInterleave: bit-exact on known values, monotone locality") {
    import spark.implicits._
    val df = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L), (1L, 1L))
      .toDF("nx", "ny")
      .select(LayoutOps.zInterleave(col("nx"), col("ny")).as("z"))
    val got = df.collect().map(_.getLong(0)).toSeq
    // x fills even bits (0x55555555), y odd bits (0xAAAAAAAA)
    assert(got == Seq(0L, 0x55555555L, 0xAAAAAAAAL, 0xFFFFFFFFL, 3L))
  }

  test("z-clustered files have tight per-file spans in BOTH dimensions; date sort does not") {
    val o = graft.engine.Tables.orders(spark, sfDir)
      .selectExpr("o_orderkey", "o_custkey",
        "unix_micros(cast(o_orderdate AS timestamp)) div 86400000000 AS day")
    val mm = o.agg(min("o_custkey"), max("o_custkey"), min("day"), max("day")).collect().head
    val (cSpan, dSpan) =
      (mm.getLong(1) - mm.getLong(0) + 1, mm.getLong(3) - mm.getLong(2) + 1)
    val top = 65535L
    val z = LayoutOps.zInterleave(
      expr(s"((o_custkey - ${mm.getLong(0)}) * $top) div ${cSpan - 1}"),
      expr(s"((day - ${mm.getLong(2)}) * $top) div ${dSpan - 1}"))

    def avgSpans(path: String): (Double, Double) = {
      val byFile = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max("o_custkey") - min("o_custkey")).as("cs"),
          (max("day") - min("day")).as("ds"))
        .collect()
      (byFile.map(_.getLong(1)).sum.toDouble / byFile.length / cSpan,
        byFile.map(_.getLong(2)).sum.toDouble / byFile.length / dSpan)
    }

    val nFiles = 16
    val zPath = tmpDir("graft-zorder")
    LayoutOps.writeZClustered(o, z, nFiles, zPath)
    val datePath = tmpDir("graft-datesort")
    o.repartitionByRange(nFiles, col("day")).sortWithinPartitions("day")
      .write.mode("overwrite").parquet(datePath)

    val (zc, zd) = avgSpans(zPath)
    val (sc0, sd0) = avgSpans(datePath)
    // z-order: both dimensions clustered — each file covers a fraction of each domain
    assert(zc < 0.5 && zd < 0.5, f"z-order spans not tight: cust=$zc%.2f day=$zd%.2f")
    // date sort: day clusters but customer stays unclustered (near-full span)
    assert(sd0 < zd + 0.1, "date sort should cluster the day dimension at least as well")
    assert(sc0 > 0.9, f"expected near-full customer span under date sort, got $sc0%.2f")
    assert(zc < sc0 / 2, "z-order should at least halve the customer span vs date sort")
  }

  test("footer_minmax: aggregate is answered from parquet footer stats (PushedAggregation)") {
    val confs = Map(
      "spark.sql.parquet.aggregatePushdown" -> "true",
      "spark.sql.sources.useV1SourceList" -> "")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val plan = spark.read.parquet(s"$sfDir/orders.parquet")
        .agg(min(col("o_orderkey")), max(col("o_orderkey")), count(lit(1)))
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation: [MIN(o_orderkey), MAX(o_orderkey), COUNT(*)]"),
        s"footer-stats pushdown missing:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
    // and the registered query's values equal the row-scan computation
    val viaFooter = LayoutOps.footerMinmax(spark, sfDir).collect().head
    val plain = graft.engine.Tables.orders(spark, sfDir)
      .agg(min(col("o_orderkey")), max(col("o_orderkey")), count(lit(1)))
      .collect().head
    assert(viaFooter.getLong(0) == plain.getLong(0)
      && viaFooter.getLong(1) == plain.getLong(1)
      && viaFooter.getLong(2) == plain.getLong(2))
  }

  test("partitioned-write audit: clean layout passes; unrepartitioned write trips n_files") {
    val orders = graft.engine.Tables.orders(spark, sfDir)
    val audit = LayoutOps.partitionedWriteAudit(spark, sfDir).collect()
    val nStatuses = orders.select("o_orderstatus").distinct().count()
    assert(audit.length == nStatuses)
    assert(audit.forall(_.getAs[Long]("n_files") == 1L), "expected one file per partition dir")
    assert(audit.forall(_.getAs[Boolean]("files_sorted")), "sortWithinPartitions must survive the write")
    assert(audit.map(_.getAs[Long]("n_rows")).sum == orders.count())

    // Negative control: the audit must MEASURE the layout, not assume it.
    // Skip the repartition — round-robin tasks each hold every status, so
    // every task sprays one file into every partition dir; the identical
    // read-back has to see >1 file per status.
    val bad = tmpDir("graft-pw-bad")
    orders.repartition(4)
      .write.partitionBy("o_orderstatus").mode("overwrite").parquet(bad)
    val filesPerStatus = spark.read.parquet(bad)
      .withColumn("__f", input_file_name())
      .groupBy("o_orderstatus")
      .agg(countDistinct(col("__f")).as("nf"))
      .collect().map(_.getAs[Long]("nf"))
    assert(filesPerStatus.exists(_ > 1L),
      "unrepartitioned partitionBy should produce multi-file partition dirs")
  }

  test("dynamic partition overwrite keeps untouched partitions; STATIC truncates them") {
    val orders = graft.engine.Tables.orders(spark, sfDir)
    // positive semantics are fully gated by the registered oracle; here
    // pin the CONTRAST that makes `dynamic` the load-bearing conf: the
    // same two writes under the default static mode lose every partition
    // the second frame does not touch
    val got = LayoutOps.dynamicPartitionOverwrite(spark, sfDir).collect()
    val statuses = orders.select("o_orderstatus").distinct().count()
    assert(got.length == statuses, "dynamic overwrite must keep every seeded partition")

    val root = tmpDir("graft-dpo-static")
    val o = orders.select(col("o_orderkey"), col("o_orderstatus"))
    o.write.partitionBy("o_orderstatus").mode("overwrite").parquet(root)
    assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode")
      .equalsIgnoreCase("static"), "contrast assumes the default static mode")
    o.filter(col("o_orderstatus") === "F")
      .write.partitionBy("o_orderstatus").mode("overwrite").parquet(root)
    val left = spark.read.parquet(root).select("o_orderstatus").distinct().collect()
    assert(left.map(_.getString(0)).toSeq == Seq("F"),
      s"static overwrite must truncate the whole table, found ${left.mkString(",")}")
  }
}

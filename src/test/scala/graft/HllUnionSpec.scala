package graft

import org.apache.spark.sql.functions._

import graft.operators.Extras

/** Gates for the mergeable-sketch incremental-distinct path: the merged
  * per-batch estimate must sit within HLL error of the exact union, and
  * merging per-batch sketches must equal sketching the whole table (the
  * property that makes the incremental snapshot maintainable without
  * rescanning history).
  */
class HllUnionSpec extends SparkSpec {

  test("a4_hll_union: merged estimate within 2% of exact; batches really split") {
    val r = Extras.a4HllUnion(spark, sfDir).collect().head
    val (est, nBatches, exact) = (r.getLong(0).toDouble, r.getLong(1), r.getLong(3))
    assert(nBatches == 2, "expected two batches at the watermark split")
    assert(math.abs(est - exact) / exact.toDouble < 0.02,
      s"HLL estimate $est vs exact $exact beyond 2%")
    // per-batch exacts overcount the union iff users span the cutoff
    assert(r.getLong(2) >= exact)
  }

  test("union of per-batch sketches == sketch of the whole table") {
    val ev = graft.engine.Tables.events(spark, sfDir).select(col("user_id"), col("ts"))
    val whole = ev.agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))"))
      .collect().head.getLong(0)
    val merged = ev
      .withColumn("batch", pmod(col("user_id"), lit(7)))
      .groupBy("batch").agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))"))
      .collect().head.getLong(0)
    assert(merged == whole, s"sketch merge not lossless: $merged vs $whole")
  }
}

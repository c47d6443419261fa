package graft

import org.apache.spark.sql.functions._

import graft.operators.LayoutOps

/** Compaction planner invariants: a valid, deterministic, idempotent
  * bin-pack of the file listing.
  */
class CompactionPlanSpec extends SparkSpec {

  private lazy val plan = LayoutOps.compactionPlan(spark, sfDir).collect()
  private lazy val files = spark.read.parquet(s"$sfDir/documents.parquet")
    .select(col("doc_id"), col("n_chars").cast("long").as("bytes"))
    .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)

  test("every file lands in exactly one bin; bins partition the doc_id axis contiguously") {
    assert(plan.map(_.getAs[Long]("n_files")).sum === files.length.toLong)
    // bins are contiguous, non-overlapping doc_id ranges in bin order
    val ranges = plan.sortBy(_.getAs[Long]("bin"))
      .map(r => (r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc")))
    ranges.sliding(2).foreach {
      case Array((_, last), (first2, _)) => assert(first2 > last)
      case _                             =>
    }
  }

  test("bin sizes stay within one file of the target (greedy prefix-sum contract)") {
    val maxFile = files.map(_._2).max
    plan.foreach { r =>
      val bytes = r.getAs[Long]("bin_bytes")
      // a bin is closed only after crossing the target, so it can exceed it
      // by at most the file that crossed it; only the final bin may undershoot
      assert(bytes <= LayoutOps.compactionTarget + maxFile,
        s"bin ${r.getAs[Long]("bin")} packed $bytes bytes")
    }
    val nonFinal = plan.sortBy(_.getAs[Long]("bin")).dropRight(1)
    nonFinal.foreach { r =>
      assert(r.getAs[Long]("bin_bytes") + files.map(_._2).max >= LayoutOps.compactionTarget,
        s"non-final bin ${r.getAs[Long]("bin")} closed early")
    }
  }

  test("planner is deterministic: re-planning yields the identical assignment") {
    val again = LayoutOps.compactionPlan(spark, sfDir).collect()
    assert(plan.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("applying the plan lands exactly one file per bin with the planned membership") {
    val applied = LayoutOps.compactionApply(spark, sfDir).collect()
    // physical contract observed from the written layout
    applied.foreach { r =>
      assert(r.getAs[Long]("n_files") == 1L, s"bin ${r.getAs[Long]("bin")} split across files")
      assert(r.getAs[Boolean]("single_file"))
    }
    // membership agrees with the plan bin-for-bin (no rows moved, lost, or duplicated)
    val planned = plan.map(r => r.getAs[Long]("bin") ->
      (r.getAs[Long]("n_files"), r.getAs[Long]("bin_bytes"))).toMap
    assert(applied.length == planned.size)
    applied.foreach { r =>
      val (nDocs, bytes) = planned(r.getAs[Long]("bin"))
      assert(r.getAs[Long]("n_docs") == nDocs)
      assert(r.getAs[Long]("bin_bytes") == bytes)
    }
  }
}

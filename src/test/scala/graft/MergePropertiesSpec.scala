package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Prop}

import graft.operators.MergeOps

/** ScalaCheck properties for the S7 merge (SURVEY.md §5: idempotence and
  * snapshot-merge commutativity mirroring src/test_aggregations.py:59-84).
  * Small generated batches, deterministic seed via scalacheck defaults.
  */
class MergePropertiesSpec extends SparkSpec {


  import spark.implicits._

  private val rowGen = for {
    id <- Gen.choose(0L, 20L)
    tsOff <- Gen.choose(0L, 1000000L)
    v <- Gen.choose(0, 1000)
  } yield (id, new Timestamp(1700000000000L + tsOff), v.toDouble)

  private val batchGen = Gen.listOfN(15, rowGen)

  private def df(rows: List[(Long, Timestamp, Double)]): DataFrame =
    rows.toDF("event_id", "ts", "value")

  private def canon(d: DataFrame): Set[(Long, Long)] =
    d.collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime)).toSet

  test("merging the same batch twice equals merging once (idempotence)") {
    checkProp(minTests = 10, p = Prop.forAll(batchGen, batchGen) { (base, batch) =>
      val once = MergeOps.mergeByKey(df(base), df(batch), "event_id", "ts")
      val twice = MergeOps.mergeByKey(once, df(batch), "event_id", "ts")
      canon(twice) == canon(once)
    })
  }

  test("merged key set is the union of key sets; per-key version is the max") {
    checkProp(minTests = 10, p = Prop.forAll(batchGen, batchGen) { (base, batch) =>
      val merged = MergeOps.mergeByKey(df(base), df(batch), "event_id", "ts")
      val all = base ++ batch
      val expectKeys = all.map(_._1).toSet
      val expectMaxTs = all.groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2.getTime).max }
      val got = merged.collect().map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
      got.keySet == expectKeys && expectMaxTs.forall { case (k, t) => got(k) == t }
    })
  }

  test("new-key count is |batch keys \\ base keys| regardless of duplication") {
    checkProp(minTests = 10, p = Prop.forAll(batchGen, batchGen) { (base, batch) =>
      val n = MergeOps.newKeyCount(df(base), df(batch), "event_id")
        .collect().head.getLong(0)
      n == (batch.map(_._1).toSet -- base.map(_._1).toSet).size.toLong
    })
  }
}

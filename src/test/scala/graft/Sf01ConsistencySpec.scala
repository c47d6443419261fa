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
    Seq(Similarity.simLshTopk _, Similarity.simIvfTopk _).foreach { variant =>
      variant(spark, bigDir).collect().foreach { r =>
        brute.get((r.getLong(0), r.getLong(1)))
          .foreach(exact => assert(r.getDouble(2) === exact))
      }
    }
  }
}

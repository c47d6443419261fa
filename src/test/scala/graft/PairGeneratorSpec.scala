package graft

import org.apache.spark.sql.functions._

/** [[graft.functions.PairCombinations]] semantics on crafted inputs — the
  * dedup oracles pin it end-to-end; this pins the generator contract:
  * ordered combinations, strict-< equal-key skipping, and degenerate
  * arrays.
  */
class PairGeneratorSpec extends SparkSpec {
  import spark.implicits._

  private def pairsOf(ids: Seq[Long]): Seq[(Long, Long)] =
    Seq(ids).toDF("xs")
      .select(expr("transform(xs, x -> struct(x AS doc_id, 'en' AS lang))").as("ds"))
      .selectExpr("graft_pairs(ds) AS (a, b)")
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("emits every 2-combination exactly once, ordered a < b") {
    val got = pairsOf(Seq(30L, 10L, 20L)).sorted
    assert(got === Seq((10L, 20L), (10L, 30L), (20L, 30L)))
  }

  test("equal keys are skipped like the strict < filter") {
    val got = pairsOf(Seq(5L, 5L, 7L)).sorted
    assert(got === Seq((5L, 7L), (5L, 7L)), "each 5 pairs with 7, never with the other 5")
  }

  test("empty and singleton arrays emit nothing") {
    assert(pairsOf(Seq.empty) === Seq.empty)
    assert(pairsOf(Seq(42L)) === Seq.empty)
  }

  test("matches the double-explode formulation on a random array") {
    val ids = new scala.util.Random(7).shuffle((1L to 40L).toList)
    val expected = (for (a <- ids; b <- ids if a < b) yield (a, b)).sorted
    assert(pairsOf(ids).sorted === expected)
  }
}

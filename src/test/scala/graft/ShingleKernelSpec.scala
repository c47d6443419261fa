package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** [[graft.functions.ShingleHashes]] must produce bit-identical longs to
  * the relational shingling it replaced (posexplode → lead window →
  * concat_ws+xxhash64 → distinct) — same xxhash64 seed, same byte content,
  * same <3-token whole-text fallback, same per-doc dedup.
  */
class ShingleKernelSpec extends SparkSpec {
  import spark.implicits._

  test("CharTrigrams kernel equals the HOF transform(sequence, substring) formulation") {
    val docs = Seq(
      "abcdef",                   // plain ASCII
      "ab",                       // below trigram length -> empty
      "abc",                      // exactly one trigram
      "café au lait",        // 2-byte UTF-8 char inside
      "x😀yz w",        // supplementary (surrogate pair) codepoint
      "á́bcd")         // combining runs
      .toDF("text")
    val kernel = docs.select(expr("graft_char_trigrams(text)").as("g"))
      .collect().map(_.getSeq[String](0))
    val hof = docs.select(
      expr("CASE WHEN length(text) >= 3 THEN transform(sequence(1, length(text) - 2), i -> substring(text, i, 3)) ELSE array() END").as("g"))
      .collect().map(_.getSeq[String](0))
    kernel.zip(hof).zipWithIndex.foreach { case ((k, h), i) =>
      assert(k === h, s"doc $i")
    }
  }

  /** The pre-kernel formulation, kept as the reference semantics. */
  private def relationalPostings(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), col("lang"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    toks
      .withColumn("t1", lead(col("tok"), 1).over(w))
      .withColumn("t2", lead(col("tok"), 2).over(w))
      .withColumn("g",
        when(col("t2").isNotNull, xxhash64(concat_ws(" ", col("tok"), col("t1"), col("t2"))))
          .when(col("pos") === 0 && col("t1").isNotNull,
            xxhash64(concat_ws(" ", col("tok"), col("t1"))))
          .when(col("pos") === 0, xxhash64(col("tok"))))
      .filter(col("g").isNotNull)
      .select(col("doc_id"), col("lang"), col("g")).distinct()
  }

  private def asSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet

  test("kernel postings == relational postings on the fixture corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val kernel = asSet(Dedup.rawPostingsOf(docs))
    val rel = asSet(relationalPostings(docs))
    assert(kernel === rel)
    assert(kernel.nonEmpty)
  }

  /** The pre-kernel SimHash vote, kept as the reference semantics. */
  private def relationalSimhash(docs: DataFrame): DataFrame = {
    val votes = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
      .groupBy("doc_id")
      .agg(
        sum(when(shiftright(col("h"), 0).bitwiseAND(1) === 1, 1).otherwise(-1)).as("v0"),
        (1 until 64).map(bit =>
          sum(when(shiftright(col("h"), bit).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$bit")): _*)
    val simhashCol = (0 until 64)
      .map(bit => when(col(s"v$bit") >= 0, lit(1L << bit)).otherwise(lit(0L)))
      .reduce(_ + _)
    votes.select(col("doc_id"), simhashCol.as("simhash"))
  }

  test("SimHash64 kernel == relational vote aggregate (fixture + edge cases)") {
    graft.functions.TextKernels.register(spark)
    val fixture = spark.read.parquet(s"$sfDir/documents.parquet")
    val edge = Seq((100001L, "en", "dup dup  dup"), (100002L, "en", ""), (100003L, "en", "one"))
      .toDF("doc_id", "lang", "text")
    val docs = fixture.select("doc_id", "lang", "text").unionByName(edge)
    val kernel = docs
      .select(col("doc_id"), expr("graft_simhash(text)").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rel = relationalSimhash(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernel === rel)
    assert(kernel.size === rel.size && kernel.nonEmpty)
  }

  test("kernel postings == relational postings on edge-case docs") {
    val docs = Seq(
      (1L, "en", "one"),                          // 1 token → whole text
      (2L, "en", "two tokens"),                   // 2 tokens → whole text
      (3L, "en", "exactly three tokens"),         // one 3-gram
      (4L, "en", "a b c d e"),                    // overlapping 3-grams
      (5L, "en", "dup dup dup dup"),              // repeated shingles → dedup
      (6L, "en", "double  space  here x"),        // empty tokens from "  "
      (7L, "en", "unicode héllo wörld ünïcode"),  // multi-byte UTF-8
      (8L, "en", ""),                             // empty text → one empty token
      (9L, "en", " leading and trailing "))       // boundary spaces
      .toDF("doc_id", "lang", "text")
    assert(asSet(Dedup.rawPostingsOf(docs)) === asSet(relationalPostings(docs)))
  }
}

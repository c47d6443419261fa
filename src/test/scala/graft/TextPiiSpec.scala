package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** PII scrubber semantics on known inputs (the registered query's oracle
  * checks corpus-level parity; this pins the per-pattern behavior).
  */
class TextPiiSpec extends SparkSpec {
  import spark.implicits._

  test("scrubPii redacts emails, IPv4s and phone numbers with typed placeholders") {
    val out = Seq(
      "mail a.b+c@ex-ample.org now",
      "host 192.168.0.1 and 10.0.0.255",
      "call +15550001234 today",
      "v1.2.3 is not an IP and neither is 1.2.3.4.5 a clean one",
      "no pii here").toDF("text")
      .select(TextOps.scrubPii(col("text")).as("s")).collect().map(_.getString(0))
    assert(out(0) === "mail <EMAIL> now")
    assert(out(1) === "host <IP> and <IP>")
    assert(out(2) === "call <PHONE> today")
    // 1.2.3.4.5: the \b-anchored IP pattern matches its first 4 octets —
    // documented greedy-prefix behavior, still redacts the digits
    assert(out(3).contains("v1.2.3 is not an IP"))
    assert(out(4) === "no pii here")
  }

  test("IP octets are bounded to 0-255: invalid dotted quads stay unredacted") {
    val out = Seq(
      "bad 999.999.999.999 quad",
      "bad 256.1.1.1 quad",
      "edge 255.255.255.255 ok",
      "edge 0.0.0.0 ok").toDF("text")
      .select(TextOps.scrubPii(col("text")).as("s")).collect().map(_.getString(0))
    assert(out(0) === "bad 999.999.999.999 quad")
    assert(out(1) === "bad 256.1.1.1 quad")
    assert(out(2) === "edge <IP> ok")
    assert(out(3) === "edge <IP> ok")
  }

  test("emails are scrubbed before the IP pass (dots inside emails never leak as IPs)") {
    val out = Seq("ping 1.2.3.4@example.com ok").toDF("text")
      .select(TextOps.scrubPii(col("text")).as("s")).collect().head.getString(0)
    assert(out === "ping <EMAIL> ok")
  }

  test("pack_sequences: packs are language-pure, ordered, and bounded by budget + one straddler") {
    val budget = 2048
    val rows = TextOps.packSequences(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(r => (r._2, r._5)).foreach { case ((lang, pack), docs) =>
      val total = docs.map(_._3).sum
      val maxDoc = docs.map(_._3).max
      assert(total <= budget + maxDoc, s"pack ($lang, $pack) holds $total tokens")
    }
    // pack_seq is non-decreasing in doc_id order within a language
    rows.groupBy(_._2).values.foreach { docs =>
      val seqs = docs.sortBy(_._1).map(_._5)
      assert(seqs.zip(seqs.tail).forall { case (a, b) => a <= b })
    }
  }
}

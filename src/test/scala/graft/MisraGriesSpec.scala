package graft

import org.apache.spark.sql.functions._

import graft.functions.MisraGries
import graft.operators.LexiconOps

/** Misra–Gries guarantees — the properties that hold regardless of
  * partition merge order: every item with true frequency > n/(k+1) is in
  * the summary; estimates never exceed the true count and underestimate
  * by at most n/(k+1); the summary never holds more than k counters.
  *
  * Two widths on purpose: the registered query's k=20 leaves the
  * near-uniform fixture corpus with NO true heavy hitters (bound n/21 >
  * every token count), which would make a presence check vacuous, so the
  * guarantee tests run the aggregator at k=40 where the bound drops below
  * the per-token counts and EVERY token is provably heavy (asserted
  * non-vacuous).
  */
class MisraGriesSpec extends SparkSpec {

  private val k = 20
  private val kWide = 40

  private lazy val trueCounts: Map[String, Long] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)")).as("t"))
      .groupBy("t").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private lazy val summary: Map[String, Long] =
    LexiconOps.vocabHeavyHitters(spark, sfDir)
      .collect().map(r => r.getAs[String]("token") -> r.getAs[Long]("est_count")).toMap

  private def summarize(kk: Int): Map[String, Long] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)")).as("token"))
      .as[String]
      .select(MisraGries.aggregator(kk).toColumn.name("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.token"), col("h.est_count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("registered query: at most k counters, bound column = n div (k+1)") {
    val rows = LexiconOps.vocabHeavyHitters(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= k)
    val n = trueCounts.values.sum
    rows.foreach(r => assert(r.getAs[Long]("max_underestimate") === n / (k + 1)))
  }

  test("every true heavy hitter (freq > n/(k+1)) is present — non-vacuous at k=40") {
    val n = trueCounts.values.sum
    val bound = n / (kWide + 1)
    val heavies = trueCounts.filter(_._2 > bound).keySet
    assert(heavies.nonEmpty, "fixture has no heavy hitters at kWide — test is vacuous, lower kWide")
    val wide = summarize(kWide)
    val missing = heavies -- wide.keySet
    assert(missing.isEmpty, s"heavy hitters absent from the summary: $missing")
  }

  test("estimates are one-sided: est <= true, underestimate <= n/(k+1)") {
    val n = trueCounts.values.sum
    Seq(k -> summary, kWide -> summarize(kWide)).foreach { case (kk, sm) =>
      val bound = n / (kk + 1)
      assert(sm.size <= kk)
      sm.foreach { case (t, est) =>
        val truth = trueCounts.getOrElse(t, 0L)
        assert(est <= truth, s"k=$kk $t overestimated: $est > $truth")
        assert(truth - est <= bound, s"k=$kk $t underestimated past the bound")
      }
    }
  }

  test("MG summary serves as mapGroupsWithState streaming state across triggers") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, Trigger}
    // the per-group streaming state is (tokens seen, summary): fold add()
    // over each micro-batch, carry the k counters forward — bounded state
    // for an unbounded token stream, the streaming twin of the batch
    // Aggregator (same update rule, same guarantees)
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)")).as("token"))
    val inDir = tmpDir("graft-mg-in")
    val ckpt = tmpDir("graft-mg-ckpt")
    toks.filter(col("token") < "m").write.parquet(s"$inDir/f1")
    toks.filter(col("token") >= "m").write.parquet(s"$inDir/f2")

    // local copy: referencing the spec field from the lambda would capture
    // `this` (a ScalaTest suite — not serializable) into the task closure.
    // The emitted first element is the CUMULATIVE input count — monotone
    // across triggers, unlike the summary's total mass (decrements shrink
    // it), so "row with max seen" reliably identifies the final state.
    val kk = k
    val update = (_: Int, it: Iterator[String],
                  st: GroupState[(Long, Map[String, Long])]) => {
      val (seen0, m0) = st.getOption.getOrElse((0L, Map.empty[String, Long]))
      var seen = seen0
      val next = it.foldLeft(m0) { (m, t) => seen += 1; MisraGries.add(m, t, kk) }
      st.update((seen, next))
      (seen, next)
    }
    val q = spark.readStream.schema(toks.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$inDir/*")
      .as[String]
      .groupByKey(_ => 0)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("mg_stream").outputMode("update")
      .start()
    q.awaitTermination()

    val outputs = spark.table("mg_stream").collect()
      .map(r => (r.getLong(0), r.getMap[String, Long](1).toMap))
    val n = trueCounts.values.sum
    // final state = the row that has consumed the WHOLE stream
    val (seen, last) = outputs.maxBy(_._1)
    assert(seen === n, s"final streaming state saw $seen of $n tokens")
    val bound = n / (k + 1)
    assert(last.size <= k && last.nonEmpty)
    val heavies = trueCounts.filter(_._2 > bound).keySet
    assert((heavies -- last.keySet).isEmpty, "streaming state lost a heavy hitter")
    last.foreach { case (t, est) =>
      assert(est <= trueCounts.getOrElse(t, 0L) && trueCounts.getOrElse(t, 0L) - est <= bound)
    }
  }

  test("merge is order-insensitive on the guarantees (single- vs multi-partition)") {
    import spark.implicits._
    val words = (1 to 3000).map(i => if (i % 3 == 0) "hot" else s"cold${i % 400}")
    val n = words.size
    val bound = n / (k + 1)
    Seq(1, 7).foreach { parts =>
      val ds = spark.createDataset(words).repartition(parts)
      val got = ds.select(MisraGries.aggregator(k).toColumn.name("hh"))
        .select(explode(col("hh")).as("h"))
        .select(col("h.token"), col("h.est_count"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.contains("hot"), s"parts=$parts lost the heavy hitter")
      assert(got("hot") <= 1000L && 1000L - got("hot") <= bound)
      assert(got.size <= k)
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.MisraGries
import graft.operators.LexiconOps

/** Misra–Gries guarantees — the properties that hold regardless of
  * partition merge order: every item with true frequency > n/(k+1) is in
  * the summary; estimates never exceed the true count and underestimate
  * by at most n/(k+1); the summary never holds more than k counters.
  */
class MisraGriesSpec extends SparkSpec {

  private val k = 20

  private lazy val trueCounts: Map[String, Long] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)")).as("t"))
      .groupBy("t").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private lazy val summary: Map[String, Long] =
    LexiconOps.vocabHeavyHitters(spark, sfDir)
      .collect().map(r => r.getAs[String]("token") -> r.getAs[Long]("est_count")).toMap

  test("at most k counters survive") {
    assert(summary.size <= k && summary.nonEmpty)
  }

  test("every true heavy hitter (freq > n/(k+1)) is present") {
    val n = trueCounts.values.sum
    val bound = n / (k + 1)
    val heavies = trueCounts.filter(_._2 > bound).keySet
    val missing = heavies -- summary.keySet
    assert(missing.isEmpty, s"heavy hitters absent from the summary: $missing")
  }

  test("estimates are one-sided: est <= true, underestimate <= n/(k+1)") {
    val n = trueCounts.values.sum
    val bound = n / (k + 1)
    summary.foreach { case (t, est) =>
      val truth = trueCounts.getOrElse(t, 0L)
      assert(est <= truth, s"$t overestimated: $est > $truth")
      assert(truth - est <= bound, s"$t underestimated past the bound: $truth - $est > $bound")
    }
  }

  test("MG summary serves as mapGroupsWithState streaming state across triggers") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, Trigger}
    // the same Summary map is the per-group streaming state: fold add()
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
    // `this` (a ScalaTest suite — not serializable) into the task closure
    val kk = k
    val update = (_: Int, it: Iterator[String], st: GroupState[Map[String, Long]]) => {
      val next = it.foldLeft(st.getOption.getOrElse(Map.empty[String, Long]))(
        (m, t) => MisraGries.add(m, t, kk))
      st.update(next)
      (next.values.sum, next)
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

    // one output row per trigger; the row with the largest carried mass is
    // the final state
    val last = spark.table("mg_stream").collect()
      .map(r => (r.getLong(0), r.getMap[String, Long](1).toMap))
      .maxBy(_._1)._2
    val n = trueCounts.values.sum
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

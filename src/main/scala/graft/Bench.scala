package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.engine.Sessions.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen, parquet reader, shuffle machinery, OS page
    // cache for every fixture) so the first timed query doesn't carry
    // one-time JVM/session cost — a resident cluster's steady state.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    spark.range(1000).groupBy((org.apache.spark.sql.functions.col("id") % 7)
      .as("k")).count().count()
    val headline = SparkEntry.headlineNames.toSet
    val results = SparkEntry.queries.filter(q => headline(q._1)).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      // failed queries report negative time so they can't pass as fast
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // 3-decimal (ms) precision keeps the line short: BENCH_r04 came back
    // "parsed": null because ~76 full-precision doubles pushed the line past
    // the driver's stdout-tail window and it was truncated mid-JSON.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // stdout for the driver's line scraper — raw, because build.sbt sets
    // `run / outputStrategy := StdoutOutput` (the default LoggedOutput
    // prefixed every line with "[info] ", which is why BENCH_r01/r02 came
    // back "parsed": null). Plus a file fallback a human/driver can always
    // find: SPARK_GRAFT_BENCH_OUT override, else <launch dir>/bench_out.json
    // (user.dir = the sbt project root under `sbt run` — repo-rooted
    // without a baked-in absolute path, ADVICE r3).
    println(line)
    val outPaths = Seq(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        java.nio.file.Paths.get(sys.props("user.dir"), "bench_out.json").toString)).distinct
    outPaths.foreach { p =>
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n")
      catch { case e: Throwable => System.err.println(s"[bench] write $p failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}

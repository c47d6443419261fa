package graft.tools

import org.apache.spark.sql.DataFrame

/** Dev probe for the r20 optimization round: stage-level timings INSIDE
  * composite queries (edges vs connected-components vs final joins), so
  * the optimization targets the measured stage, not the query total.
  * Usage: runMain graft.tools.OptProbe [sfDir] [reps]
  * Not registered; dev utility like [[QueryProbe]].
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Sessions.local("graft-optprobe", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    Seq("lineitem", "documents", "embeddings")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())

    def time(name: String)(fn: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[opt] $name%-34s ${ts.map(t => f"$t%.3f").mkString(" ")}  min=${ts.min}%.3f")
    }

    import graft.operators._
    for (_ <- 1 to 2) {
      time("sim_recall_report") { Similarity.simRecallReport(spark, sfDir) }
      time("ngram_jaccard") { Dedup.dedupNgramJaccard(spark, sfDir) }
      time("text_repetition") { TextOps.textRepetition(spark, sfDir) }
    }
    spark.stop()
  }
}

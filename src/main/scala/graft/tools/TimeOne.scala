package graft.tools

import graft.engine.Sessions

/** Times single registered queries on a warmed session — the micro-bench
  * loop for iterating on ONE operator without paying the full Bench run.
  * Usage: `sbt "runMain graft.tools.TimeOne <query> [query ...]"` with
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS honored like Bench (defaults
  * sf0.1 / 16). Each query runs 3 times; min and median are printed (min
  * approximates the quiet-machine number, see the bench-noise note in
  * SCALE.md).
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeOne <queryName> [queryName ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Sessions.local("timeone", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[timeone] $name%-28s min=${times.head}%.3f med=${times(1)}%.3f max=${times.last}%.3f")
    }
    spark.stop()
  }
}

package graft.tools

import graft.SparkEntry
import graft.engine.Sessions

/** Prints the formatted physical plan of the named registered queries
  * (all when no args) — the `.explain` feedback loop for plan review.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("explain", 4)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}

package graft.tools
import graft.engine.Sessions
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("ccprobe", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (q <- Seq("emb_neardup_clusters", "dedup_clusters")) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir).count()
      System.err.println(s"[cc] $q ${(System.nanoTime()-t0)/1e9}")
    }
    spark.stop()
  }
}

package graft.tools

/** Dev probe: raw schema + rows of the transformWithState value state read
  * through the State Data Source (shaping `stream_state_read_tws`).
  */
object TwsStateProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = graft.engine.Sessions.local("graft-twsprobe", 8)
    spark.sparkContext.setLogLevel("WARN")
    val root = graft.streaming.StreamingOps.twsStateRoot(spark, dir)
    val df = spark.read.format("statestore")
      .option("stateVarName", "topk")
      .load(s"$root/ckpt")
    df.printSchema()
    df.show(10, truncate = false)
    spark.stop()
  }
}

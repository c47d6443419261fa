package graft.tools

/** Dev utility: run ONE registered query and print its rows.
  * Usage: runMain graft.tools.ShowQuery <name> [sfDir] [maxRows]
  */
object ShowQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val maxRows = if (args.length > 2) args(2).toInt else 100
    val spark = graft.engine.Sessions.local("graft-show", 8)
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name"))
    fn(spark, dir).show(maxRows, truncate = false)
    spark.stop()
  }
}

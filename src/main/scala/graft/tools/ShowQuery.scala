package graft.tools

/** Dev utility: run ONE registered query and print its rows.
  * Usage: runMain graft.tools.ShowQuery <name> [sfDir] [maxRows]
  */
object ShowQuery {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: ShowQuery <name> [sfDir] [maxRows]")
      System.err.println(s"names: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val maxRows = if (args.length > 2) args(2).toInt else 100
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name"))
    val spark = graft.engine.Sessions.local("graft-show", 8)
    try fn(spark, dir).show(maxRows, truncate = false)
    finally spark.stop()
  }
}

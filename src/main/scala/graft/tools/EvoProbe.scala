package graft.tools

/** TEMPORARY: isolate the evolution+append+update NPE. Deleted before commit. */
object EvoProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.engine.Sessions.local("graft-evoprobe", 4)
    s.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    s.conf.set("spark.sql.catalog.graft_cat", classOf[graft.sources.GraftCatalog].getName)
    s.range(0, 6).select(col("id").as("k"), (col("id") * 1.5).as("v"))
      .writeTo("graft_cat.dml.evo").create()
    s.sql("ALTER TABLE graft_cat.dml.evo ADD COLUMN tag STRING")
    s.range(100, 103).select(col("id").as("k"), lit(0.5).as("v"), lit("new").as("tag"))
      .writeTo("graft_cat.dml.evo").append()
    println("--- after append:")
    s.table("graft_cat.dml.evo").orderBy("k").show(false)
    val upd = s.sql("UPDATE graft_cat.dml.evo SET tag = 'legacy' WHERE tag IS NULL")
    try {
      println("--- update plan:")
      println(upd.queryExecution.executedPlan.toString.take(3000))
    } catch { case e: Throwable => println(s"plan err ${e.getMessage}") }
    println("--- after update:")
    s.table("graft_cat.dml.evo").orderBy("k").show(false)
    s.stop()
  }
}

// Scratch profiling main (not part of the library surface).
package graft.tools

import org.apache.spark.sql.functions._
import graft.engine.{Sessions, Tables}

object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("profile", 32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    // warm
    spark.read.parquet(s"$dir/region.parquet").count()

    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("t"))
    val shingleExpr =
      """CASE WHEN size(t) >= 3
        | THEN transform(sequence(0, size(t)-3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
        | ELSE array(concat_ws(' ', t[0])) END""".stripMargin
    val sh = docs.select(col("doc_id"), col("lang"),
      array_distinct(expr(s"transform($shingleExpr, x -> xxhash64(x))")).as("s"))

    time("shingling only")(sh.agg(sum(size(col("s")))).collect())
    time("shingling only again")(sh.agg(sum(size(col("s")))).collect())

    val posts = sh.select(col("lang"), col("doc_id"), explode(col("s")).as("g"))
    time("explode postings")(posts.count())

    val cond = col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id")
    val inter = posts.as("x")
      .join(posts.as("y"), col("x.lang") === col("y.lang") && cond)
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    time("self-join + group")(println("pairs: " + inter.count()))

    time("full ngram query")(graft.operators.Dedup.dedupNgramJaccard(spark, dir).count())
    time("full ngram query again")(graft.operators.Dedup.dedupNgramJaccard(spark, dir).count())
    spark.stop()
  }
}

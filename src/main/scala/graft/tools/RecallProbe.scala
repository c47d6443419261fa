package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.Similarity

/** Dev utility: prints the recall / candidate-volume curve for the IVF
  * top-k and the blocked kNN join across probe/assignment counts, so the
  * registered defaults are CHOSEN from a measured curve rather than
  * guessed (VERDICT r8 asked for ≥12/15 on every method). Run:
  *
  *   sbt "runMain graft.tools.RecallProbe /root/testdata/sf0.01"
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = graft.engine.Sessions.local("graft-recall-probe", 16)
    try {
      val brute = Similarity.simTopkBrute(s, dir)
        .select("query_id", "cand_id").cache()

      for (np <- Seq(2, 4, 6, 8, 10)) {
        val hits = Similarity.simIvfTopk(s, dir, np)
          .select("query_id", "cand_id")
          .join(brute, Seq("query_id", "cand_id"), "left_semi").count()
        println(f"[probe] sim_ivf_topk nprobe=$np%2d of 16: hits=$hits/15")
      }

      for (nt <- Seq(8, 10, 12, 16)) {
        // count the candidate set from the SAME cached DataFrame the topk
        // rerank consumes — rebuilding it ran the signature + band join
        // twice per table count (review r10)
        val cands = Similarity.simLshCandidates(s, dir, nt).cache()
        val cand = cands.count()
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("cand_id"))
        val emb = graft.engine.Tables.embeddings(s, dir)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("raw"))
          .withColumn("nrm", sqrt(expr(graft.functions.VectorFunctions.dotExpr("raw", "raw"))))
          .select(col("vec_id"), expr("transform(raw, x -> x / nrm)").as("e"))
        val hits = cands
          .join(emb.select(col("vec_id").as("query_id"), col("e").as("qe")), "query_id")
          .join(emb.select(col("vec_id").as("cand_id"), col("e").as("ce")), "cand_id")
          .select(col("query_id"), col("cand_id"),
            (floor(expr(graft.functions.VectorFunctions.dotExpr("qe", "ce")) * 1e6 + 0.5) / 1e6)
              .as("cos_sim"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .join(brute, Seq("query_id", "cand_id"), "left_semi").count()
        cands.unpersist()
        println(f"[probe] sim_lsh_topk tables=$nt%2d x20bit: hits=$hits/15 " +
          f"rerankPairs=$cand")
      }

      // directional all-pairs truth: brute top-3 per vector (probe set only
      // for the report metric, all vectors for the global recall)
      val emb = graft.engine.Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("raw"))
        .withColumn("nrm", sqrt(expr(graft.functions.VectorFunctions.dotExpr("raw", "raw"))))
        .select(col("vec_id"), expr("transform(raw, x -> x / nrm)").as("e"))
      val a = emb.select(col("vec_id").as("vec_a"), col("e").as("ea"))
      val b = emb.select(col("vec_id").as("vec_b"), col("e").as("eb"))
      val w = Window.partitionBy(col("vec_a")).orderBy(col("cos_sim").desc, col("vec_b"))
      val truth: DataFrame = a.crossJoin(b)
        .filter(col("vec_a") =!= col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          (floor(expr(graft.functions.VectorFunctions.dotExpr("ea", "eb")) * 1e6 + 0.5) / 1e6)
            .as("cos_sim"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("vec_a", "vec_b").cache()
      val nVec = emb.count()
      val allPairs = nVec * (nVec - 1) / 2

      for (na <- Seq(3, 4, 5, 6, 8)) {
        val top = Similarity.knnJoinIvf(s, dir, na).select("vec_a", "vec_b").cache()
        val globalHits = top.join(truth, Seq("vec_a", "vec_b"), "left_semi").count()
        val probeHits = top.filter(col("vec_a") < 5)
          .join(truth.filter(col("vec_a") < 5), Seq("vec_a", "vec_b"), "left_semi").count()
        val cand = Similarity.knnJoinCandidates(s, dir, na).count()
        val t0 = System.nanoTime()
        Similarity.knnJoinIvf(s, dir, na).collect()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[probe] knn_join_ivf assign=$na%2d of 32: probeHits=$probeHits/15 " +
          f"globalRecall=${globalHits.toDouble / (3 * nVec)}%.3f " +
          f"candRate=${cand.toDouble / allPairs}%.3f time=$sec%.2fs")
        top.unpersist()
      }
    } finally s.stop()
  }
}

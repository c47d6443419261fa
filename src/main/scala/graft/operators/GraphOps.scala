package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.engine.Tables
import graft.functions.Scalars.roundTo

/** Iterative graph analytics over a derived trade graph. Web-scale corpus
  * curation weighs documents by link-graph centrality (PageRank / harmonic
  * centrality over the crawl graph — the Common-Crawl-style quality
  * signal); this module demonstrates the engine's iterative-computation
  * shape on the fixtures' natural graph: nation → nation trade edges
  * (customer's nation buys from supplier's nation, weight = lineitem
  * count).
  *
  * Topology per iteration: ranks (|V| rows) broadcast against the
  * edge table (|E| rows, partitioned by src and CACHED once), map-side
  * multiply, one shuffle keyed by dst for the inflow sum — the standard
  * Pregel-on-DataFrames layout. |V| ≪ |E| always holds for this signal
  * (25 vs ~60k here; ~10^9 hosts vs ~10^12 links at crawl scale, where
  * ranks move from broadcast to a co-partitioned shuffle join and each
  * iteration localCheckpoints to cut lineage — noted, not needed at
  * fixture scale). No driver-side graph state: the driver holds only the
  * loop counter.
  *
  * Reference provenance: no graph ops exist in the reference (SURVEY.md
  * §2.7); this extends the LLM-pipeline surface (corpus quality
  * weighting).
  */
object GraphOps extends QueryModule {

  private val damping = 0.85
  private val iters = 8

  /** Weighted PageRank, `iters` synchronous iterations, no dangling-mass
    * redistribution (every nation has outgoing trade in TPC-H data; the
    * choice is mirrored exactly in the oracle). r_{k+1}(v) = (1-d)/N +
    * d * Σ_{u→v} p(u,v) · r_k(u), p = edge weight / out-weight.
    * Constants are written so both engines evaluate bit-identical
    * literals (0.15/N, 0.85), and the final rank is rounded to 6 dp —
    * cross-engine float-sum-order noise is ~1e-13 after 8 iterations,
    * far below the rounding resolution.
    */
  def pageRank(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    val supp = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
    val edges = li
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").cast("long").as("src"),
        col("s_nationkey").cast("long").as("dst"))
      .agg(count(lit(1)).cast("double").as("w"))
    val norm = edges
      .withColumn("p", col("w") / sum(col("w")).over(Window.partitionBy("src")))
      .select("src", "dst", "p")
      .cache()
    val nations = Tables.nation(s, dir).select(col("n_nationkey").cast("long").as("id"))
    val n = nations.count().toDouble // 25-row dimension probe, not data-plane
    val base = 0.15 / n
    var ranks = nations.withColumn("r", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val contrib = norm
        .join(broadcast(ranks), col("src") === col("id"))
        .groupBy(col("dst"))
        .agg(sum(col("p") * col("r")).as("inflow"))
      // contrib is |V|-bounded (≤ one row per node) — broadcast it so the
      // base-term outer join never plans sort-merge exchanges
      ranks = nations
        .join(broadcast(contrib), nations("id") === contrib("dst"), "left")
        .select(col("id"), (lit(base) + lit(damping) * coalesce(col("inflow"), lit(0.0))).as("r"))
    }
    ranks
      .select(col("id").as("nationkey"), roundTo(col("r"), 6).as("pagerank"))
      .orderBy("nationkey")
  }

  val pageRankOracle: String = {
    // CAST decimal literals to DOUBLE: DuckDB parses 0.15 as DECIMAL(3,2)
    // and would run the recurrence in decimal arithmetic, diverging from
    // Spark's IEEE doubles.
    val iterCtes = (1 to iters).map { i =>
      s"""r$i AS (
         | SELECT n.id, CAST(0.15 AS DOUBLE)/(SELECT count(*) FROM nation)
         |   + CAST(0.85 AS DOUBLE) * COALESCE(SUM(ew.p * p.r), 0) AS r
         | FROM n LEFT JOIN ew ON ew.dst = n.id LEFT JOIN r${i - 1} p ON p.id = ew.src
         | GROUP BY n.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       | SELECT CAST(c.c_nationkey AS BIGINT) AS src, CAST(s.s_nationkey AS BIGINT) AS dst,
       |  CAST(count(*) AS DOUBLE) AS w
       | FROM lineitem l
       | JOIN orders o ON l.l_orderkey = o.o_orderkey
       | JOIN customer c ON o.o_custkey = c.c_custkey
       | JOIN supplier s ON l.l_suppkey = s.s_suppkey
       | GROUP BY 1, 2),
       |ew AS (SELECT src, dst, w / SUM(w) OVER (PARTITION BY src) AS p FROM e),
       |n AS (SELECT CAST(n_nationkey AS BIGINT) AS id FROM nation),
       |r0 AS (SELECT id, CAST(1.0 AS DOUBLE)/(SELECT count(*) FROM nation) AS r FROM n),
       |$iterCtes
       |SELECT id AS nationkey, floor(r * 1e6 + 0.5) / 1e6 AS pagerank
       |FROM r$iters ORDER BY nationkey""".stripMargin
  }

  override def queries: Seq[RegisteredQuery] = Seq(
    RegisteredQuery("graph_pagerank", pageRank, Some(pageRankOracle)),
  )
}

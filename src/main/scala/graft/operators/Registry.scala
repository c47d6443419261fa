package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One harness-registered operator: a Spark query plus (optionally) the
  * equivalent ANSI SQL that DuckDB runs over the same parquet tables as the
  * correctness oracle. Queries without SQL-expressible semantics (sketches,
  * LSH candidate generation, stubs) omit the oracle → driver records a
  * rows-only check.
  *
  * Conventions that keep the oracle compare deterministic (SURVEY.md §7.4):
  *  - every result ends with a total ORDER BY over a unique key set,
  *    mirrored exactly in the oracle SQL;
  *  - every computed double is `round`-ed (2–6 dp) on both sides;
  *  - computed integer columns are cast to BIGINT on both sides (DuckDB's
  *    year()/len() return BIGINT where Spark returns INT);
  *  - no uuid()/current_timestamp in compared output.
  */
final case class RegisteredQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** headline queries are the ones Bench times for BENCH_r{N}.json */
    headline: Boolean = true)

trait QueryModule {
  def queries: Seq[RegisteredQuery]
}

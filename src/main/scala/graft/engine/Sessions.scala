package graft.engine

import org.apache.spark.sql.SparkSession

/** Shared session tuning used by Verify, Bench and the test suites, so every
  * entry point runs with the same semantics:
  *  - UTC session timezone (reference stores TIMESTAMPTZ, SURVEY.md §1.2);
  *  - AQE on (runtime re-plan: skew joins, coalesced shuffle partitions);
  *  - shuffle partitions sized to the machine, not the 200 default;
  *  - nanosAsLong so the ns-precision `events.ts` parquet is readable
  *    (converted to TimestampType in [[Tables.events]]).
  */
object Sessions {
  def tune(b: SparkSession.Builder, cores: String): SparkSession.Builder =
    b.config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // write int64 micros, not INT96: the oracle compare reads our output
      // and DuckDB's result side-by-side and INT96 decodes as nanos
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")

  def local(appName: String, cores: Int = 4): SparkSession = {
    val s = tune(SparkSession.builder().master(s"local[$cores]").appName(appName), cores.toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

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

  /** Cluster-deployment tuning — the sizing arithmetic behind every
    * SCALE.md claim, in code. For a cluster of `executors` executors ×
    * `coresPerExecutor` cores × `executorMemGb` heap, reading a corpus of
    * `inputTb` TB:
    *
    *  - shuffle partitions = 2× total cores (wave parallelism + AQE
    *    coalescing headroom), floored at one partition per ~200 MB of
    *    input so a 100 TB shuffle never exceeds ~executor-memory-sized
    *    partitions even before AQE splits skew;
    *  - `files.maxPartitionBytes` 256 MB: scan tasks sized so a full
    *    core's working set (column batches + shuffle write buffers) stays
    *    well under heap/core;
    *  - AQE advisory partition size 128 MB: post-shuffle coalescing
    *    target, ~heap/core ÷ 4 at the 8 GB/4-core shape (spill headroom
    *    for aggregation hash tables);
    *  - broadcast threshold stays at Spark's default unless the caller
    *    overrides — dimension broadcasts in this library are explicit
    *    `broadcast()` hints, not threshold-dependent.
    *
    * The returned builder carries the same semantics configs as [[tune]]
    * (UTC, AQE, nanos flag, micros parquet) so cluster runs and the local
    * harness agree bit-for-bit.
    */
  def forCluster(
      b: SparkSession.Builder,
      executors: Int,
      coresPerExecutor: Int = 4,
      executorMemGb: Int = 8,
      inputTb: Double = 0.0): SparkSession.Builder = {
    val totalCores = executors * coresPerExecutor
    val byCores = 2L * totalCores
    val byVolume = math.ceil(inputTb * 1e12 / (200L << 20).toDouble).toLong
    val shufflePartitions = math.max(byCores, byVolume)
    tune(b, totalCores.toString)
      .config("spark.executor.instances", executors.toString)
      .config("spark.executor.cores", coresPerExecutor.toString)
      .config("spark.executor.memory", s"${executorMemGb}g")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.files.maxPartitionBytes", (256L << 20).toString)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (128L << 20).toString)
  }
}

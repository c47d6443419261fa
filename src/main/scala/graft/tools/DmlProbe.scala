package graft.tools

import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Dev probe for VERDICT r20 #6: STATEMENT-level timing inside the three
  * most expensive `sql_*` DML scripts (sql_merge_partitioned,
  * sql_time_travel_partitioned, sql_multi_table_read), so the "each
  * statement's plan/commit round-trip is the irreducible cost" claim is
  * a measured dump, not an assertion. Replicates the registered scripts'
  * statements verbatim (same seed, same DML, same digest) with a timer
  * around each; the registered queries themselves stay untouched.
  * Usage: runMain graft.tools.DmlProbe [sfDir] [reps]
  * Not registered; dev utility like [[OptProbe]].
  */
object DmlProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = graft.engine.Sessions.local("graft-dmlprobe", cpus.toInt)
    s.sparkContext.setLogLevel("WARN")
    s.conf.set("spark.sql.catalog.graft_cat",
      classOf[graft.sources.GraftCatalog].getName)
    Seq("events").foreach(t => s.read.parquet(s"$dir/$t.parquet").count())
    val seq = new java.util.concurrent.atomic.AtomicInteger(9000)

    def step[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[dml]   $name%-34s ${(System.nanoTime() - t0) / 1e9}%.3f")
      r
    }

    for (rep <- 1 to reps) {
      println(s"[dml] === rep $rep ===")
      val base = Tables.events(s, dir)
        .select(col("event_id"), col("event_type"), col("value"))

      // --- sql_merge_partitioned ---
      {
        val tbl = s"graft_cat.dml.p${seq.incrementAndGet()}"
        step("merge_part: CTAS (partitioned)") {
          base.writeTo(tbl).partitionedBy(col("event_type")).create()
        }
        val err = base.filter(col("event_type") === "error")
        step("merge_part: build src view") {
          err.filter(col("event_id") % 3 === 0)
            .select(col("event_id"), col("event_type"),
              (col("value") + 1000).as("value"))
            .unionByName(err.filter(col("event_id") % 5 === 0)
              .select((col("event_id") + 1000000L).as("event_id"),
                col("event_type"), lit(1.0).as("value")))
            .createOrReplaceTempView("graft_dmlprobe_src")
        }
        step("merge_part: MERGE INTO") {
          s.sql(
            s"""MERGE INTO $tbl t USING graft_dmlprobe_src s
               |ON t.event_id = s.event_id
               |WHEN MATCHED THEN UPDATE SET value = s.value
               |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        }
        step("merge_part: digest read + collect") {
          s.table(tbl).groupBy(col("event_type"))
            .agg(count(lit(1)).as("n"),
              (sum(floor(col("value") * 100 + 0.5).cast("long")) / 100.0)
                .as("total"))
            .orderBy("event_type").collect()
        }
        step("merge_part: DROP") { s.sql(s"DROP TABLE $tbl") }
      }

      // --- sql_time_travel_partitioned ---
      {
        val tbl = s"graft_cat.dml.p${seq.incrementAndGet()}"
        step("timetravel: CTAS (partitioned)") {
          base.writeTo(tbl).partitionedBy(col("event_type")).create()
        }
        step("timetravel: DELETE") {
          s.sql(s"DELETE FROM $tbl WHERE event_type = 'error' AND value < 50")
        }
        step("timetravel: UPDATE") {
          s.sql(s"UPDATE $tbl SET value = value + 1000 WHERE event_type = 'click'")
        }
        def digest(v: Int) = s.sql(
          s"""SELECT CAST($v AS BIGINT) AS v, count(*) AS n,
             | CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
             |   / 100.0 AS total
             |FROM $tbl VERSION AS OF $v""".stripMargin)
        step("timetravel: 3 as-of digests + collect") {
          digest(1).unionByName(digest(2)).unionByName(digest(3))
            .orderBy("v").collect()
        }
        step("timetravel: DROP") { s.sql(s"DROP TABLE $tbl") }
      }

      // --- sql_multi_table_read ---
      {
        val n = seq.incrementAndGet()
        val corpus = s"graft_cat.dml.rc$n"
        val manifest = s"graft_cat.dml.rm$n"
        step("multiread: CTAS corpus") { base.writeTo(corpus).create() }
        step("multiread: CTAS manifest") {
          base.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
            .writeTo(manifest).create()
        }
        step("multiread: 2x create_branch") {
          s.sql(s"CALL graft_cat.system.create_branch('dml.rc$n', 'tx')")
          s.sql(s"CALL graft_cat.system.create_branch('dml.rm$n', 'tx')")
        }
        step("multiread: DELETE on branch") {
          s.sql(s"DELETE FROM graft_cat.dml.`rc$n@tx` WHERE value < 30")
        }
        step("multiread: MERGE manifest") {
          s.sql(
            s"""MERGE INTO graft_cat.dml.`rm$n@tx` m
               |USING (SELECT event_type, count(*) AS n
               |       FROM graft_cat.dml.`rc$n@tx` GROUP BY event_type) c
               |ON m.event_type = c.event_type
               |WHEN MATCHED THEN UPDATE SET n = c.n
               |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
        }
        val pub = step("multiread: publish_tables") {
          s.sql("CALL graft_cat.system.publish_tables(" +
            s"'dml.rc$n@tx,dml.rm$n@tx')").collect()
            .map(r => r.getString(0) -> r.getInt(2)).toMap
        }
        step("multiread: drift appends") {
          base.limit(7).writeTo(corpus).append()
          s.sql(s"INSERT INTO $manifest VALUES ('drift', 999)")
        }
        step("multiread: as-of join digest + collect") {
          val asOfCorpus =
            s.sql(s"SELECT * FROM $corpus VERSION AS OF ${pub(s"dml.rc$n")}")
          val asOfManifest =
            s.sql(s"SELECT * FROM $manifest VERSION AS OF ${pub(s"dml.rm$n")}")
          asOfCorpus.groupBy(col("event_type"))
            .agg(count(lit(1)).as("n_corpus"))
            .join(asOfManifest, "event_type")
            .select(col("event_type"), col("n_corpus"),
              col("n").as("n_manifest"),
              (col("n_corpus") === col("n")).as("consistent"))
            .orderBy("event_type").collect()
        }
        step("multiread: 2x DROP") {
          s.sql(s"DROP TABLE $corpus"); s.sql(s"DROP TABLE $manifest")
        }
      }
    }
    s.stop()
  }
}

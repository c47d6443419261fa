package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query names — dump (and emit oracle
    // SQL for) just that subset, for fast local iteration on one operator
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    // fail fast on typos: a misspelled subset name would otherwise produce
    // an empty no-op run with exit code 0
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty, s"unknown query name(s): ${unknown.mkString(", ")}")
    }
    def keep(name: String): Boolean = only.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val preExisting = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession).isDefined
    val spark = graft.engine.Sessions.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // dump-layer representation fix, not a semantics change: the
        // session reads fixture timestamps as LTZ (UTC), which parquet
        // writes tz-aware (isAdjustedToUTC=true) — but DuckDB's oracle
        // emits naive timestamps, and the driver's compare is tz-strict.
        // Under a UTC session LTZ→NTZ is the identity on the stored
        // micros, so cast every emitted timestamp column to NTZ at the
        // dump boundary; both sides then read back naive and equal.
        // The rewrite recurses through struct/array/map types so a
        // timestamp nested inside a container column is converted too,
        // not silently written tz-aware to fail the driver's compare.
        import org.apache.spark.sql.types._
        def toNtz(dt: DataType): DataType = dt match {
          case TimestampType => TimestampNTZType
          case s: StructType =>
            StructType(s.fields.map(f => f.copy(dataType = toNtz(f.dataType))))
          case a: ArrayType  => a.copy(elementType = toNtz(a.elementType))
          case m: MapType    =>
            m.copy(keyType = toNtz(m.keyType), valueType = toNtz(m.valueType))
          case other => other
        }
        val ntz = df.schema.fields.foldLeft(df) { (d, f) =>
          val t = toNtz(f.dataType)
          if (t == f.dataType) d
          else d.withColumn(f.name, org.apache.spark.sql.functions.col(f.name).cast(t))
        }
        ntz.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // only stop a session this main created (tests invoke main in-process)
    if (!preExisting) spark.stop()
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.{QueryModule, RegisteredQuery}

/** File-format source/sink coverage beyond parquet: CSV and JSON-lines
  * round-trips under the driver oracle, plus the PERMISSIVE corrupt-record
  * audit. The reference ingests from a REST API and Postgres
  * (`/root/reference/src/api.py`, `src/database.py`) — both driver-gated
  * already (`api_source_scan`, `jdbc_merge_digest`); these close the
  * remaining "a user could hand this engine a CSV/JSON drop" surface.
  *
  * Each round-trip derives HOSTILE columns inside the query (embedded
  * commas and quotes, real NULLs) so the format's quoting/escape/null
  * machinery is what the oracle compare actually exercises — the fixture
  * text itself is delimiter-clean, and a pass-through would gate nothing.
  *
  * Scale notes (100 TB):
  *  - schemas are EXPLICIT on read — schema inference is a full extra
  *    scan of the input before the first real job, never acceptable at
  *    scale;
  *  - uncompressed/bzip2 CSV and JSON-lines split by
  *    `maxPartitionBytes` like any file source (gzip does not split —
  *    one task per file — which is an ingest-layout decision, not an
  *    engine one);
  *  - FAILFAST is the round-trip contract here (a fidelity gate wants
  *    loud breakage); production ingest uses PERMISSIVE + a corrupt
  *    column routed to quarantine, which is exactly what
  *    `csv_corrupt_audit` gates;
  *  - text formats are an INGEST boundary: land once, normalize to
  *    columnar (parquet) in the first job, never re-scan text downstream.
  */
object FileFormatOps extends QueryModule {

  private def deleteRecursively(root: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(root)) {
      val walk = java.nio.file.Files.walk(root)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  /** Materialize `df` locally, then drop the scratch dir — the returned
    * frame must not hold a plan over files about to be deleted.
    */
  private def materialize(s: SparkSession, df: DataFrame): DataFrame =
    s.createDataFrame(df.collectAsList(), df.schema)

  /** Customer → CSV (header, explicit null token) → read back FAILFAST
    * with the explicit schema → full row set. `c_label` embeds the CSV
    * metacharacters (comma, double-quote) the writer must quote and the
    * parser must unescape; `c_seg_null` carries real NULLs through the
    * `nullValue` token. Any quoting, escape, null, or numeric-fidelity
    * slip changes rows or values and breaks the hash.
    */
  def csvRoundTrip(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft-csv-rt")
    try {
      val shaped = Tables.customer(s, dir).select(
        col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_acctbal"),
        col("c_mktsegment"),
        concat(col("c_name"), lit(", \""), col("c_mktsegment"), lit("\""))
          .as("c_label"),
        when(col("c_mktsegment") === "BUILDING", lit(null).cast("string"))
          .otherwise(col("c_mktsegment")).as("c_seg_null"))
      shaped.write
        .option("header", "true").option("nullValue", "\\N")
        .mode("overwrite").csv(root.toString)
      val back = s.read.schema(shaped.schema)
        .option("header", "true").option("nullValue", "\\N")
        .option("mode", "FAILFAST")
        .csv(root.toString)
        .orderBy("c_custkey")
      materialize(s, back)
    } finally deleteRecursively(root)
  }

  val csvRoundTripOracle: String =
    """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
      | c_name || ', "' || c_mktsegment || '"' AS c_label,
      | CASE WHEN c_mktsegment = 'BUILDING' THEN NULL ELSE c_mktsegment END AS c_seg_null
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** Orders → JSON lines → read back FAILFAST with the explicit schema.
    * Exercises timestamp serialization (`o_orderdate` round-trips through
    * the ISO text form; emitted as micros per the no-raw-timestamps
    * compare rule), double fidelity through text (Java shortest-repr
    * round-trip), and absent-field NULL decoding (the JSON writer drops
    * null fields; the reader must restore them as NULL).
    */
  def jsonRoundTrip(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft-json-rt")
    try {
      val shaped = Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"),
        when(col("o_orderpriority") === "1-URGENT", lit(null).cast("string"))
          .otherwise(col("o_orderpriority")).as("o_pri_null"))
      shaped.write.mode("overwrite").json(root.toString)
      val back = s.read.schema(shaped.schema)
        .option("mode", "FAILFAST")
        .json(root.toString)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"),
          // o_orderdate is TIMESTAMP_NTZ; cast under the UTC session tz
          // (Sessions.tune) before unix_micros, like LayoutOps' day key
          unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"),
          col("o_pri_null"))
        .orderBy("o_orderkey")
      materialize(s, back)
    } finally deleteRecursively(root)
  }

  val jsonRoundTripOracle: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      | epoch_us(o_orderdate) AS od_us,
      | CASE WHEN o_orderpriority = '1-URGENT' THEN NULL ELSE o_orderpriority END AS o_pri_null
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** The production ingest contract: PERMISSIVE parse with a corrupt-
    * record column, malformed rows counted (routed to quarantine at
    * scale), clean rows passed through. One full-width unparseable line
    * is staged alongside the clean CSV; the audit must report exactly
    * the fixture's row count as clean and exactly one corrupt row.
    * (The parsed frame is cached before touching the corrupt column —
    * Spark refuses corrupt-column-only queries on the raw scan.)
    */
  def csvCorruptAudit(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft-csv-corrupt")
    try {
      Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .write.option("header", "true").mode("overwrite").csv(root.toString)
      // the malformed row rides in ITS OWN file (appending to a Spark part
      // file trips Hadoop's local-FS .crc sidecar), with its own header
      // line — header=true skips line 1 of EVERY file
      java.nio.file.Files.write(root.resolve("bad-extra.csv"),
        "c_custkey,c_name,c_acctbal\nnot_a_number,oops,also_not_a_number\n"
          .getBytes("UTF-8"))

      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "c_custkey BIGINT, c_name STRING, c_acctbal DOUBLE, _bad STRING")
      val parsed = s.read.schema(schema)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .csv(root.toString)
        .cache()
      try {
        val audit = parsed.agg(
          count(when(col("_bad").isNull, lit(1))).as("n_good"),
          count(col("_bad")).as("n_corrupt"))
        materialize(s, audit)
      } finally { parsed.unpersist(); () }
    } finally deleteRecursively(root)
  }

  val csvCorruptAuditOracle: String =
    """SELECT count(*) AS n_good, CAST(1 AS BIGINT) AS n_corrupt FROM customer""".stripMargin

  /** Lineitem → ORC → filtered read-back: the OTHER columnar format Spark
    * bundles, and the one real alternative to parquet at 100 TB. The
    * read-back applies `l_quantity > 45` so the ORC reader's
    * predicate-pushdown path (row-group stats skipping, same contract as
    * parquet's) is ON the gated plan — the spec pins the pushed filter in
    * the scan node. Fidelity surface: ms-precision timestamps through
    * ORC's timestamp encoding (emitted as micros per the compare rule),
    * double exactness, and NULL round-trip (`l_status_null`).
    */
  def orcRoundTrip(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft-orc-rt")
    try {
      val shaped = Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"), col("l_shipdate"),
        when(col("l_linestatus") === "F", lit(null).cast("string"))
          .otherwise(col("l_linestatus")).as("l_status_null"))
      shaped.write.mode("overwrite").orc(root.toString)
      val back = s.read.schema(shaped.schema).orc(root.toString)
        .filter(col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_returnflag"),
          // l_shipdate is TIMESTAMP_NTZ; cast under the UTC session tz
          // before unix_micros, like jsonRoundTrip's od_us
          unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"),
          col("l_status_null"))
        .orderBy("l_orderkey", "l_linenumber")
      materialize(s, back)
    } finally deleteRecursively(root)
  }

  val orcRoundTripOracle: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag,
      | epoch_us(l_shipdate) AS ship_us,
      | CASE WHEN l_linestatus = 'F' THEN NULL ELSE l_linestatus END AS l_status_null
      |FROM lineitem WHERE l_quantity > 45
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Schema drift across ingest batches — the remaining format-boundary
    * hazard after the round-trips: batch 1 lands WITHOUT `o_orderstatus`,
    * batch 2 adds it, and the engine must read both under one merged
    * schema with the missing column null-filled (`mergeSchema` merges the
    * parquet footers; at 100 TB the same contract comes from the table
    * catalog's schema evolution instead of per-read footer merging, with
    * identical null-fill semantics). The per-status census (absent bucket
    * included) hashes against the oracle's recomputation from the parity
    * split — a reader that dropped v1 rows, misaligned columns by
    * position, or defaulted instead of null-filling all mismatch.
    */
  def parquetSchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft-pq-evo")
    try {
      val orders = Tables.orders(s, dir)
      orders.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .write.mode("overwrite").parquet(s"$root/b1")
      orders.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus"))
        .write.mode("overwrite").parquet(s"$root/b2")
      val merged = s.read.option("mergeSchema", "true")
        .parquet(s"$root/b1", s"$root/b2")
      val out = merged
        .groupBy(coalesce(col("o_orderstatus"), lit("<absent>")).as("status"))
        .agg(
          count(lit(1)).as("n_rows"),
          graft.functions.Scalars.roundTo(sum(col("o_totalprice")), 2)
            .as("sum_price"))
        .orderBy("status")
      materialize(s, out)
    } finally deleteRecursively(root)
  }

  val parquetSchemaEvolutionOracle: String =
    """SELECT coalesce(CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus END, '<absent>') AS status,
      | count(*) AS n_rows,
      | floor(sum(o_totalprice) * 100 + 0.5) / 100 AS sum_price
      |FROM orders GROUP BY 1 ORDER BY status""".stripMargin

  /** Customer → XML (built-in Spark 4 source) → read back with the
    * explicit schema. `c_label` embeds the XML metacharacters (`<`, `&`,
    * a double-quote) the writer must entity-escape and the reader must
    * decode; `c_nat_null` carries real NULLs (the writer omits the
    * element, the reader must restore NULL); `c_acctbal` checks numeric
    * fidelity through XML text. Same ingest-boundary posture as the
    * CSV/JSON twins: explicit schema (no inference scan), land once,
    * normalize to columnar.
    */
  def xmlRoundTrip(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft-xml-rt")
    try {
      val shaped = Tables.customer(s, dir).select(
        col("c_custkey"), col("c_name"), col("c_acctbal"),
        concat(col("c_name"), lit(" <&> \""), col("c_mktsegment"))
          .as("c_label"),
        when(col("c_mktsegment") === "MACHINERY", lit(null).cast("string"))
          .otherwise(col("c_nationkey").cast("string")).as("c_nat_null"))
      shaped.write.format("xml")
        .option("rowTag", "row").option("rootTag", "rows")
        .mode("overwrite").save(root.toString)
      val back = s.read.format("xml")
        .schema(shaped.schema).option("rowTag", "row")
        .load(root.toString)
        .orderBy("c_custkey")
      materialize(s, back)
    } finally deleteRecursively(root)
  }

  val xmlRoundTripOracle: String =
    """SELECT c_custkey, c_name, c_acctbal,
      | c_name || ' <&> "' || c_mktsegment AS c_label,
      | CASE WHEN c_mktsegment = 'MACHINERY' THEN NULL
      |      ELSE CAST(c_nationkey AS VARCHAR) END AS c_nat_null
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** Supplier → Avro container files → read back → full row set. The
    * classpath carries Avro core + avro-mapred but NOT the `spark-avro`
    * DataFrame connector, so this goes through the Hadoop
    * `AvroKeyOutputFormat`/`AvroKeyInputFormat` pair — the wire path
    * every Kafka-adjacent ingest actually runs (schema'd records, no
    * inference scan: the reader schema is set EXPLICITLY via
    * `AvroJob.setInputKeySchema`, the scale posture of the CSV/JSON
    * twins). Fidelity surface: long/int/double through Avro binary
    * encoding, UTF-8 strings (Avro `Utf8` decoded immediately — the
    * record object is REUSED by the reader, values must be extracted
    * per record, the same aliasing trap as the DSv2 writer's
    * UnsafeRow), and a `["null","string"]` union column restoring real
    * NULLs. Avro container files are splittable by sync markers, so at
    * 100 TB this input splits by `maxPartitionBytes` like any file
    * source; the RDD boundary is the format shim only — everything
    * downstream is the same DataFrame plan.
    */
  def avroRoundTrip(s: SparkSession, dir: String): DataFrame = {
    import org.apache.avro.generic.{GenericData, GenericRecord}
    import org.apache.avro.mapred.AvroKey
    import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
    import org.apache.hadoop.io.NullWritable
    import org.apache.hadoop.mapreduce.Job

    val avroJson =
      """{"type":"record","name":"SupplierRec","namespace":"graft","fields":[
        | {"name":"s_suppkey","type":"long"},
        | {"name":"s_name","type":"string"},
        | {"name":"s_nationkey","type":"int"},
        | {"name":"s_acctbal","type":"double"},
        | {"name":"s_label_null","type":["null","string"],"default":null}
        |]}""".stripMargin
    val root = java.nio.file.Files.createTempDirectory("graft-avro-rt")
    try {
      val out = s"$root/data" // must NOT pre-exist: FileOutputFormat refuses
      val shaped = Tables.supplier(s, dir).select(
        col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"),
        when(col("s_nationkey") % 5 === 0, lit(null).cast("string"))
          .otherwise(concat(col("s_name"), lit(" | "), col("s_nationkey")))
          .as("s_label_null"))

      val wJob = Job.getInstance(s.sparkContext.hadoopConfiguration)
      AvroJob.setOutputKeySchema(wJob,
        new org.apache.avro.Schema.Parser().parse(avroJson))
      shaped.rdd.mapPartitions { it =>
        // Schema is not serializable: parse from JSON inside the task
        val sch = new org.apache.avro.Schema.Parser().parse(avroJson)
        it.map { row =>
          val rec: GenericRecord = new GenericData.Record(sch)
          rec.put("s_suppkey", row.getLong(0))
          rec.put("s_name", row.getString(1))
          rec.put("s_nationkey", row.getInt(2))
          rec.put("s_acctbal", row.getDouble(3))
          rec.put("s_label_null", if (row.isNullAt(4)) null else row.getString(4))
          (new AvroKey[GenericRecord](rec), NullWritable.get)
        }
      }.saveAsNewAPIHadoopFile(out, classOf[AvroKey[GenericRecord]],
        classOf[NullWritable], classOf[AvroKeyOutputFormat[GenericRecord]],
        wJob.getConfiguration)

      val rJob = Job.getInstance(s.sparkContext.hadoopConfiguration)
      AvroJob.setInputKeySchema(rJob,
        new org.apache.avro.Schema.Parser().parse(avroJson))
      val rows = s.sparkContext.newAPIHadoopFile(
          s"$out/*.avro", classOf[AvroKeyInputFormat[GenericRecord]],
          classOf[AvroKey[GenericRecord]], classOf[NullWritable],
          rJob.getConfiguration)
        .map { case (k, _) =>
          val r = k.datum() // reused buffer: extract every field NOW
          org.apache.spark.sql.Row(
            r.get("s_suppkey").asInstanceOf[Long],
            r.get("s_name").toString,
            r.get("s_nationkey").asInstanceOf[Int],
            r.get("s_acctbal").asInstanceOf[Double],
            Option(r.get("s_label_null")).map(_.toString).orNull)
        }
      val back = s.createDataFrame(rows, shaped.schema).orderBy("s_suppkey")
      materialize(s, back)
    } finally deleteRecursively(root)
  }

  val avroRoundTripOracle: String =
    """SELECT s_suppkey, s_name, s_nationkey, s_acctbal,
      | CASE WHEN s_nationkey % 5 = 0 THEN NULL
      |      ELSE s_name || ' | ' || CAST(s_nationkey AS VARCHAR) END AS s_label_null
      |FROM supplier ORDER BY s_suppkey""".stripMargin

  override def queries: Seq[RegisteredQuery] = Seq(
    RegisteredQuery("csv_roundtrip", csvRoundTrip, Some(csvRoundTripOracle)),
    RegisteredQuery("avro_roundtrip", avroRoundTrip, Some(avroRoundTripOracle)),
    RegisteredQuery("xml_roundtrip", xmlRoundTrip, Some(xmlRoundTripOracle)),
    RegisteredQuery("json_roundtrip", jsonRoundTrip, Some(jsonRoundTripOracle)),
    RegisteredQuery("csv_corrupt_audit", csvCorruptAudit, Some(csvCorruptAuditOracle)),
    RegisteredQuery("orc_roundtrip", orcRoundTrip, Some(orcRoundTripOracle)),
    RegisteredQuery("parquet_schema_evolution", parquetSchemaEvolution,
      Some(parquetSchemaEvolutionOracle)),
  )
}

package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.ModernSqlOps

/** Spark 4-native SQL surface: VARIANT shredding, recursive CTE spine,
  * collation-aware dedup, XML source round-trip.
  */
class ModernSqlSpec extends SparkSpec {

  test("variant_shred equals the raw-column recomputation, cell-exact") {
    val got = ModernSqlOps.variantShred(spark, sfDir).collect().toSeq
    val want = Tables.events(spark, sfDir)
      .groupBy(col("event_type").as("t"))
      .agg(
        count(lit(1)).as("n"),
        sum(get_json_object(col("props"), "$.k").cast("long")).as("k_sum"),
        (sum(floor(col("value") * 100 + 0.5)) / 100.0).as("x_sum"),
        count(when(col("value") > 50, 1)).as("n_flag"))
      .orderBy("t").collect().toSeq
    assert(got === want)
  }

  test("variant strictness contract: missing path is null for both, bad cast only throws strict") {
    // an ABSENT path yields NULL under both forms (which is why the
    // registered query's n_flag presence probe is sound); strictness
    // differs only on an extracted value that cannot CAST to the
    // requested type — variant_get throws, try_variant_get nulls
    val v = spark.sql("SELECT parse_json('{\"a\": \"not-a-number\"}') AS v")
    assert(v.selectExpr("try_variant_get(v, '$.missing', 'int')").collect().head.isNullAt(0))
    assert(v.selectExpr("variant_get(v, '$.missing', 'int')").collect().head.isNullAt(0))
    assert(v.selectExpr("try_variant_get(v, '$.a', 'int')").collect().head.isNullAt(0))
    intercept[Exception] {
      v.selectExpr("variant_get(v, '$.a', 'int')").collect()
    }
  }

  test("recursive_cte_spine: month count matches months_between, totals match the base table") {
    val row = ModernSqlOps.recursiveCteSpine(spark, sfDir).collect().head
    val o = Tables.orders(spark, sfDir)
    val bounds = o.agg(
      min(date_trunc("MONTH", col("o_orderdate"))).as("lo"),
      max(date_trunc("MONTH", col("o_orderdate"))).as("hi")).collect().head
    val expectMonths = Tables.orders(spark, sfDir)
      .agg(months_between(
        max(date_trunc("MONTH", col("o_orderdate"))),
        min(date_trunc("MONTH", col("o_orderdate"))))).collect().head
      .getDouble(0).toLong + 1L
    assert(row.getLong(0) === expectMonths, s"spine length off (bounds $bounds)")
    assert(row.getLong(2) === o.count(), "spine left-join dropped or duplicated orders")
    // every data month is on the spine: gaps are spine-only rows
    val dataMonths = o.select(date_trunc("MONTH", col("o_orderdate"))).distinct().count()
    assert(row.getLong(0) - row.getLong(1) === dataMonths,
      "spine minus gaps must equal the distinct data months")
  }

  test("collated_dedup: UTF8_LCASE grouping equals the lower() twin and merges real case pairs") {
    val row = ModernSqlOps.collatedDedup(spark, sfDir).collect().head
    val words = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w0"))
      .filter(length(col("w0")) > 0)
      .select(when(col("doc_id") % 2 === 0, initcap(col("w0")))
        .otherwise(col("w0")).as("w"))
    val nBinary = words.agg(countDistinct(col("w"))).collect().head.getLong(0)
    val nCi = words.agg(countDistinct(lower(col("w")))).collect().head.getLong(0)
    assert(row.getLong(1) === nBinary)
    assert(row.getLong(2) === nCi)
    assert(nBinary > nCi, "fixture must produce genuine case-variant pairs")
    assert(row.getLong(3) > 0, "at least one CI key must merge two casings")
  }

  test("xml_roundtrip entity-escapes the metacharacters on disk") {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Files.createTempDirectory("graft-xml-esc")
    try {
      Tables.customer(spark, sfDir).limit(5)
        .select(col("c_custkey"),
          concat(col("c_name"), lit(" <&> \""), col("c_mktsegment")).as("c_label"))
        .coalesce(1)
        .write.format("xml").option("rowTag", "row").option("rootTag", "rows")
        .mode("overwrite").save(root.toString)
      val walk = java.nio.file.Files.walk(root)
      val xml = try {
        walk.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".xml"))
          .map(p => new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
          .mkString
      } finally walk.close()
      assert(xml.contains("&lt;") && xml.contains("&amp;"),
        "raw metacharacters must be entity-escaped in the XML text")
      assert(!xml.contains(" <&> "), "unescaped payload leaked into the XML")
    } finally {
      val walk = java.nio.file.Files.walk(root)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }
}

package graft

/** Wiring self-test for the driver contract: Verify's main must produce
  * one parquet directory per registered query plus a parseable
  * oracle_sql.json covering exactly the oracle-bearing queries.
  */
class HarnessSpec extends SparkSpec {

  test("graft.Verify writes every query output and the oracle manifest") {
    val out = tmpDir("graft-harness-out")
    // run the actual main against the tiny fixture (shares the session via
    // getOrCreate, so configs are already in place)
    Verify.main(Array(sfDir, out))

    val written = new java.io.File(out).listFiles().map(_.getName).toSet
    SparkEntry.queries.keys.foreach { name =>
      assert(written.contains(name), s"missing output dir for $name")
      val files = new java.io.File(s"$out/$name").listFiles()
      assert(files.exists(_.getName.endsWith(".parquet")), s"no parquet for $name")
    }

    val json = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$out/oracle_sql.json"))
    // minimal JSON sanity: parses as a flat string map with the right keys
    assert(json.startsWith("{") && json.endsWith("}"))
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(json.contains("\"" + k + "\""), s"oracle manifest missing $k")
    }
    // no control characters escape-breaking (driver json.load hazard)
    assert(!json.exists(c => c < ' ' && c != '\n'.toChar), "raw control char in manifest")
  }

  test("registry names are unique (a duplicate would silently shadow in the ListMap)") {
    val names = SparkEntry.registry.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, occ) if occ.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
  }

  test("Bench headline list is a subset of registered queries") {
    val headline = SparkEntry.headlineNames.toSet
    assert(headline.subsetOf(SparkEntry.queries.keySet))
    // every registered query is benched since r11 (VERDICT r10 #7:
    // w1_latest_window was the only one with no recorded timing) — a
    // future non-headline registration must be a deliberate decision
    // recorded here
    assert(SparkEntry.queries.keySet -- headline === Set.empty[String])
  }
}

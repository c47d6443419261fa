package graft

import org.scalatest.funsuite.AnyFunSuite

/** BENCH_r04/r05 came back "parsed": null — the one-line stdout JSON grew
  * past the driver's ~2000-char stdout-tail scrape window (which the sbt
  * "[success]" epilogue also shares) and was truncated mid-object. This
  * pins the compact line's worst-case length against the LIVE registry so
  * adding queries can never silently push it back over the window.
  */
class BenchLineSpec extends AnyFunSuite {

  // 5-digit sentinel: covers timings up to 99999.999s so a pathologically
  // slow run (4+ digit seconds) can't widen entries past the pinned case
  private val worstCase = SparkEntry.queries.keys.toSeq.map(_ -> 99999.999)

  test("compact stdout line fits the driver tail window at worst-case widths") {
    val (compact, _) = Bench.renderLines(worstCase, "/root/testdata/sf0.1")
    assert(compact.length <= Bench.stdoutBudget,
      s"stdout bench line is ${compact.length} chars; budget ${Bench.stdoutBudget}")
    assert(compact.startsWith("{\"metric\":\"total\""))
    assert(compact.endsWith("}"))
  }

  test("failed queries are excluded from the total and surfaced in both lines") {
    val results = Seq("ok_a" -> 1.5, "bad_b" -> -1.0, "ok_c" -> 2.5)
    val (compact, full) = Bench.renderLines(results, "/tmp/sf")
    Seq(compact, full).foreach { l =>
      assert(l.contains("\"value\":4.000"), s"total should skip the sentinel: $l")
      assert(l.contains("\"failed\":[\"bad_b\"]"), s"missing failed field: $l")
    }
    // the failed entry jumps the priority queue on the compact line
    assert(compact.indexOf("\"bad_b\":") >= 0)
  }

  test("full line (bench_out.json) carries every registered query") {
    val (_, full) = Bench.renderLines(worstCase, "/root/testdata/sf0.1")
    SparkEntry.queries.keys.foreach(k =>
      assert(full.contains("\"" + k + "\":"), s"missing $k in full line"))
  }

  test("mechanical ordering: canonical four, then new-since-archive, then descending time") {
    // inject the known set so the pin is deterministic (the default
    // reads the frozen BENCH_FULL archive)
    val results = Seq("old_slow" -> 9.0, "q1_perf_over_time" -> 1.0,
      "brand_new" -> 0.1, "old_fast" -> 0.2, "q3_ship_delay" -> 0.5)
    val known = Set("old_slow", "old_fast", "q1_perf_over_time",
      "q3_ship_delay")
    val (compact, _) =
      Bench.renderLines(results, "/tmp/sf", knownQueries = known)
    def pos(n: String) = compact.indexOf("\"" + n + "\":")
    assert(Seq("q1_perf_over_time", "q3_ship_delay", "brand_new",
      "old_slow", "old_fast").forall(pos(_) >= 0), compact)
    // canonical anchors first, the new query next, then the rest by
    // DESCENDING time
    assert(pos("q1_perf_over_time") < pos("q3_ship_delay"))
    assert(pos("q3_ship_delay") < pos("brand_new"))
    assert(pos("brand_new") < pos("old_slow"))
    assert(pos("old_slow") < pos("old_fast"))
  }

  test("canonical four + every query new since the frozen archive survive the budget cut") {
    val known = Bench.latestFrozenQueries()
    val (compact, _) = Bench.renderLines(worstCase, "/root/testdata/sf0.1",
      knownQueries = known)
    val mustShow = Bench.canonicalNames.filter(SparkEntry.queries.contains) ++
      SparkEntry.queries.keys.filterNot(known.contains)
    mustShow.foreach(n =>
      assert(compact.contains("\"" + n + "\":"), s"head query $n was cut"))
  }

  test("compact line balances braces and quotes (truncation canary)") {
    val (compact, _) = Bench.renderLines(worstCase, "/root/testdata/sf0.1")
    assert(compact.count(_ == '{') == compact.count(_ == '}'))
    assert(compact.count(_ == '"') % 2 == 0)
  }
}

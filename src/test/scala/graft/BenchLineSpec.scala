package graft

import org.scalatest.funsuite.AnyFunSuite

/** BENCH_r04/r05 came back "parsed": null — the one-line stdout JSON grew
  * past the driver's ~2000-char stdout-tail scrape window (which the sbt
  * "[success]" epilogue also shares) and was truncated mid-object. This
  * pins the compact line's worst-case length against the LIVE registry so
  * adding queries can never silently push it back over the window.
  */
class BenchLineSpec extends AnyFunSuite {

  private val worstCase = SparkEntry.queries.keys.toSeq.map(_ -> 999.999)

  test("compact stdout line fits the driver tail window at worst-case widths") {
    val (compact, _) = Bench.renderLines(worstCase, "/root/testdata/sf0.1")
    assert(compact.length <= Bench.stdoutBudget,
      s"stdout bench line is ${compact.length} chars; budget ${Bench.stdoutBudget}")
    assert(compact.startsWith("{\"metric\":\"total\""))
    assert(compact.endsWith("}"))
  }

  test("full line (bench_out.json) carries every registered query") {
    val (_, full) = Bench.renderLines(worstCase, "/root/testdata/sf0.1")
    SparkEntry.queries.keys.foreach(k =>
      assert(full.contains("\"" + k + "\":"), s"missing $k in full line"))
  }

  test("priority queries survive the budget cut") {
    val (compact, _) = Bench.renderLines(worstCase, "/root/testdata/sf0.1")
    val present = Bench.priorityNames.filter(SparkEntry.queries.contains)
    present.foreach(n =>
      assert(compact.contains("\"" + n + "\":"), s"priority query $n was cut"))
  }

  test("compact line balances braces and quotes (truncation canary)") {
    val (compact, _) = Bench.renderLines(worstCase, "/root/testdata/sf0.1")
    assert(compact.count(_ == '{') == compact.count(_ == '}'))
    assert(compact.count(_ == '"') % 2 == 0)
  }
}

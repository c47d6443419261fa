package graft

import org.scalatest.funsuite.AnyFunSuite

/** README headline counts pinned against the LIVE registry (VERDICT r13
  * #2: the hand-written "231 registered queries" drifted when a final
  * commit added a query after the status section was written). The
  * README states the registered-query count in exactly two places, both
  * of the form "NNN registered queries" / "all NNN registered queries";
  * this spec extracts every such number and asserts each equals
  * `SparkEntry.queries.size` — so adding a query without refreshing the
  * README turns `sbt test` red instead of shipping a stale claim.
  */
class ReadmeClaimsSpec extends AnyFunSuite {

  private lazy val readme = {
    val src = scala.io.Source.fromFile("README.md", "UTF-8")
    try src.mkString finally src.close()
  }

  test("every live 'N registered queries' claim in README equals the registry size") {
    // archived per-round sections are headed "## Status (round N, history)"
    // and legitimately carry the counts of THEIR round — only claims
    // before the first history heading describe the live tree
    val live = readme.indexOf(", history)") match {
      case -1 => readme
      case i  => readme.take(i)
    }
    val claims = """(\d+) registered quer""".r
      .findAllMatchIn(live).map(_.group(1).toInt).toSeq
    assert(claims.nonEmpty,
      "README must state the registered-query count at least once")
    val size = SparkEntry.queries.size
    claims.foreach(n =>
      assert(n == size, s"README claims $n registered queries; registry has $size"))
  }

  test("README and the registry agree that every query has an oracle") {
    // the README's "`no_oracle` = 0" claim, checked structurally
    assert(readme.contains("`no_oracle` = 0"))
    val missing = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(missing.isEmpty, s"queries without an oracle: ${missing.mkString(", ")}")
  }
}

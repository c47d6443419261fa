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

  test("every live 'N tests across M suites' claim equals the compiled suite inventory") {
    // VERDICT r15 #2 (third round of the drift genre): the README's test
    // count must be produced BY the tree it describes, mechanically.
    // Discover every compiled ScalaTest suite on the test classpath,
    // instantiate it (suites keep construction cheap — the shared
    // session is lazy), and sum registered test names.
    val dir = java.nio.file.Paths.get("target/scala-2.13/test-classes/graft")
    assert(java.nio.file.Files.isDirectory(dir), s"missing $dir")
    // recursive: suites live in graft AND its subpackages (e.g.
    // graft.sources.SpecCaptureSpec, which needs private[sources] access)
    val suites = java.nio.file.Files.walk(dir).iterator()
      .asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    suites.forEachRemaining { p =>
      val f = p.getFileName.toString
      if (f.endsWith(".class") && !f.contains("$"))
        names += ("graft." + dir.relativize(p).toString
          .stripSuffix(".class").replace(java.io.File.separatorChar, '.'))
    }
    val live = names.sorted.flatMap { cn =>
      val c = Class.forName(cn)
      if (classOf[org.scalatest.Suite].isAssignableFrom(c) &&
          !c.isInterface &&
          !java.lang.reflect.Modifier.isAbstract(c.getModifiers))
        Some(c.getDeclaredConstructor().newInstance()
          .asInstanceOf[org.scalatest.Suite])
      else None
    }
    val (nSuites, nTests) = (live.size, live.map(_.testNames.size).sum)
    val liveSection = readme.indexOf(", history)") match {
      case -1 => readme
      case i  => readme.take(i)
    }
    val claims = """(\d+) tests across (\d+) suites""".r
      .findAllMatchIn(liveSection)
      .map(m => (m.group(1).toInt, m.group(2).toInt)).toSeq
    assert(claims.nonEmpty,
      "README must state the live test count as 'N tests across M suites'")
    claims.foreach { case (t, s) =>
      assert(t == nTests && s == nSuites,
        s"README claims $t tests across $s suites; the compiled tree has " +
          s"$nTests tests across $nSuites suites")
    }
  }

  test("README and the registry agree that every query has an oracle") {
    // the README's "`no_oracle` = 0" claim, checked structurally
    assert(readme.contains("`no_oracle` = 0"))
    val missing = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(missing.isEmpty, s"queries without an oracle: ${missing.mkString(", ")}")
  }
}

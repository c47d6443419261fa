package graft.engine

/** Stage-once-per-fixture discipline for queries that must materialize
  * on-disk state BEFORE the measured read path (the versioned pipeline
  * store, the IVM base snapshot, the streaming staged inputs): one staged
  * temp directory per (tag, fixture dir), keyed by dir with the content
  * fingerprint in the VALUE, so a rewritten fixture under the same path
  * re-stages. Single-sourced for the same reason
  * [[graft.operators.SimilarityIndex.memoCheckpoint]] is: the eviction
  * predicate is subtle enough that per-module copies drift.
  *
  * Concurrency (ADVICE r12, both findings):
  *  - locking is PER KEY (one monitor per (tag, dir)), so a slow stage —
  *    some run entire multi-batch streaming queries — no longer
  *    serializes unrelated tags, and a stage closure that itself calls
  *    `of` for a different key cannot deadlock (different monitor; the
  *    same key from the same thread re-enters reentrantly).
  *    Delete-then-restage stays atomic per key.
  *  - a SUPERSEDED root is never deleted eagerly: previously returned
  *    lazy DataFrames (time-travel digests, the IVM stored-base read,
  *    statestore checkpoint reads) may still reference the old path, and
  *    a re-stage between their plan time and collect time would turn
  *    into FileNotFoundException. Superseded roots retire to a queue the
  *    JVM-exit hook deletes along with the live roots — bounded by the
  *    number of fixture rewrites in a session (the harness rewrites a
  *    fixture at most once per round), so deferral cannot accumulate.
  *
  * A failed `stage` leaves NO cache entry (the key is removed before the
  * old root retires — review r12: a dangling entry would serve a deleted
  * path if the fixture later reverted to the old fingerprint) and its
  * fresh half-populated root is deleted. Staged state never outlives the
  * session that built it — except on abnormal termination (SIGKILL/OOM)
  * where the exit hook never runs. For that case (ADVICE r13) roots are
  * PID-marked (`graft-p<pid>-<tag>`) and the first `of` call per JVM
  * sweeps the temp root: PID-marked dirs whose owner process is dead are
  * reclaimed immediately; legacy unmarked `graft-*` dirs are reclaimed
  * once older than 24 h (an age floor so a concurrently-running sibling
  * JVM's fresh dirs are never touched).
  */
object StagedRoots {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]
  private val locks =
    scala.collection.concurrent.TrieMap.empty[String, Object]
  private val retired =
    new java.util.concurrent.ConcurrentLinkedQueue[String]

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(new Runnable {
      override def run(): Unit = {
        val all = cache.values.map(_._2) ++
          scala.jdk.CollectionConverters.IteratorHasAsScala(
            retired.iterator()).asScala
        all.foreach { root =>
          val _ = scala.util.Try(deleteRecursively(java.nio.file.Paths.get(root)))
        }
      }
    }))

  /** One-time-per-JVM reclaim of roots leaked by KILLED JVMs (where the
    * exit hook never ran). Deletes `graft-p<pid>-*` dirs whose pid is no
    * longer alive, and pre-PID-marking `graft-*` dirs older than 24 h.
    * Errors are swallowed: the sweep is a best-effort janitor, never a
    * correctness dependency.
    */
  private lazy val sweepInstalled: Unit = {
    import scala.jdk.CollectionConverters._
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val cutoff = System.currentTimeMillis() - 24L * 3600 * 1000
    scala.util.Try {
      val st = java.nio.file.Files.list(tmp)
      try st.iterator().asScala.foreach { p =>
        val n = p.getFileName.toString
        val stale =
          if (n.startsWith("graft-p")) {
            val pid = n.stripPrefix("graft-p").takeWhile(_.isDigit)
            pid.nonEmpty && pid.toLongOption.exists { id =>
              id != ProcessHandle.current().pid() &&
                !ProcessHandle.of(id).map[Boolean](_.isAlive).orElse(false)
            }
          } else n.startsWith("graft-") && scala.util.Try(
            java.nio.file.Files.getLastModifiedTime(p).toMillis < cutoff
          ).getOrElse(false)
        if (stale) { val _ = scala.util.Try(deleteRecursively(p)) }
      } finally st.close()
    }
    ()
  }

  private[graft] def deleteRecursively(root: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(root)) {
      val walk = java.nio.file.Files.walk(root)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally walk.close()
    }
  }

  /** The staged root for (tag, dir) at the given content fingerprint.
    * `stage` receives a fresh empty temp directory and must fully
    * populate it before returning; it runs at most once per fingerprint.
    */
  def of(tag: String, dir: String, fingerprint: String)(
      stage: String => Unit): String = {
    hookInstalled
    sweepInstalled
    val key = s"$tag|$dir"
    locks.getOrElseUpdate(key, new Object).synchronized {
      cache.get(key) match {
        case Some((fp, root)) if fp == fingerprint => root
        case stale =>
          // unmap BEFORE retiring: a stage() failure must not leave the
          // key pointing at a superseded root
          cache.remove(key)
          stale.foreach { case (_, old) => retired.add(old); () }
          val root = java.nio.file.Files.createTempDirectory(
            s"graft-p${ProcessHandle.current().pid()}-$tag")
          try {
            stage(root.toString)
            cache.put(key, (fingerprint, root.toString))
            root.toString
          } catch {
            case e: Throwable =>
              try deleteRecursively(root) catch { case _: Exception => () }
              throw e
          }
      }
    }
  }
}

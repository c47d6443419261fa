package graft.engine

/** Stage-once-per-fixture discipline for queries that must materialize
  * on-disk state BEFORE the measured read path (the versioned pipeline
  * store, the IVM base snapshot, the streaming staged inputs): one staged
  * temp directory per (tag, fixture dir), keyed by dir with the content
  * fingerprint in the VALUE, so a rewritten fixture under the same path
  * re-stages and the superseded root is deleted immediately — not leaked
  * under /tmp for the JVM lifetime (ADVICE r11). Single-sourced for the
  * same reason [[graft.operators.SimilarityIndex.memoCheckpoint]] is:
  * the eviction predicate is subtle enough that per-module copies drift.
  *
  * The lock is one object-wide monitor: staging is rare (once per
  * (tag, fixture) lifetime) and serializing it also makes delete-then-
  * restage atomic against a concurrent reader of the same tag. A failed
  * `stage` leaves NO cache entry (the key is removed before the old root
  * is deleted — review r12: a dangling entry would serve a deleted path
  * if the fixture later reverted to the old fingerprint) and its fresh
  * half-populated root is deleted. Live roots are deleted at JVM exit by
  * a shutdown hook, so staged state never outlives the session that
  * built it.
  */
object StagedRoots {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(new Runnable {
      override def run(): Unit = cache.values.foreach { case (_, root) =>
        val _ = scala.util.Try(deleteRecursively(java.nio.file.Paths.get(root)))
      }
    }))

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
      stage: String => Unit): String =
    cache.synchronized {
      hookInstalled
      val key = s"$tag|$dir"
      cache.get(key) match {
        case Some((fp, root)) if fp == fingerprint => root
        case stale =>
          // unmap BEFORE deleting/staging: a stage() failure must not
          // leave the key pointing at a deleted root
          cache.remove(key)
          stale.foreach { case (_, old) =>
            deleteRecursively(java.nio.file.Paths.get(old))
          }
          val root =
            java.nio.file.Files.createTempDirectory(s"graft-$tag")
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

package graft.engine

/** Stage-once-per-fixture discipline for queries that must materialize
  * on-disk state BEFORE the measured read path (the versioned pipeline
  * store, the IVM base snapshot): one staged temp directory per
  * (tag, fixture dir), keyed by dir with the content fingerprint in the
  * VALUE, so a rewritten fixture under the same path re-stages and the
  * superseded root is deleted immediately — not leaked under /tmp for
  * the JVM lifetime (ADVICE r11). Single-sourced for the same reason
  * [[graft.operators.SimilarityIndex.memoCheckpoint]] is: the eviction
  * predicate is subtle enough that per-module copies drift.
  *
  * The lock is one object-wide monitor: staging is rare (once per
  * (tag, fixture) lifetime) and serializing it also makes delete-then-
  * restage atomic against a concurrent reader of the same tag.
  */
object StagedRoots {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]

  private[graft] def deleteRecursively(root: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(root)) {
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(p => { java.nio.file.Files.deleteIfExists(p); () })
    }
  }

  /** The staged root for (tag, dir) at the given content fingerprint.
    * `stage` receives a fresh empty temp directory and must fully
    * populate it before returning; it runs at most once per fingerprint.
    */
  def of(tag: String, dir: String, fingerprint: String)(
      stage: String => Unit): String =
    cache.synchronized {
      val key = s"$tag|$dir"
      cache.get(key) match {
        case Some((fp, root)) if fp == fingerprint => root
        case stale =>
          stale.foreach { case (_, old) =>
            deleteRecursively(java.nio.file.Paths.get(old))
          }
          val root =
            java.nio.file.Files.createTempDirectory(s"graft-$tag").toString
          stage(root)
          cache.put(key, (fingerprint, root))
          root
      }
    }
}

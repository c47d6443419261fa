package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.types.{IntegerType, StringType, StructType}

/** Version-to-version CHANGE FEED over a catalog table's commit ledger —
  * the batch half of the CDC surface (the streaming half is
  * [[GraftStoreMicroBatchStream]], which serves append-only commits live
  * and FENCES on rewrites; this reader serves any committed range after
  * the fact, rewrites included). The Delta CDF / Iceberg
  * changelog-scan model: changes are derived from the LEDGER, not from
  * the table state, so the feed is exact for every commit kind:
  *
  *   - append commit (batch list grew, same truncation epoch): the new
  *     batches' rows are `insert`s;
  *   - deletion-vector commit ([[GraftStore.deleteWhere]]): the newly
  *     set bits name the `delete`d rows exactly — the precision a DV
  *     ledger buys CDC (a COW delete must diff whole batch contents);
  *   - MOR row-delta commit with journaled UPDATE lineage
  *     ([[GraftStore.Committed.lineage]]): each updated row renders as
  *     an `update_preimage`/`update_postimage` pair — the Delta CDF
  *     rendering, exact because the DV bits and delta batch are
  *     row-precise;
  *   - truncate-overwrite / COW rewrite / compaction: the pre-image's
  *     live rows are `delete`s and the post-image's are `insert`s (a
  *     COW UPDATE therefore reads as delete+insert, the honest
  *     rendering when the commit does not journal row lineage);
  *   - metadata-only evolution commit (same batches, schema changed):
  *     no row changes.
  *
  * Rows are rendered in the RANGE-END version's logical schema,
  * resolved BY NAME against each source snapshot's own view (a renamed
  * column's pre-rename rows still carry their values — slots are
  * stable; a column absent at some version reads NULL), plus
  * `_change_type` and `_commit_version` metadata columns.
  *
  * Computation is a driver-side walk of the in-JVM snapshot ledger —
  * at 100 TB the identical walk diffs the metadata log's file + DV
  * manifests per commit and plans a distributed scan over exactly the
  * changed files (what `table_changes` does in Delta); the LOGIC —
  * which rows each commit kind contributes — is what this implements
  * and what the gate checks.
  */
object ChangeFeed {

  /** Changes committed by versions (`fromVersion`, `toVersion`] of
    * catalog table `tbl` (e.g. "ns.t" under catalog `graft_cat`).
    */
  def tableChanges(s: SparkSession, tbl: String, fromVersion: Int,
      toVersion: Int, catalog: String = "graft_cat"): DataFrame = {
    val key = s"cat::$catalog.$tbl"
    val hist = histOf(key, tbl)
    require(fromVersion >= 0 && toVersion < hist.size && fromVersion <= toVersion,
      s"version range [$fromVersion, $toVersion] out of bounds " +
        s"(table has ${hist.size} commits)")
    require(hist(toVersion) != null,
      s"version $toVersion expired by retention — the change feed " +
        "renders in the range-end version's schema")
    val target = hist(toVersion).schema
    val out = outSchema(target)
    val toExternal = target.fields
      .map(f => CatalystTypeConverters.createToScalaConverter(f.dataType))
    val rows = internalChanges(hist, target, fromVersion, toVersion).map { vals =>
      val ext = new Array[Any](out.length)
      var j = 0
      while (j < target.length) {
        ext(j) = if (vals(j) == null) null else toExternal(j)(vals(j))
        j += 1
      }
      ext(target.length) = vals(target.length).toString // UTF8String → String
      ext(target.length + 1) = vals(target.length + 1)
      Row.fromSeq(ext.toIndexedSeq)
    }
    s.createDataFrame(java.util.Arrays.asList(rows: _*), out)
  }

  private[sources] def histOf(key: String, tbl: String)
      : Vector[GraftStore.Committed] = {
    require(!GraftCatalog.parts.contains(key),
      "table_changes on a partitioned table is unsupported — partition " +
        "shards commit independently (no table-level commit ordinals)")
    GraftStore.history.getOrElse(key,
      throw new IllegalStateException(s"no catalog table '$tbl'"))
  }

  private[sources] def outSchema(target: StructType): StructType =
    StructType(target.fields)
      .add("_change_type", StringType, nullable = false)
      .add("_commit_version", IntegerType, nullable = false)

  /** The ledger walk shared by the batch API and the `t@changes` CDC
    * table: rows in the INTERNAL value domain (UTF8String etc.), shaped
    * to `target` by name, with `_change_type` (UTF8String) and
    * `_commit_version` (Int) appended.
    */
  private[sources] def internalChanges(hist: Vector[GraftStore.Committed],
      target: StructType, fromVersion: Int, toVersion: Int)
      : Array[Array[Any]] = {
    (((fromVersion + 1) max 1) to toVersion).foreach(v => require(
      hist(v) != null && hist(v - 1) != null,
      s"version ${v - 1} or $v expired by retention — change feed " +
        "needs both sides of every diffed commit"))

    // existence defaults of the RANGE-END snapshot, aligned to `target`
    // by name: a row from a snapshot that predates a DEFAULT'd column
    // renders with the default — exactly how that row reads today
    val endSnap = hist(toVersion)
    val endPad: Array[Any] =
      if (endSnap == null) new Array[Any](target.length)
      else {
        val pad = endSnap.logicalPad
        target.fields.map { f =>
          val i = endSnap.schema.fieldNames
            .indexWhere(_.equalsIgnoreCase(f.name))
          if (i < 0 || i >= pad.length) null else pad(i)
        }
      }
    def render(snap: GraftStore.Committed, row: Array[Any],
        change: String, version: Int): Array[Any] = {
      val proj = snap.projection
      val pad = snap.logicalPad
      val srcIdx = target.fields.map { f =>
        snap.schema.fieldNames.indexWhere(_.equalsIgnoreCase(f.name))
      }
      val vals = new Array[Any](target.length + 2)
      var j = 0
      while (j < target.length) {
        val si = srcIdx(j)
        vals(j) =
          if (si < 0 || si >= proj.length) endPad(j) // column post-dates snap
          else if (proj(si) >= row.length) pad(si) // existence default
          else row(proj(si))
        j += 1
      }
      vals(target.length) =
        org.apache.spark.unsafe.types.UTF8String.fromString(change)
      vals(target.length + 1) = version
      vals
    }

    def liveRows(snap: GraftStore.Committed): Iterator[Array[Any]] =
      snap.batches.iterator.zipWithIndex.flatMap { case (batch, bi) =>
        val bits = snap.dvs.get(bi).map(java.util.BitSet.valueOf).orNull
        batch.iterator.zipWithIndex.collect {
          case (row, r) if bits == null || !bits.get(r) => row
        }
      }

    val changes = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]
    /** newly DV'd rows of `cur` vs `prev` as deletes (rendered from the
      * pre-image snapshot — that's what the rows meant when live).
      */
    def dvDeltaDeletes(prev: GraftStore.Committed, cur: GraftStore.Committed,
        v: Int, exclude: Set[Long] = Set.empty): Unit =
      cur.batches.zipWithIndex.foreach { case (batch, bi) =>
        val now = cur.dvs.get(bi).map(java.util.BitSet.valueOf).orNull
        if (now != null) {
          val before = prev.dvs.get(bi).map(java.util.BitSet.valueOf).orNull
          var r = now.nextSetBit(0)
          while (r >= 0) {
            if ((before == null || !before.get(r)) &&
                !exclude.contains(bi.toLong << 32 | r.toLong))
              changes += render(prev, batch(r), "delete", v)
            r = now.nextSetBit(r + 1)
          }
        }
      }
    (((fromVersion + 1) max 1) to toVersion).foreach { v =>
      val prev = hist(v - 1)
      val cur = hist(v)
      GraftStore.classifyCommit(prev, cur) match {
        case "rewrite" =>
          // full pre-image deletes + post-image inserts
          liveRows(prev).foreach(r => changes += render(prev, r, "delete", v))
          liveRows(cur).foreach(r => changes += render(cur, r, "insert", v))
        case "append" =>
          cur.batches.drop(prev.batches.size).foreach(_.foreach(r =>
            changes += render(cur, r, "insert", v)))
        case "delete-vectors" =>
          dvDeltaDeletes(prev, cur, v)
        case "row-delta" =>
          // a MOR WriteDelta commit journals its UPDATE lineage
          // ([[GraftStore.Committed.lineage]]): each (old position →
          // delta-batch index) pair renders as update_preimage /
          // update_postimage — the Delta CDF model, possible here
          // because DV bits + the delta batch are row-exact. The
          // REMAINING DV delta is genuine deletes, the REMAINING delta
          // rows genuine inserts — row-precise, where a COW format must
          // diff whole file contents.
          val lin = cur.lineage
          val newRows = cur.batches.drop(prev.batches.size).flatten
          lin.foreach { case (pos, i) =>
            val bi = (pos >>> 32).toInt
            val r = pos.toInt
            changes += render(prev, prev.batches(bi)(r), "update_preimage", v)
            changes += render(cur, newRows(i), "update_postimage", v)
          }
          dvDeltaDeletes(prev, cur, v, exclude = lin.map(_._1).toSet)
          val linIdx = lin.map(_._2).toSet
          newRows.zipWithIndex.foreach { case (r, i) =>
            if (!linIdx.contains(i)) changes += render(cur, r, "insert", v)
          }
        case _ => // evolve/unknown: metadata only — no row changes
      }
    }
    changes.toArray
  }
}

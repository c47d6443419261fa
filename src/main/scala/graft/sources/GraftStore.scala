package graft.sources

import java.util

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The SINK half of the DataSource V2 connector surface (the read half —
  * scan, filter/column/aggregate pushdown, micro-batch streaming — is
  * [[LaunchApiSource]]): a writable table with the REAL two-phase commit
  * protocol Spark's V2 write path runs:
  *
  *   1. every task's [[DataWriter]] buffers its partition and, on task
  *      commit, ships the rows as its [[WriterCommitMessage]] — nothing
  *      is visible yet;
  *   2. the driver's [[BatchWrite.commit]] publishes ALL messages in one
  *      atomic registry swap — a failed/aborted job publishes NOTHING
  *      ([[BatchWrite.abort]] simply never swaps), so readers can never
  *      observe a torn write (spec-proven: a poisoned partition leaves
  *      the store byte-identical).
  *
  * Append and truncate-overwrite are both supported
  * ([[org.apache.spark.sql.connector.write.SupportsTruncate]] — Spark
  * plans `mode("overwrite")` on a path-less V2 table as truncate).
  * The backing store is an in-JVM registry (the memory-sink convention —
  * fixtures, not service plumbing); at 100 TB the identical protocol
  * commits files to an object store + a transactional table format's
  * log, and ONLY [[GraftStore.publish]]'s swap changes: task buffers
  * become staged files, commit messages carry file manifests, the
  * atomic swap is the metadata-log append. The protocol on the Spark
  * side — which IS what this class exercises — is unchanged.
  */
class GraftStore extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val name = GraftStore.storeName(options)
    GraftStore.stores.get(name).map(_.schema).getOrElse(
      throw new IllegalArgumentException(
        s"graft store '$name' does not exist yet — write it first or pass a schema"))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftStoreTable(
      GraftStore.storeName(new CaseInsensitiveStringMap(properties)), schema)

  override def supportsExternalMetadata(): Boolean = true
}

object GraftStore {
  final case class Committed(schema: StructType, batches: Seq[Array[Array[Any]]]) {
    def rowCount: Long = batches.iterator.map(_.length.toLong).sum
  }

  /** name → committed contents; the swap in [[publish]] is the commit. */
  private[sources] val stores = TrieMap.empty[String, Committed]

  /** name → every committed snapshot in publish order (version 0 = the
    * create) — the metadata-log analogue that makes `VERSION AS OF`
    * resolvable ([[GraftCatalog.loadTable(ident, version)]]). Bounded by
    * the number of commits to harness tables, which are dropped after
    * each gated query.
    */
  private[sources] val history = TrieMap.empty[String, Vector[Committed]]

  private[sources] def storeName(options: CaseInsensitiveStringMap): String = {
    val n = options.get("store")
    require(n != null && n.nonEmpty, "graft store requires option 'store'")
    n
  }

  /** The atomic publish step — ONE registry swap, so a reader sees either
    * the pre-write or the complete post-write contents, never a prefix.
    * An APPEND keeps the table's DECLARED schema (an incoming frame's
    * tighter nullability — e.g. a literal column — must not narrow it:
    * post-evolution rows read padded NULLs, so a narrowed `tag` would
    * crash every subsequent scan); truncate-overwrite adopts the write's
    * schema, the store's pre-catalog semantics.
    */
  private[sources] def publish(name: String, schema: StructType,
      incoming: Seq[Array[Array[Any]]], truncate: Boolean): Unit =
    stores.synchronized {
      val prior =
        if (truncate) Seq.empty
        else stores.get(name).map(_.batches).getOrElse(Seq.empty)
      val sch =
        if (truncate) schema
        else stores.get(name).map(_.schema).getOrElse(schema)
      val snap = Committed(sch, prior ++ incoming)
      stores.put(name, snap)
      history.put(name, history.getOrElse(name, Vector.empty) :+ snap)
      ()
    }

  private[graft] def drop(name: String): Unit =
    { stores.remove(name); history.remove(name); epochs.remove(name); () }

  /** Evict every store under `prefix` except `keep` — the stale-session /
    * stale-fixture cleanup for appId-keyed harness stores (ADVICE r11):
    * the live store stays resident (the read side is lazy and Bench
    * re-reads it), but at most ONE copy per prefix survives, so a dead
    * session's or a rewritten fixture's feed doesn't pin driver memory
    * for the JVM lifetime.
    */
  private[graft] def dropExcept(prefix: String, keep: String): Unit =
    stores.keys.filter(k => k.startsWith(prefix) && k != keep).foreach(drop)
  private[graft] def dropMatching(p: String => Boolean): Unit =
    stores.keys.filter(p).foreach(drop)
  private[graft] def rowCount(name: String): Long =
    stores.get(name).map(_.rowCount).getOrElse(0L)
  /** Test hook: the committed batch seq BY REFERENCE, so specs can prove
    * an untouched COW group was never rewritten (eq, not ==).
    */
  private[graft] def batchesRef(name: String): Option[Seq[Array[Array[Any]]]] =
    stores.get(name).map(_.batches)
  private[graft] def versionCount(name: String): Int =
    history.get(name).map(_.size).getOrElse(0)

  /** name → highest streaming epoch committed — the exactly-once ledger:
    * a replayed epoch (post-failure re-delivery of the same micro-batch)
    * must commit as a NO-OP, which is the streaming sink contract every
    * transactional format implements with an epoch column in its log.
    */
  private[sources] val epochs = TrieMap.empty[String, Long]

  /** Shared reader: rows committed under an OLDER schema are shorter
    * than the live one — pad with NULLs to `width` (the lazy-back-fill
    * half of [[evolveSchema]]'s metadata-only contract).
    */
  private[sources] def paddedReaderFactory(width: Int): PartitionReaderFactory =
    (p: InputPartition) => new PartitionReader[InternalRow] {
      private val rows = p.asInstanceOf[GraftStorePartition].rows
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = {
        val r = rows(i)
        if (r.length >= width) new GenericInternalRow(r)
        else new GenericInternalRow(java.util.Arrays.copyOf(
          r.asInstanceOf[Array[AnyRef]], width).asInstanceOf[Array[Any]])
      }
      override def close(): Unit = ()
    }

  /** Metadata-only schema evolution: re-commit the CURRENT batches under
    * the evolved schema (one history version, no data rewrite) — rows
    * shorter than the schema are padded with NULLs at scan time.
    */
  private[graft] def evolveSchema(name: String, newSchema: StructType): Unit =
    stores.synchronized {
      val cur = stores.getOrElse(name,
        throw new IllegalStateException(s"no store '$name' to evolve"))
      val snap = Committed(newSchema, cur.batches)
      stores.put(name, snap)
      history.put(name, history.getOrElse(name, Vector.empty) :+ snap)
      ()
    }

  /** Streaming epoch commit: publish-append unless this epoch (or a
    * later one) already committed — idempotent under micro-batch replay.
    * Returns whether the epoch was applied (false = replay no-op).
    */
  private[graft] def publishEpoch(name: String, schema: StructType,
      incoming: Seq[Array[Array[Any]]], epochId: Long): Boolean =
    stores.synchronized {
      if (epochs.get(name).exists(_ >= epochId)) false
      else {
        publish(name, schema, incoming, truncate = false)
        epochs.put(name, epochId)
        true
      }
    }
}

private[sources] class GraftStoreTable(name: String, declared: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_store($name)"
  override def schema(): StructType =
    GraftStore.stores.get(name).map(_.schema).getOrElse(declared)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new GraftStoreScan(name, schema())
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftStoreWriteBuilder(name, info.schema())
}

/** Streaming epochs into the store: every micro-batch is one
  * append-commit through [[GraftStore.publishEpoch]]'s exactly-once
  * ledger (a replayed epoch is a no-op), and — because the publish path
  * is shared — one VERSION in the table's time-travel history: streaming
  * commits are first-class commits.
  */
private[sources] class GraftStoreStreamingWrite(name: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
    val s = schema
    (_: Int, _: Long, _: Long) => new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]
      override def write(r: InternalRow): Unit = {
        val vals = new Array[Any](s.length)
        var i = 0
        while (i < s.length) {
          val v = r.get(i, s(i).dataType)
          vals(i) = v match {
            case u: org.apache.spark.unsafe.types.UTF8String => u.copy()
            case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
            case m: org.apache.spark.sql.catalyst.util.MapData => m.copy()
            case row: InternalRow => row.copy()
            case other => other
          }
          i += 1
        }
        buf += vals
      }
      override def commit(): WriterCommitMessage = GraftStoreCommit(buf.toArray)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    GraftStore.publishEpoch(name, schema,
      messages.map(_.asInstanceOf[GraftStoreCommit].rows).toSeq, epochId)
    ()
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] class GraftStoreScan(name: String, val s: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = s
  override def toBatch: Batch = this
  override def description(): String = s"graft_store($name) scan"
  override def planInputPartitions(): Array[InputPartition] =
    // loud, not empty: a store that existed at load() time (inferSchema
    // requires it) but is gone at scan time was EVICTED — silently
    // returning zero rows would surface as a baffling row-count mismatch
    // instead of this diagnosable staleness error (review r12)
    GraftStore.stores.get(name).map(_.batches).getOrElse(
        throw new IllegalStateException(
          s"graft store '$name' no longer exists — evicted or dropped " +
            "after this reader was planned; re-run the writing query"))
      .map(b => GraftStorePartition(b): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    GraftStore.paddedReaderFactory(s.length)
}

private[sources] case class GraftStorePartition(rows: Array[Array[Any]])
    extends InputPartition

private[sources] class GraftStoreWriteBuilder(name: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new GraftStoreBatchWrite(name, schema, doTruncate)
    override def toStreaming
        : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      // the epoch ledger is append-only; honoring truncate would mean
      // replace-per-epoch (Complete mode), which silently duplicating
      // instead (pre-r15 behavior) must never stand in for — reject loud
      if (doTruncate) throw new UnsupportedOperationException(
        "graft store streaming writes are append-only (exactly-once epoch " +
          "ledger); Complete/truncate output mode is unsupported — use " +
          "Append or Update")
      else new GraftStoreStreamingWrite(name, schema)
  }
}

private[sources] case class GraftStoreCommit(rows: Array[Array[Any]])
    extends WriterCommitMessage

private[sources] class GraftStoreBatchWrite(
    name: String, schema: StructType, truncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val s = schema
    (_: Int, _: Long) => new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]
      override def write(r: InternalRow): Unit = {
        val vals = new Array[Any](s.length)
        var i = 0
        while (i < s.length) {
          // materialize per-field: every buffer-backed value (UTF8String,
          // UnsafeArrayData/MapData, nested UnsafeRow) is a VIEW into the
          // reused input row's transient bytes — copy each out, or the
          // committed rows silently alias whatever the writer sees next
          // (ADVICE r11). copy() on the unsafe variants duplicates the
          // backing bytes; primitives/Decimal/CalendarInterval are safe.
          val v = r.get(i, s(i).dataType)
          vals(i) = v match {
            case u: org.apache.spark.unsafe.types.UTF8String => u.copy()
            case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
            case m: org.apache.spark.sql.catalyst.util.MapData => m.copy()
            case row: InternalRow => row.copy()
            case other => other
          }
          i += 1
        }
        buf += vals
      }
      override def commit(): WriterCommitMessage = GraftStoreCommit(buf.toArray)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    GraftStore.publish(name, schema,
      messages.map(_.asInstanceOf[GraftStoreCommit].rows).toSeq, truncate)

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The CATALOG rung of the DSv2 ladder ([[GraftStore]] is the anonymous
  * TableProvider rung): named tables resolvable from SQL text
  * (`graft_cat.ns.t`), created/dropped through the V2 `TableCatalog`
  * API, and — the point — implementing `SupportsRowLevelOperations`, so
  * Spark's row-level DML (`MERGE INTO`, `UPDATE`, `DELETE`) plans
  * against them natively. Register with
  * `spark.sql.catalog.graft_cat=graft.sources.GraftCatalog`.
  *
  * Row-level semantics are GROUP-BASED copy-on-write with the whole
  * table as the single group: the operation's scan reads every row,
  * Spark's rewrite (`RewriteMergeIntoTable` / `RewriteUpdateTable` /
  * `RewriteDeleteFromTable`) computes the surviving row set, and the
  * operation's write publishes it through [[GraftStoreBatchWrite]] with
  * truncate-replace semantics — the same two-phase commit as every
  * other write, so an aborted DML publishes nothing. At 100 TB the
  * identical protocol is per-FILE copy-on-write: `filter()` pushdown on
  * the op's scan narrows the rewritten group set to matched files
  * (Delta/Iceberg's model); the in-JVM registry keeps the harness
  * deterministic while the Spark-side plumbing — analysis, rewrite
  * plans, 2PC — is exactly the production path.
  *
  * Storage shares [[GraftStore.stores]] under a `cat::`-prefixed key, so
  * the store's eviction/commit machinery applies unchanged.
  */
class GraftCatalog extends TableCatalog {
  private var catName: String = "graft_cat"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catName = name
  override def name(): String = catName

  private def key(ident: Identifier): String =
    s"cat::$catName.${(ident.namespace :+ ident.name).mkString(".")}"

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val prefix = s"cat::$catName.${namespace.mkString(".")}."
    GraftStore.stores.keys.toArray.collect {
      case k if k.startsWith(prefix) =>
        Identifier.of(namespace, k.stripPrefix(prefix))
    }
  }

  override def loadTable(ident: Identifier): Table =
    GraftStore.stores.get(key(ident)) match {
      case Some(c) => new GraftRowLevelTable(key(ident), c.schema)
      case None => throw new NoSuchTableException(ident)
    }

  /** `VERSION AS OF n` — versions are commit ordinals (0 = the create),
    * resolved against the store's snapshot history: the metadata-log
    * read a transactional table format serves here, so every committed
    * state of a DML'd table stays queryable.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val hist = GraftStore.history.getOrElse(key(ident),
      throw new NoSuchTableException(ident))
    val v = try version.toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft catalog versions are integer commit ordinals, got '$version'")
    }
    require(v >= 0 && v < hist.size,
      s"version $v out of range: table has ${hist.size} commits (0..${hist.size - 1})")
    new GraftVersionTable(s"${key(ident)}@v$v", hist(v))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty, "graft catalog tables are unpartitioned")
    if (GraftStore.stores.contains(key(ident)))
      throw new TableAlreadyExistsException((ident.namespace :+ ident.name).toSeq)
    GraftStore.publish(key(ident), schema, Seq.empty, truncate = true)
    new GraftRowLevelTable(key(ident), schema)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog: ALTER TABLE unsupported")

  override def dropTable(ident: Identifier): Boolean =
    GraftStore.stores.remove(key(ident)).isDefined

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog: RENAME unsupported")
}

/** A catalog table that additionally accepts row-level DML: the
  * whole-table group-based COW operation described on [[GraftCatalog]].
  *
  * The `_group` METADATA column is load-bearing plumbing, not
  * decoration: Spark's `ReplaceDataExec` applies the rewrite plan's
  * row projection (which strips `__row_operation` and friends off the
  * `MergeRows` output before the connector's writer sees a row) only
  * through `DataAndMetadataWritingSparkTask` — chosen iff the operation
  * declares required metadata attributes. A group-based COW connector
  * therefore always declares at least its group identifier (Iceberg's
  * `_file`); here the whole table is one group, so the column is a
  * constant 0.
  */
private[sources] class GraftRowLevelTable(storeKey: String, declared: StructType)
    extends GraftStoreTable(storeKey, declared)
    with SupportsRowLevelOperations with SupportsMetadataColumns {

  override def metadataColumns(): Array[MetadataColumn] =
    Array(new MetadataColumn {
      override def name(): String = "_group"
      override def dataType(): org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.IntegerType
      override def isNullable: Boolean = false
      override def comment(): String = "COW group id (single whole-table group)"
    })

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation = new RowLevelOperation {
        override def command: RowLevelOperation.Command = info.command
        override def description(): String =
          s"graft COW ${info.command} on $storeKey"
        override def requiredMetadataAttributes()
            : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
          Array(org.apache.spark.sql.connector.expressions.Expressions.column("_group"))
        override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
          new ScanBuilder {
            override def build() = new GraftGroupScan(storeKey, schema())
          }
        // the write REPLACES the single whole-table group the scan read:
        // truncate-then-publish under the standard 2PC
        override def newWriteBuilder(lwi: LogicalWriteInfo): WriteBuilder =
          new GraftStoreWriteBuilder(storeKey, lwi.schema()).truncate()
      }
    }
}

/** A read-only table over one ARCHIVED snapshot — what `VERSION AS OF`
  * resolves to. The scan captures the immutable snapshot at load time,
  * so later commits (or even a drop) cannot move a time-travel read.
  */
private[sources] class GraftVersionTable(nm: String, snap: GraftStore.Committed)
    extends Table with SupportsRead {
  override def name(): String = s"graft_store($nm)"
  override def schema(): StructType = snap.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = snap.schema
        override def toBatch: Batch = this
        override def description(): String = s"graft_store($nm) snapshot scan"
        override def planInputPartitions(): Array[InputPartition] =
          snap.batches.map(b => GraftStorePartition(b): InputPartition).toArray
        override def createReaderFactory(): PartitionReaderFactory =
          (p: InputPartition) => new PartitionReader[InternalRow] {
            private val rows = p.asInstanceOf[GraftStorePartition].rows
            private var i = -1
            override def next(): Boolean = { i += 1; i < rows.length }
            override def get(): InternalRow = new GenericInternalRow(rows(i))
            override def close(): Unit = ()
          }
      }
    }
}

/** [[GraftStoreScan]] plus the constant `_group` metadata column the
  * row-level operation requires.
  */
private[sources] class GraftGroupScan(name: String, dataSchema: StructType)
    extends Scan with Batch {
  private val full = dataSchema.add("_group",
    org.apache.spark.sql.types.IntegerType, nullable = false)
  override def readSchema(): StructType = full
  override def toBatch: Batch = this
  override def description(): String = s"graft_store($name) group scan"
  override def planInputPartitions(): Array[InputPartition] =
    GraftStore.stores.get(name).map(_.batches).getOrElse(
        throw new IllegalStateException(
          s"graft store '$name' no longer exists — evicted or dropped"))
      .map(b => GraftStorePartition(b): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    (p: InputPartition) => new PartitionReader[InternalRow] {
      private val rows = p.asInstanceOf[GraftStorePartition].rows
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow =
        new GenericInternalRow(rows(i) :+ (0: Any))
      override def close(): Unit = ()
    }
}

package graft.sources

import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The partition TRANSFORM of a partitioned catalog table — identity
  * (r14's original), or the HIDDEN transforms `days(ts)` / `bucket(n,
  * col)` (Iceberg's innovation over Hive partitioning): rows are routed
  * to a partition value DERIVED from a source column, and reads prune
  * partitions from predicates on the SOURCE column — users never name,
  * or even know, the partition value. `valueOf` is the write-side
  * routing; `keepFor` translates pushed source-column filters into a
  * shard-value predicate (conservative: unknown filter shapes keep
  * everything — pruning is shard-grained, Spark re-filters rows);
  * `dropSetFor` is the STRICT translation a metadata partition-drop
  * DELETE needs (exact or refuse — a day shard can only be dropped by a
  * day-aligned range).
  */
private[sources] sealed trait PartSpec {
  def sourceCol: String
  /** route one row: the derived partition value (a string). */
  def valueOf(v: Any): String
  def transform: org.apache.spark.sql.connector.expressions.Transform
}

private[sources] object PartSpec {
  import org.apache.spark.sql.connector.expressions.{Expressions, Transform}

  final case class IdentityPart(sourceCol: String) extends PartSpec {
    override def valueOf(v: Any): String = String.valueOf(v)
    override def transform: Transform = Expressions.identity(sourceCol)
  }

  /** `days(ts)`: partition value = UTC epoch-day ordinal of a
    * timestamp/date column (internal micros/days domain).
    */
  final case class DaysPart(sourceCol: String, dt: DataType) extends PartSpec {
    override def valueOf(v: Any): String = String.valueOf(dayOf(v))
    private[sources] def dayOf(v: Any): Long = v match {
      case micros: java.lang.Long => Math.floorDiv(micros, MicrosPerDay)
      case days: java.lang.Integer => days.toLong
      case other => throw new IllegalStateException(
        s"days($sourceCol): unroutable internal value $other")
    }
    override def transform: Transform = Expressions.days(sourceCol)
  }

  /** `bucket(n, col)`: partition value = murmur3(col) pmod n — the
    * Iceberg bucket transform (a real hash, so co-grouping survives
    * skewed key domains; same function on both the write route and the
    * equality-pruning side).
    */
  final case class BucketPart(n: Int, sourceCol: String, dt: DataType)
      extends PartSpec {
    override def valueOf(v: Any): String = String.valueOf(bucketOf(v))
    private[sources] def bucketOf(v: Any): Int = {
      val h = Murmur3HashFunction.hash(v, dt, 42L).toInt
      val m = h % n
      if (m < 0) m + n else m
    }
    override def transform: Transform = Expressions.bucket(n, sourceCol)
  }

  val MicrosPerDay: Long = 86400L * 1000000L

  /** external (pushed-filter-side) value → the column's INTERNAL domain
    * (shared shapes with [[StoreSkipping.toInternal]], scoped to the
    * types partition transforms route).
    */
  private[sources] def toInternal(dt: DataType, v: Any): Option[Any] =
    (dt, v) match {
      case (_, null) => None
      case (StringType, s: String) => Some(UTF8String.fromString(s))
      case (DateType, d: java.sql.Date) => Some(DateTimeUtils.fromJavaDate(d))
      case (DateType, d: java.time.LocalDate) =>
        Some(DateTimeUtils.localDateToDays(d))
      case (TimestampType, t: java.sql.Timestamp) =>
        Some(DateTimeUtils.fromJavaTimestamp(t))
      case (TimestampType, t: java.time.Instant) =>
        Some(DateTimeUtils.instantToMicros(t))
      case (ByteType | ShortType | IntegerType | LongType,
          n @ (_: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
               _: java.lang.Long)) => Some(n)
      case _ => None
    }

  /** Shard-suffix codec for MULTI-SPEC tables (partition-spec
    * evolution): spec id 0 keeps the RAW partition value as its shard
    * suffix — a table that never evolves never pays any encoding and
    * every pre-evolution key stays valid — while spec id N >= 1
    * appends `#s=N`. `decodeSuffix` is consulted only for tables whose
    * spec vector has grown; `evolve_spec` refuses up front if any
    * pre-existing raw suffix would itself parse as encoded (the one
    * ambiguity the scheme admits).
    */
  private val SpecTag = """^(.*)#s=(\d+)$""".r
  def encodeSuffix(value: String, specId: Int): String =
    if (specId == 0) value else s"$value#s=$specId"
  def decodeSuffix(suffix: String): (Int, String) = suffix match {
    case SpecTag(v, id) => (id.toInt, v)
    case _ => (0, suffix)
  }
  def suffixLooksEncoded(suffix: String): Boolean =
    SpecTag.matches(suffix)

  /** Translate the pushed source/partition-column filters into a
    * shard-value keep-predicate. None = no applicable filter (keep all).
    * Always CONSERVATIVE: a day-range bound keeps its boundary shard
    * (rows are re-filtered); shapes we can't translate contribute
    * nothing.
    */
  def keepFor(spec: PartSpec,
      filters: Seq[org.apache.spark.sql.sources.Filter])
      : Option[String => Boolean] = {
    import org.apache.spark.sql.sources._
    val preds: Seq[String => Boolean] = spec match {
      case IdentityPart(c) => filters.collect {
        case EqualTo(col, v: String) if col.equalsIgnoreCase(c) => (s: String) => s == v
        case EqualNullSafe(col, v: String) if col.equalsIgnoreCase(c) => (s: String) => s == v
        case In(col, vs) if col.equalsIgnoreCase(c) =>
          val set = vs.collect { case x: String => x }.toSet
          (s: String) => set(s)
      }
      case dp @ DaysPart(c, dt) =>
        def day(v: Any): Option[Long] = toInternal(dt, v).map(dp.dayOf)
        filters.flatMap {
          case EqualTo(col, v) if col.equalsIgnoreCase(c) =>
            day(v).map(d => (s: String) => s.toLong == d)
          case GreaterThan(col, v) if col.equalsIgnoreCase(c) =>
            day(v).map(d => (s: String) => s.toLong >= d)
          case GreaterThanOrEqual(col, v) if col.equalsIgnoreCase(c) =>
            day(v).map(d => (s: String) => s.toLong >= d)
          case LessThan(col, v) if col.equalsIgnoreCase(c) =>
            day(v).map(d => (s: String) => s.toLong <= d)
          case LessThanOrEqual(col, v) if col.equalsIgnoreCase(c) =>
            day(v).map(d => (s: String) => s.toLong <= d)
          case _ => None
        }
      case bp @ BucketPart(_, c, dt) => filters.flatMap {
        case org.apache.spark.sql.sources.EqualTo(col, v) if col.equalsIgnoreCase(c) =>
          toInternal(dt, v).map(bp.bucketOf).map(b =>
            (s: String) => s.toInt == b)
        case org.apache.spark.sql.sources.In(col, vs) if col.equalsIgnoreCase(c) =>
          val bs = vs.flatMap(v => toInternal(dt, v).map(bp.bucketOf)).toSet
          if (bs.size == vs.length) Some((s: String) => bs(s.toInt)) else None
        case _ => None
      }
    }
    if (preds.isEmpty) None
    else Some(s => preds.forall(_(s)))
  }
}

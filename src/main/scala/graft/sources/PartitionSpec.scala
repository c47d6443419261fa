package graft.sources

import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The partition TRANSFORM of a partitioned catalog table — identity
  * (r14's original), or the HIDDEN transforms `days(ts)` / `months(ts)`
  * / `years(ts)` / `hours(ts)` / `truncate(w, col)` / `bucket(n, col)`
  * (the full Iceberg transform family): rows are routed
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

  /** `months(ts)` / `years(ts)`: partition value = months (years) since
    * the 1970-01 epoch — the calendar-grain siblings of [[DaysPart]]
    * (Iceberg's `months`/`years` transforms; monthly-partitioned fact
    * tables are the most common warehouse layout at 100 TB). The
    * ordinal is derived from the UTC epoch day through proleptic
    * Gregorian calendar math, so the write route, the pruning side and
    * the catalog function ([[TransformFunctions]]) all share one
    * definition.
    */
  final case class MonthsPart(sourceCol: String, dt: DataType) extends PartSpec {
    override def valueOf(v: Any): String = String.valueOf(monthOf(v))
    private[sources] def monthOf(v: Any): Long =
      monthsFromEpochDay(epochDayOf(sourceCol, "months", v))
    override def transform: Transform = Expressions.months(sourceCol)
  }

  final case class YearsPart(sourceCol: String, dt: DataType) extends PartSpec {
    override def valueOf(v: Any): String = String.valueOf(yearOf(v))
    private[sources] def yearOf(v: Any): Long =
      yearsFromEpochDay(epochDayOf(sourceCol, "years", v))
    override def transform: Transform = Expressions.years(sourceCol)
  }

  /** `hours(ts)`: UTC epoch-hour ordinal — timestamp columns only (an
    * hour of a DATE is meaningless; Iceberg refuses it too).
    */
  final case class HoursPart(sourceCol: String, dt: DataType) extends PartSpec {
    override def valueOf(v: Any): String = String.valueOf(hourOf(v))
    private[sources] def hourOf(v: Any): Long = v match {
      case micros: java.lang.Long => Math.floorDiv(micros, MicrosPerHour)
      case other => throw new IllegalStateException(
        s"hours($sourceCol): unroutable internal value $other")
    }
    override def transform: Transform = Expressions.hours(sourceCol)
  }

  /** `truncate(w, col)`: partition value = the width-`w` truncation of
    * the source value (Iceberg's truncate transform) — integers floor
    * to the nearest multiple of `w` BELOW the value (floor-mod, so
    * negatives stay ordered: truncate(10, -1) = -10), strings keep
    * their first `w` code points. Range predicates on a truncated
    * integer prune like `days`; string equality/prefix predicates prune
    * to the literal's own truncation.
    */
  final case class TruncatePart(w: Int, sourceCol: String, dt: DataType)
      extends PartSpec {
    override def valueOf(v: Any): String = truncOf(v)
    private[sources] def truncOf(v: Any): String = v match {
      case u: UTF8String =>
        (if (u.numChars() <= w) u else u.substring(0, w)).toString
      case n @ (_: java.lang.Byte | _: java.lang.Short |
                _: java.lang.Integer | _: java.lang.Long) =>
        val x = n.asInstanceOf[Number].longValue
        String.valueOf(x - Math.floorMod(x, w.toLong))
      case other => throw new IllegalStateException(
        s"truncate($w, $sourceCol): unroutable internal value $other")
    }
    override def transform: Transform = Expressions.apply("truncate",
      Expressions.literal(w), Expressions.column(sourceCol))
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
  val MicrosPerHour: Long = 3600L * 1000000L

  /** UTC epoch day of an internal timestamp (micros Long) or date (days
    * Int) value — the shared stepping stone of the calendar transforms.
    */
  private[sources] def epochDayOf(col: String, fn: String, v: Any): Long =
    v match {
      case micros: java.lang.Long => Math.floorDiv(micros, MicrosPerDay)
      case days: java.lang.Integer => days.toLong
      case other => throw new IllegalStateException(
        s"$fn($col): unroutable internal value $other")
    }

  /** Months since 1970-01 of a UTC epoch day (proleptic Gregorian). */
  private[sources] def monthsFromEpochDay(day: Long): Long = {
    val ld = java.time.LocalDate.ofEpochDay(day)
    (ld.getYear - 1970).toLong * 12L + (ld.getMonthValue - 1)
  }

  /** Years since 1970 of a UTC epoch day. */
  private[sources] def yearsFromEpochDay(day: Long): Long =
    (java.time.LocalDate.ofEpochDay(day).getYear - 1970).toLong

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
        ordinalRangePreds(c, v => toInternal(dt, v).map(dp.dayOf), filters)
      case mp @ MonthsPart(c, dt) =>
        ordinalRangePreds(c, v => toInternal(dt, v).map(mp.monthOf), filters)
      case yp @ YearsPart(c, dt) =>
        ordinalRangePreds(c, v => toInternal(dt, v).map(yp.yearOf), filters)
      case hp @ HoursPart(c, dt) =>
        ordinalRangePreds(c, v => toInternal(dt, v).map(hp.hourOf), filters)
      case tp @ TruncatePart(w, c, dt) => dt match {
        case StringType => filters.flatMap {
          case EqualTo(col, v) if col.equalsIgnoreCase(c) =>
            toInternal(dt, v).map(tp.truncOf).map(t => (s: String) => s == t)
          case StringStartsWith(col, p) if col.equalsIgnoreCase(c) =>
            // a prefix at least w long pins the shard exactly; a shorter
            // one keeps every shard the prefix itself prefixes
            if (p.length >= w)
              Some((s: String) => s == p.substring(0, w))
            else Some((s: String) => s.startsWith(p))
          case _ => None
        }
        case _ => // integral truncate: floor bounds, boundary shard kept
          ordinalRangePreds(c,
            v => toInternal(dt, v).map(x => tp.truncOf(x).toLong), filters)
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

  /** The shared range-translation of every ORDER-PRESERVING ordinal
    * transform (`days`/`months`/`years`/`hours`/integral `truncate`):
    * a comparison on the source column becomes the same comparison on
    * the shard ordinal, NON-STRICT on both sides — the literal's own
    * shard is always kept (it may hold rows on either side of the
    * bound; pruning is shard-grained, Spark re-filters rows).
    */
  private def ordinalRangePreds(c: String, ord: Any => Option[Long],
      filters: Seq[org.apache.spark.sql.sources.Filter])
      : Seq[String => Boolean] = {
    import org.apache.spark.sql.sources._
    filters.flatMap {
      case EqualTo(col, v) if col.equalsIgnoreCase(c) =>
        ord(v).map(d => (s: String) => s.toLong == d)
      case GreaterThan(col, v) if col.equalsIgnoreCase(c) =>
        ord(v).map(d => (s: String) => s.toLong >= d)
      case GreaterThanOrEqual(col, v) if col.equalsIgnoreCase(c) =>
        ord(v).map(d => (s: String) => s.toLong >= d)
      case LessThan(col, v) if col.equalsIgnoreCase(c) =>
        ord(v).map(d => (s: String) => s.toLong <= d)
      case LessThanOrEqual(col, v) if col.equalsIgnoreCase(c) =>
        ord(v).map(d => (s: String) => s.toLong <= d)
      case _ => None
    }
  }
}

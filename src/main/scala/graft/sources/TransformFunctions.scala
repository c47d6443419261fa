package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** Catalog FUNCTIONS for the hidden partition transforms (VERDICT r17
  * #2): with `days` and `bucket` loadable from the table's catalog,
  * Spark's `V2ExpressionUtils.toCatalyst` can translate a
  * transform-partitioned table's `Distributions.clustered(days(ts))`
  * into a shuffle key, so the CLUSTERED WRITE DISTRIBUTION
  * ([[GraftPartitionedTable]]'s `RequiresDistributionAndOrdering`)
  * fires for `days`/`bucket` tables too — previously identity-only,
  * leaving the single most common 100 TB shape (a day-partitioned
  * event log) fragmenting up to tasks×shards batches per multi-task
  * append. This is exactly Iceberg's FunctionCatalog-registered
  * transform-function model.
  *
  * The bound functions MUST induce the same equivalence classes as the
  * write-side routing ([[PartSpec.DaysPart.dayOf]] /
  * [[PartSpec.BucketPart.bucketOf]]) — clustering correctness needs
  * equal-routed rows to hash equal, which same-valued functions
  * guarantee; both sides share the epoch-day floor-div and the
  * murmur3(seed=42) pmod n here.
  */
private[sources] object TransformFunctions {

  /** `days(ts)` — UTC epoch-day ordinal of a timestamp/date column.
    * Binds per input type so the MAGIC `invoke` stays codegen-friendly
    * (primitive long/int in, long out — no boxing in the exchange's
    * key projection).
    */
  class DaysUnbound extends UnboundFunction {
    override def name(): String = "days"
    override def description(): String =
      "days(ts): UTC epoch-day ordinal (hidden partition transform)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"days takes exactly one argument, got ${inputType.length}")
      inputType.fields(0).dataType match {
        // bind to the ACTUAL micros type: declaring TimestampType for
        // an NTZ argument would make Spark insert an NTZ→LTZ cast that
        // shifts the wall-clock by the session timezone, disagreeing
        // with the write-side raw floorDiv routing
        case dt @ (TimestampType | TimestampNTZType) =>
          new DaysOfMicros(dt)
        case DateType => new DaysOfDate
        case dt => throw new UnsupportedOperationException(
          s"days is not defined on ${dt.catalogString}")
      }
    }
  }

  class DaysOfMicros(dt: DataType) extends ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[DataType] = Array(dt)
    override def resultType(): DataType = LongType
    override def name(): String = "days"
    override def canonicalName(): String =
      s"graft.days(${dt.catalogString})"
    def invoke(micros: Long): Long =
      Math.floorDiv(micros, PartSpec.MicrosPerDay)
    override def produceResult(input: InternalRow): java.lang.Long =
      if (input.isNullAt(0)) null else invoke(input.getLong(0))
  }

  class DaysOfDate extends ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[DataType] = Array(DateType)
    override def resultType(): DataType = LongType
    override def name(): String = "days"
    override def canonicalName(): String = "graft.days(date)"
    def invoke(days: Int): Long = days.toLong
    override def produceResult(input: InternalRow): java.lang.Long =
      if (input.isNullAt(0)) null else invoke(input.getInt(0))
  }

  /** `months(ts)` / `years(ts)` — calendar ordinals since the 1970
    * epoch, sharing [[PartSpec.monthsFromEpochDay]] /
    * [[PartSpec.yearsFromEpochDay]] with the write-side routing so the
    * clustered-write shuffle key and the row router can never disagree.
    * Same NTZ-binding discipline as `days`: bind to the ACTUAL micros
    * type so Spark never inserts a wall-clock-shifting NTZ→LTZ cast.
    */
  class MonthsUnbound extends UnboundFunction {
    override def name(): String = "months"
    override def description(): String =
      "months(ts): months since 1970-01 (hidden partition transform)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"months takes exactly one argument, got ${inputType.length}")
      inputType.fields(0).dataType match {
        case dt @ (TimestampType | TimestampNTZType) =>
          new CalendarOfMicros("months", dt, PartSpec.monthsFromEpochDay)
        case DateType => new CalendarOfDate("months", PartSpec.monthsFromEpochDay)
        case dt => throw new UnsupportedOperationException(
          s"months is not defined on ${dt.catalogString}")
      }
    }
  }

  class YearsUnbound extends UnboundFunction {
    override def name(): String = "years"
    override def description(): String =
      "years(ts): years since 1970 (hidden partition transform)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"years takes exactly one argument, got ${inputType.length}")
      inputType.fields(0).dataType match {
        case dt @ (TimestampType | TimestampNTZType) =>
          new CalendarOfMicros("years", dt, PartSpec.yearsFromEpochDay)
        case DateType => new CalendarOfDate("years", PartSpec.yearsFromEpochDay)
        case dt => throw new UnsupportedOperationException(
          s"years is not defined on ${dt.catalogString}")
      }
    }
  }

  /** `hours(ts)` — UTC epoch-hour ordinal; timestamp columns only. */
  class HoursUnbound extends UnboundFunction {
    override def name(): String = "hours"
    override def description(): String =
      "hours(ts): UTC epoch-hour ordinal (hidden partition transform)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"hours takes exactly one argument, got ${inputType.length}")
      inputType.fields(0).dataType match {
        case dt @ (TimestampType | TimestampNTZType) => new HoursOfMicros(dt)
        case dt => throw new UnsupportedOperationException(
          s"hours is not defined on ${dt.catalogString}")
      }
    }
  }

  class HoursOfMicros(dt: DataType) extends ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[DataType] = Array(dt)
    override def resultType(): DataType = LongType
    override def name(): String = "hours"
    override def canonicalName(): String =
      s"graft.hours(${dt.catalogString})"
    def invoke(micros: Long): Long =
      Math.floorDiv(micros, PartSpec.MicrosPerHour)
    override def produceResult(input: InternalRow): java.lang.Long =
      if (input.isNullAt(0)) null else invoke(input.getLong(0))
  }

  /** Calendar ordinal of a micros column — `fromDay` is the month/year
    * arithmetic shared with the write route. Calendar math is not a
    * primitive floor-div, so these bind through `produceResult` (one
    * LocalDate per row in the write exchange's key projection only —
    * never a scan or filter path).
    */
  class CalendarOfMicros(fn: String, dt: DataType, fromDay: Long => Long)
      extends ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[DataType] = Array(dt)
    override def resultType(): DataType = LongType
    override def name(): String = fn
    override def canonicalName(): String =
      s"graft.$fn(${dt.catalogString})"
    override def produceResult(input: InternalRow): java.lang.Long =
      if (input.isNullAt(0)) null
      else fromDay(Math.floorDiv(input.getLong(0), PartSpec.MicrosPerDay))
  }

  class CalendarOfDate(fn: String, fromDay: Long => Long)
      extends ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[DataType] = Array(DateType)
    override def resultType(): DataType = LongType
    override def name(): String = fn
    override def canonicalName(): String = s"graft.$fn(date)"
    override def produceResult(input: InternalRow): java.lang.Long =
      if (input.isNullAt(0)) null else fromDay(input.getInt(0).toLong)
  }

  /** `truncate(w, col)` — width-`w` truncation: integral values floor
    * to the multiple of `w` below (floor-mod), strings keep their first
    * `w` code points. Bound with the width as the leading INT argument,
    * the same shape [[BucketBound]] uses, so
    * `V2ExpressionUtils.toCatalyst` can translate a
    * `truncate(w, col)`-clustered write distribution.
    */
  class TruncateUnbound extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(w, col): width-w truncation (hidden partition transform)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"truncate takes (width, col), got ${inputType.length} args")
      require(inputType.fields(0).dataType == IntegerType,
        s"truncate's first argument must be INT, got " +
          inputType.fields(0).dataType.catalogString)
      inputType.fields(1).dataType match {
        case dt @ (StringType | ByteType | ShortType | IntegerType | LongType) =>
          new TruncateBound(dt)
        case dt => throw new UnsupportedOperationException(
          s"truncate is not defined on ${dt.catalogString}")
      }
    }
  }

  class TruncateBound(dt: DataType) extends ScalarFunction[AnyRef] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
    override def resultType(): DataType =
      if (dt == StringType) StringType else LongType
    override def name(): String = "truncate"
    override def canonicalName(): String =
      s"graft.truncate(${dt.catalogString})"
    override def produceResult(input: InternalRow): AnyRef =
      if (input.isNullAt(0) || input.isNullAt(1)) null
      else {
        val w = input.getInt(0)
        dt match {
          case StringType =>
            val u = input.getUTF8String(1)
            if (u.numChars() <= w) u else u.substring(0, w)
          case _ =>
            val x = input.get(1, dt).asInstanceOf[Number].longValue
            java.lang.Long.valueOf(x - Math.floorMod(x, w.toLong))
        }
      }
  }

  /** `bucket(n, col)` — murmur3(col, seed 42) pmod n, the same hash
    * [[PartSpec.BucketPart]] routes writes with. Spark hands the
    * transform's arity as (numBuckets INT, col), so the bound input is
    * two fields; `produceResult` keeps the column generic over every
    * hashable type (the call sits only in the write exchange's key
    * projection).
    */
  class BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, col): murmur3 pmod n (hidden partition transform)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"bucket takes (numBuckets, col), got ${inputType.length} args")
      require(inputType.fields(0).dataType == IntegerType,
        s"bucket's first argument must be INT, got " +
          inputType.fields(0).dataType.catalogString)
      new BucketBound(inputType.fields(1).dataType)
    }
  }

  class BucketBound(dt: DataType) extends ScalarFunction[java.lang.Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String =
      s"graft.bucket(${dt.catalogString})"
    override def produceResult(input: InternalRow): java.lang.Integer =
      if (input.isNullAt(0) || input.isNullAt(1)) null
      else {
        val n = input.getInt(0)
        val h = Murmur3HashFunction.hash(input.get(1, dt), dt, 42L).toInt
        val m = h % n
        if (m < 0) m + n else m
      }
  }
}

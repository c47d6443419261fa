package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar kit — the reference's scalar-function surface (SURVEY.md §2.10)
  * re-expressed as codegen-friendly built-in Catalyst expressions. No UDFs:
  * every helper here composes `org.apache.spark.sql.functions`, so the whole
  * expression tree stays inside whole-stage codegen.
  */
object Scalars {

  /** Truncating hour difference — Trino `date_diff('hour', a, b)` semantics
    * (reference: sql/analytics/time_between_engine_test_and_actual_launch.sql:12,18;
    * truncation confirmed by its golden output, SURVEY.md §2.8-Q3).
    * Returns LongType.
    */
  def hourDiffTrunc(start: Column, end: Column): Column =
    floor((unix_timestamp(end) - unix_timestamp(start)) / lit(3600.0)).cast("long")

  /** Fractional hour difference — the reference's Python-side variant
    * (src/aggregations.py:330-334: EXTRACT(EPOCH FROM (a-b))/3600).
    * Returns DoubleType.
    */
  def hourDiffFrac(start: Column, end: Column): Column =
    (unix_timestamp(end) - unix_timestamp(start)) / lit(3600.0)

  /** Binary-exact half-up rounding: `floor(x*10^n + 0.5)/10^n`. Used for
    * every oracle-compared value instead of `round`: Spark's `round` on
    * doubles rounds the shortest DECIMAL string repr (HALF_UP on
    * BigDecimal.valueOf) while DuckDB rounds the BINARY value, so exact
    * rationals like 189/40 = "4.725" round differently (4.73 vs 4.72).
    * floor() is defined purely on the binary value in both engines →
    * identical results. Oracle-side twin: `floor(x * 1eN + 0.5) / 1eN`.
    */
  def roundTo(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** Guarded percentage ratio — `round(num/den*100, 2)`, NULL when den = 0
    * (reference: calculate_success_rate, src/models.py:112-116).
    */
  def ratioPct(num: Column, den: Column): Column =
    when(den === 0, lit(null)).otherwise(roundTo(num * lit(100.0) / den, 2))

  /** Tri-state boolean derivation from a status code — maps one value to
    * true, one to false, everything else to NULL (FIXTURES.md role mapping
    * for the reference's nullable `success`, src/models.py:17-18).
    */
  def triState(status: Column, trueVal: String, falseVal: String): Column =
    when(status === trueVal, lit(true)).when(status === falseVal, lit(false))

  /** Conditional count of a tri-state boolean: NULLs excluded from both
    * classes (reference: src/aggregations.py:324-325, 350).
    */
  def countTrue(flag: Column): Column  = count(when(flag === true, 1))
  def countFalse(flag: Column): Column = count(when(flag === false, 1))

  /** Zero/negative → NULL mapping of a derived metric (reference:
    * `total if total > 0 else None`, src/ingest.py:339-341).
    */
  def nullIfNonPositive(c: Column): Column = when(c > 0, c)

  /** Pipeline run identifier `pipeline_<yyyyMMdd_HHmmss>_<hex8>`
    * (reference: src/aggregations.py:51-52 —
    * `pipeline_{now:%Y%m%d_%H%M%S}_{uuid4().hex[:8]}`). `uuid()`'s first
    * 8 chars are hex, so no hyphen stripping is needed. Non-deterministic
    * by construction — NEVER emitted in oracle-compared output (pinned by
    * ScalarsSpec's format regex instead).
    */
  def runLabel(ts: Column): Column =
    concat(lit("pipeline_"), date_format(ts, "yyyyMMdd_HHmmss"),
      lit("_"), substring(uuid(), 1, 8))
}

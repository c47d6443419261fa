package graft.sources

import org.apache.spark.sql.connector.expressions.{Expression => V2Expr, GeneralScalarExpression, Literal => V2Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.{AlwaysFalse, AlwaysTrue, Predicate}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiles the V2 [[Predicate]]s Spark's `DeleteFromTableExec` hands a
  * `SupportsDeleteV2` table into an evaluator over the store's LOGICAL
  * row view — the driver-side filter a metadata-only DELETE applies to
  * build deletion vectors ([[GraftStore.deleteWhere]]).
  *
  * The contract mirrors data skipping's ([[StoreSkipping]]): `compile`
  * admits ONLY shapes it evaluates with exact SQL semantics — top-level
  * column refs, literals of comparable internal types, the comparison /
  * IN / NULL-test operators, and AND/OR/NOT with three-valued logic —
  * and returns None on anything else. `canDeleteWhere` then reports
  * false and Spark keeps the group-based COW rewrite instead (always
  * correct, just not metadata-only). A row is deleted iff the
  * conjunction of all predicates is TRUE (UNKNOWN keeps the row, exactly
  * SQL's DELETE semantics).
  */
private[sources] object StorePredicates {

  /** evaluator returning TRUE / FALSE / null (= SQL UNKNOWN). */
  private type Ev = Array[Any] => java.lang.Boolean

  def compile(schema: StructType, preds: Array[Predicate])
      : Option[Array[Any] => Boolean] = {
    val evs = preds.map(compileOne(schema, _))
    if (evs.exists(_.isEmpty)) None
    else {
      val compiled = evs.map(_.get)
      Some(row => compiled.forall(e => e(row) == java.lang.Boolean.TRUE))
    }
  }

  /** Recognize the EQUALITY-DELETE shape (Iceberg v2's second delete
    * model): a conjunction where every predicate is `col = literal` or
    * `col IN (literals)` on distinct top-level columns of exact
    * column type — i.e. the whole condition is representable as a
    * TUPLE SET over a fixed column set, committable as metadata with
    * no position resolution. Returns (logical column indices, tuples —
    * the cartesian product of each column's admitted value set), or
    * None for anything else (the positional tiers take over; never a
    * correctness dependency). Exact-type match (no numeric widening)
    * because the reader probes a HASH SET of internal values, not a
    * comparator.
    */
  def compileEquality(schema: StructType, preds: Array[Predicate])
      : Option[(Array[Int], Array[Array[Any]])] = {
    def litOf(e: V2Expr, dt: DataType): Option[Any] = e match {
      case l: V2Literal[_] if l.dataType == dt =>
        val v: Any = l.value
        v match {
          case null => None
          case d: java.lang.Double if d.isNaN => None
          case f: java.lang.Float if f.isNaN => None
          // signed zero: boxed equals is bit-wise (0.0 != -0.0) but
          // SQL equality is numeric — a hash-set probe would miss the
          // -0.0 row the positional comparator deletes; refuse, the
          // positional tier keeps exact semantics
          case d: java.lang.Double if d.doubleValue == 0.0 => None
          case f: java.lang.Float if f.floatValue == 0.0f => None
          case _ if hashableType(dt) => Some(v)
          case _ => None
        }
      case _ => None
    }
    def colValues(p: Predicate): Option[(Int, Seq[Any])] = p.name() match {
      case "=" => p.children() match {
        case Array(r: NamedReference, l) =>
          for { i <- fieldIndex(schema, r)
                v <- litOf(l, schema.fields(i).dataType) } yield (i, Seq(v))
        case Array(l, r: NamedReference) =>
          for { i <- fieldIndex(schema, r)
                v <- litOf(l, schema.fields(i).dataType) } yield (i, Seq(v))
        case _ => None
      }
      case "IN" => p.children() match {
        case kids if kids.length >= 2 => kids.head match {
          case r: NamedReference =>
            for {
              i <- fieldIndex(schema, r)
              vs <- traverse(kids.tail.toSeq
                .map(litOf(_, schema.fields(i).dataType)))
            } yield (i, vs)
          case _ => None
        }
        case _ => None
      }
      case _ => None
    }
    traverse(preds.toSeq.map(colValues)).flatMap { parts =>
      val cols = parts.map(_._1)
      if (parts.isEmpty || cols.distinct.length != cols.length) None
      else {
        // cartesian product of per-column value sets: `k IN (1,2) AND
        // p = 'a'` → tuples {(1,'a'), (2,'a')} over cols (k, p)
        val tuples = parts.map(_._2).foldLeft(Seq(Seq.empty[Any])) {
          (acc, vs) => acc.flatMap(t => vs.map(v => t :+ v))
        }
        Some((cols.toArray, tuples.map(_.toArray).toArray))
      }
    }
  }

  /** internal value classes whose equals/hashCode match SQL equality —
    * the types an equality-delete tuple may carry.
    */
  private def hashableType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | FloatType | DoubleType |
         StringType | BooleanType | _: DecimalType => true
    case _ => false
  }

  private def compileOne(schema: StructType, p: Predicate): Option[Ev] =
    p match {
      case _: AlwaysTrue => Some(_ => java.lang.Boolean.TRUE)
      case _: AlwaysFalse => Some(_ => java.lang.Boolean.FALSE)
      case _ => p.name() match {
        case "AND" => binLogic(schema, p) { (l, r) =>
          if (l == java.lang.Boolean.FALSE || r == java.lang.Boolean.FALSE)
            java.lang.Boolean.FALSE
          else if (l == null || r == null) null
          else java.lang.Boolean.TRUE
        }
        case "OR" => binLogic(schema, p) { (l, r) =>
          if (l == java.lang.Boolean.TRUE || r == java.lang.Boolean.TRUE)
            java.lang.Boolean.TRUE
          else if (l == null || r == null) null
          else java.lang.Boolean.FALSE
        }
        case "NOT" => p.children() match {
          case Array(c: Predicate) => compileOne(schema, c).map { e =>
            row => {
              val v = e(row)
              if (v == null) null else java.lang.Boolean.valueOf(!v)
            }
          }
          case _ => None
        }
        case "IS_NULL" => unaryRef(schema, p).map { idx =>
          row => java.lang.Boolean.valueOf(row(idx) == null)
        }
        case "IS_NOT_NULL" => unaryRef(schema, p).map { idx =>
          row => java.lang.Boolean.valueOf(row(idx) != null)
        }
        case op @ ("=" | "<>" | "!=" | "<" | "<=" | ">" | ">=") =>
          p.children() match {
            case Array(l, r) =>
              for {
                (lv, lt) <- operand(schema, l)
                (rv, rt) <- operand(schema, r)
                if comparableTypes(lt, rt)
              } yield { (row: Array[Any]) =>
                val a = lv(row); val b = rv(row)
                if (a == null || b == null) null
                else cmp(a, b) match {
                  case None => null // defensive: admitted types always compare
                  case Some(c) => java.lang.Boolean.valueOf(op match {
                    case "=" => c == 0
                    case "<>" | "!=" => c != 0
                    case "<" => c < 0
                    case "<=" => c <= 0
                    case ">" => c > 0
                    case ">=" => c >= 0
                  })
                }
              }
            case _ => None
          }
        case "<=>" => p.children() match {
          case Array(l, r) =>
            for {
              (lv, lt) <- operand(schema, l)
              (rv, rt) <- operand(schema, r)
              if comparableTypes(lt, rt)
            } yield { (row: Array[Any]) =>
              val a = lv(row); val b = rv(row)
              if (a == null && b == null) java.lang.Boolean.TRUE
              else if (a == null || b == null) java.lang.Boolean.FALSE
              else java.lang.Boolean.valueOf(cmp(a, b).contains(0))
            }
          case _ => None
        }
        case "IN" => p.children() match {
          case kids if kids.length >= 2 =>
            for {
              (lv, lt) <- operand(schema, kids.head)
              rest <- traverse(kids.tail.toSeq.map(operand(schema, _)))
              if rest.forall { case (_, rt) => comparableTypes(lt, rt) }
            } yield { (row: Array[Any]) =>
              val a = lv(row)
              if (a == null) null
              else {
                var sawNull = false
                var hit = false
                rest.foreach { case (rv, _) =>
                  val b = rv(row)
                  if (b == null) sawNull = true
                  else if (cmp(a, b).contains(0)) hit = true
                }
                if (hit) java.lang.Boolean.TRUE
                else if (sawNull) null
                else java.lang.Boolean.FALSE
              }
            }
          case _ => None
        }
        case _ => None
      }
    }

  private def binLogic(schema: StructType, p: Predicate)(
      f: (java.lang.Boolean, java.lang.Boolean) => java.lang.Boolean)
      : Option[Ev] = p.children() match {
    case Array(l: Predicate, r: Predicate) =>
      for { le <- compileOne(schema, l); re <- compileOne(schema, r) }
        yield { (row: Array[Any]) => f(le(row), re(row)) }
    case _ => None
  }

  private def unaryRef(schema: StructType, p: Predicate): Option[Int] =
    p.children() match {
      case Array(r: NamedReference) => fieldIndex(schema, r)
      case _ => None
    }

  private def fieldIndex(schema: StructType, r: NamedReference): Option[Int] =
    r.fieldNames() match {
      case Array(n) =>
        val i = schema.fieldNames.indexWhere(_.equalsIgnoreCase(n))
        if (i < 0) None else Some(i)
      case _ => None // nested refs unsupported
    }

  /** operand → (row accessor, declared type); literals close over their
    * internal value (translateFilterV2 produces internal representations
    * — UTF8String for strings, micros/days numerics for datetimes).
    */
  private def operand(schema: StructType, e: V2Expr)
      : Option[(Array[Any] => Any, DataType)] = e match {
    case r: NamedReference =>
      fieldIndex(schema, r).map { i =>
        ((row: Array[Any]) => row(i), schema.fields(i).dataType)
      }
    case l: V2Literal[_] =>
      val v: Any = l.value
      v match {
        case d: java.lang.Double if d.isNaN => None // NaN ordering: refuse
        case f: java.lang.Float if f.isNaN => None
        case _ => Some(((_: Array[Any]) => v, l.dataType))
      }
    case _: GeneralScalarExpression => None // computed operand → COW fallback
    case _ => None
  }

  private def comparableTypes(a: DataType, b: DataType): Boolean = {
    def cls(dt: DataType): Int = dt match {
      case ByteType | ShortType | IntegerType | LongType | DateType |
           TimestampType | TimestampNTZType => 1
      case FloatType | DoubleType => 2
      case StringType => 3
      case BooleanType => 4
      case _: DecimalType => 5
      case _ => 0
    }
    val (ca, cb) = (cls(a), cls(b))
    ca != 0 && (ca == cb ||
      // integral vs floating compares exactly through doubleValue only
      // for datetime-free numerics; datetimes never meet floats in a
      // translated predicate (Spark casts literals to the column type)
      (ca == 1 && cb == 2 && !datetime(a)) || (ca == 2 && cb == 1 && !datetime(b)))
  }
  private def datetime(dt: DataType): Boolean = dt match {
    case DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** compare two non-null INTERNAL values; None = incomparable combo
    * (unreachable for admitted types — defense in depth).
    */
  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: UTF8String, y: UTF8String) => Some(x.compareTo(y))
    case (x: java.lang.Boolean, y: java.lang.Boolean) => Some(x.compareTo(y))
    case (x: Decimal, y: Decimal) => Some(x.compare(y))
    case (x: java.lang.Double, _) if x.isNaN => None
    case (_, y: java.lang.Double) if y.isNaN => None
    case (x: java.lang.Float, _) if x.isNaN => None
    case (_, y: java.lang.Float) if y.isNaN => None
    case (x: Number, y: Number) =>
      def floating(n: Number) =
        n.isInstanceOf[java.lang.Double] || n.isInstanceOf[java.lang.Float]
      if (floating(x) || floating(y))
        Some(java.lang.Double.compare(x.doubleValue, y.doubleValue))
      else Some(java.lang.Long.compare(x.longValue, y.longValue))
    case _ => None
  }

  private def traverse[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.exists(_.isEmpty)) None else Some(xs.map(_.get))
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd Catalyst expression — Spark has
  * no built-in UAX#15 normalizer, and a Scala UDF here would break
  * whole-stage codegen on the hottest per-row path of a corpus cleaner.
  * The generated code is one call into [[NfcNormalize.compute]] (tiny
  * method → stays JIT-compiled; see [[HyperplaneSignature]] for why giant
  * generated bodies go interpreted). The oracle twin is DuckDB's
  * `nfc_normalize` (utf8proc); both implement Unicode NFC, so results
  * agree byte-for-byte on the compared corpus.
  *
  * ASCII fast path: NFC can never change pure-ASCII text, and
  * `Normalizer.isNormalized` is O(n) with no allocation — the common case
  * (the overwhelming majority of crawl text) skips the String rebuild.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(v: Any): Any =
    NfcNormalize.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.NfcNormalize.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

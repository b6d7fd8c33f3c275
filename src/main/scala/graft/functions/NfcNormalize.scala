package graft.functions

import org.apache.spark.sql.{graftbridge, Column}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst Unicode NFC normalization over a string column.
  *
  * A multilingual crawl stores the SAME text in visually identical but
  * byte-different encodings — precomposed U+00E9 vs decomposed
  * U+0065 U+0301 — so exact dedup, group-by keys, joins on titles/URLs,
  * and shingle hashes all silently miss matches unless every string is
  * canonicalized first. Canonical composition (Unicode NFC, UAX #15) is
  * the standard fix; DuckDB ships it as `nfc_normalize`, ClickHouse as
  * `normalizeUTF8NFC`, and Spark has NO built-in — which makes it exactly
  * the SURVEY §2.11 "custom Expression beats UDF" case: a codegen'd
  * expression wrapping the JDK's `java.text.Normalizer` (ICU-derived,
  * same UCD tables the other engines use), registered as SQL function
  * `nfc_normalize` so the Spark text and the DuckDB oracle SHARE the
  * spelling.
  *
  * Scale: the corpus is overwhelmingly ASCII, and ASCII is NFC by
  * definition — so the hot path is a byte scan (`isFullAscii` below)
  * returning the INPUT UTF8String untouched: zero allocation, no
  * UTF-8→UTF-16→UTF-8 round trip. Only rows that actually contain
  * non-ASCII bytes pay the JDK normalizer. The whole thing stays inside
  * whole-stage codegen as a static call.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects a string, got ${t.simpleString}")
    }

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {

  /** ASCII fast path, then JDK NFC. Static so generated code can call it. */
  def nfc(s: UTF8String): UTF8String = {
    if (isFullAscii(s)) s
    else {
      val j = s.toString
      // isNormalized is a cheap quick-check scan; most non-ASCII text is
      // already composed, and skipping normalize() avoids the rebuild
      if (java.text.Normalizer.isNormalized(j, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(j, java.text.Normalizer.Form.NFC))
    }
  }

  private def isFullAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  /** Column-API entry. */
  def apply(c: Column): Column =
    graftbridge.column(NfcNormalize(graftbridge.expression(c)))

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[NfcNormalize].getCanonicalName, "nfc_normalize")
}

package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-position md5 span fingerprints of a document: for every
  * `span`-token window, the bigint the decontamination/winnowing
  * family keys on — exactly
  * `conv(substr(md5(array_join(slice(tk, i+1, span), ' ')), 1, 15), 16, 10)`
  * (= the first 60 bits of the md5 digest), so every existing DuckDB
  * oracle replays it unchanged.
  *
  * Why an Expression: the `transform(sequence(...), i -> ...md5...)`
  * chain it replaces is a higher-order function — no doGenCode, so it
  * ran on the interpreted evaluator, rebuilt the window STRING per
  * position (slice + array_join), and broke the surrounding
  * WholeStageCodegen span (the ShingleSet lesson, one hash family
  * over). Here the token bytes are materialized once per document and
  * each window digest streams through one reused MessageDigest —
  * no per-window string, no lambda dispatch. */
case class SpanHash(child: Expression, span: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    SpanHash.hashes(v.asInstanceOf[UTF8String], span)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SpanHash.hashes($c, $span)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SpanHash {

  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** One long per window position 0..len−span; empty when the document
    * has fewer than `span` tokens (the callers' old `size(tk) >= span`
    * prefilter becomes explode-of-empty). split(" ", -1) keeps trailing
    * empty tokens — matching Spark SQL's split() and DuckDB's
    * string_split. */
  def hashes(text: UTF8String, span: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < span) return new GenericArrayData(Array.empty[Any])
    val bytes = new Array[Array[Byte]](toks.length)
    var t = 0
    while (t < toks.length) {
      bytes(t) = toks(t).getBytes(StandardCharsets.UTF_8); t += 1
    }
    val md = md5.get()
    val n = toks.length - span + 1
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      md.reset()
      var k = 0
      while (k < span) {
        if (k > 0) md.update(' '.toByte)
        md.update(bytes(i + k))
        k += 1
      }
      val dig = md.digest()
      // conv(substr(hex, 1, 15), 16, 10) == first 60 bits, big-endian
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (dig(b) & 0xffL); b += 1 }
      out(i) = v >>> 4
      i += 1
    }
    new GenericArrayData(out)
  }

  def span_hashes(c: Column, span: Int): Column =
    GraftInternal.toColumn(SpanHash(GraftInternal.toExpression(c), span))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge round applied to a token array, row-locally: every
  * LEFTMOST, NON-OVERLAPPING adjacent (w1, w2) occurrence becomes the
  * single symbol "w1 w2". Same greedy fold the `aggregate` HOF
  * formulation expressed (q207's original shape, still the oracle's
  * list_reduce semantics) — but Catalyst lambda functions are
  * interpreted PER TOKEN and the accumulator `concat(acc, array(t))`
  * copies the array per append; this expression is one method call per
  * ROW with a single output buffer (measured: the 6-round train at
  * sf0.1 dropped from ~5.9 s to the pair-count floor).
  *
  * Greedy-overlap semantics fall out of scanning left to right: after
  * a merge the previous output token is the merged symbol, which can
  * never equal w1 (w1 is a strict prefix of it), so "a a a" under
  * (a, a) yields ["a a", "a"]. */
case class BpeMerge(child: Expression, w1: String, w2: String)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  @transient private lazy val w1u = UTF8String.fromString(w1)
  @transient private lazy val w2u = UTF8String.fromString(w2)
  @transient private lazy val mergedU = UTF8String.fromString(w1 + " " + w2)

  /** Public so generated code can call through the referenced object. */
  def mergeRow(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = new Array[AnyRef](n)
    var len = 0
    var i = 0
    while (i < n) {
      val t = v.getUTF8String(i)
      if (len > 0 && t != null && w2u.equals(t) &&
          out(len - 1) != null && w1u.equals(out(len - 1))) {
        out(len - 1) = mergedU
      } else {
        out(len) = t
        len += 1
      }
      i += 1
    }
    new GenericArrayData(
      if (len == n) out else java.util.Arrays.copyOf(out, len))
  }

  override def nullSafeEval(v: Any): Any = mergeRow(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeMerge", this,
      classOf[BpeMerge].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.mergeRow($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeMerge {
  def bpe_merge(toks: Column, w1: String, w2: String): Column =
    GraftInternal.toColumn(BpeMerge(GraftInternal.toExpression(toks), w1, w2))
}

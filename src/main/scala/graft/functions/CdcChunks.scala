package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (codegen): split a document's UTF-8 bytes
  * wherever the rolling hash of the trailing WINDOW bytes has its low
  * MASK_BITS bits zero, and return the chunk lengths.
  *
  * This is the operator `RollingHash` exists for: boundaries depend
  * only on local content, so an insertion early in a document shifts
  * at most one chunk instead of re-chunking everything — the property
  * that makes dedup-by-chunk robust at 100 TB. The window hash is
  * maintained incrementally (one multiply-add and one modular subtract
  * per byte, via the precomputed B^w); the oracle recomputes each
  * window from scratch with the same polynomial, so any drift between
  * the incremental and direct forms breaks the hash match. */
case class CdcChunks(child: Expression, window: Int, maskBits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    CdcChunks.chunks(v.asInstanceOf[UTF8String], window, maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcChunks.chunks($c, $window, $maskBits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunks {
  import RollingHash.{BASE, MOD, mulMod}

  def chunks(text: UTF8String, w: Int, maskBits: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val mask = (1L << maskBits) - 1
    var bw = 1L
    var k = 0
    while (k < w) { bw = mulMod(bw, BASE); k += 1 }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var h = 0L
    var start = 0
    var i = 0
    while (i < n) {
      h = mulMod(h, BASE) + (bytes(i) & 0xff) + 1L
      if (h >= MOD) h -= MOD
      if (i >= w) {
        val sub = mulMod((bytes(i - w) & 0xff) + 1L, bw)
        h -= sub
        if (h < 0) h += MOD
      }
      if (i >= w - 1 && (h & mask) == 0L) {
        out += (i - start + 1).toLong
        start = i + 1
      }
      i += 1
    }
    if (start < n) out += (n - start).toLong
    new GenericArrayData(out.toArray)
  }

  def cdc_chunks(c: Column, window: Int, maskBits: Int): Column =
    GraftInternal.toColumn(
      CdcChunks(GraftInternal.toExpression(c), window, maskBits))
}

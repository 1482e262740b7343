package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, LongType}

/** Karp–Rabin rolling fingerprint over a string's UTF-8 bytes
  * (north-star "document fingerprinting (rolling hash)"): polynomial
  * hash base 257 mod 2⁶¹−1, evaluated with whole-stage codegen.
  *
  * Unlike md5 this is incrementally updatable (window-slide property),
  * which is what makes it the right primitive for content-defined
  * chunking at 100 TB; here it fingerprints whole documents. */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    RollingHash.hashBytes(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHash.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  final val MOD = (1L << 61) - 1
  final val BASE = 257L

  /** mulmod via 128-bit intermediate (Math.multiplyHigh, JDK9+). */
  def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold 2^64·hi + lo into mod 2^61−1: 2^64 ≡ 8 (mod 2^61−1)
    var r = (lo & MOD) + (lo >>> 61) + ((hi << 3) & MOD) + (hi >>> 58)
    while (r >= MOD) r -= MOD
    r
  }

  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = mulMod(h, BASE) + (bytes(i) & 0xff) + 1L
      if (h >= MOD) h -= MOD
      i += 1
    }
    h
  }

  def rolling_hash(c: Column): Column =
    GraftInternal.toColumn(RollingHash(GraftInternal.toExpression(c)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature of a shingle-set array column as a codegen'd
  * Catalyst expression (SURVEY.md §2.9 upgrade path; north-star
  * MinHash+LSH dedup hot path).
  *
  * Why not `udf(minhashSig _)`: a Scala udf deserializes the whole
  * array<string> into a boxed Seq[String] per row AND breaks the
  * surrounding WholeStageCodegen span (same failure mode as
  * higher-order functions — documented in docs/SCALE.md). q41 regressed
  * 2.55 s → 5.94 s when its signature moved to a udf; this expression
  * walks the unsafe array data directly inside the generated code.
  *
  * Hash family: two murmur3 base hashes per shingle +
  * Kirsch–Mitzenmacher h_i = h1 + i·h2 (mod 2³²) — bit-identical to
  * `graft.text.Dedup.minhashSig` (asserted in DedupSpec).
  */
case class MinhashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    MinhashSig.sig(v.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinhashSig.sig($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSig {

  /** Fold every element of the array into a numHashes-minima signature.
    * Identical math to Dedup.minhashUpdate: h1/h2 are murmur3 over the
    * UTF-8 bytes with seeds 0/1, h2 forced odd (full period), minima
    * over h1 + i·h2 masked to 32 bits. */
  def sig(arr: ArrayData, numHashes: Int): ArrayData = {
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = arr.numElements()
    var k = 0
    while (k < n) {
      val bytes = arr.getUTF8String(k).getBytes
      val h1 = scala.util.hashing.MurmurHash3.bytesHash(bytes, 0).toLong & 0xffffffffL
      val h2 = scala.util.hashing.MurmurHash3.bytesHash(bytes, 1).toLong | 1L
      var i = 0
      while (i < numHashes) {
        val h = (h1 + i * h2) & 0xffffffffL
        if (h < out(i)) out(i) = h
        i += 1
      }
      k += 1
    }
    new GenericArrayData(out)
  }

  def minhash_sig(c: Column, numHashes: Int): Column =
    GraftInternal.toColumn(MinhashSig(GraftInternal.toExpression(c), numHashes))
}

/** 60-bit SimHash of a shingle-set array column (codegen counterpart of
  * `graft.text.Dedup.simhashSig`; same udf-vs-expression rationale as
  * MinhashSig above).
  *
  * Per-shingle hash is the first 15 hex chars of md5 parsed base 16 —
  * engine-portable (identical in Spark SQL `conv(substr(md5,1,15),16,10)`
  * and DuckDB `('0x'||substr(md5,1,15))::BIGINT`), which is what keeps
  * q42 under a full DuckDB oracle. */
case class SimhashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    SimhashSig.sig(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimhashSig.sig($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashSig {

  // MessageDigest is stateful and not thread-safe; one instance per
  // task thread, reset per use, avoids per-shingle getInstance cost.
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of md5(bytes) parsed base 16 (= 60 bits).
    * Same value as Dedup.md5Hash60. */
  def hash60(bytes: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    val digest = d.digest(bytes)
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (digest(i) & 0xffL); i += 1 }
    (h << 4) | ((digest(7) & 0xf0L) >> 4)
  }

  /** Majority vote over the 60 hash bits of every element — identical
    * math to Dedup.simhashSig (asserted in DedupSpec). */
  def sig(arr: ArrayData): Long = {
    val c = new Array[Int](64)
    val n = arr.numElements()
    var k = 0
    while (k < n) {
      val h = hash60(arr.getUTF8String(k).getBytes)
      var j = 0
      while (j < 64) { c(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1); j += 1 }
      k += 1
    }
    var sigv = 0L
    var j = 0
    while (j < 64) { if (c(j) > 0) sigv |= (1L << j); j += 1 }
    sigv
  }

  def simhash_sig(c: Column): Column =
    GraftInternal.toColumn(SimhashSig(GraftInternal.toExpression(c)))
}

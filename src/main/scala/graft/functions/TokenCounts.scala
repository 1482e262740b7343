package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document term frequencies as a row-local codegen expression:
  * text → array<struct<term string, tf long>> in first-occurrence
  * order.
  *
  * This is the map-side half of TF-IDF done without a shuffle: term
  * counts never leave the row they came from, so the only aggregation
  * that crosses the wire is the (vocabulary-sized) document-frequency
  * count. The groupBy(doc_id, term) formulation shuffles the whole
  * exploded token stream instead. */
case class TokenCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("term", StringType, nullable = false),
                   StructField("tf", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(v: Any): Any =
    TokenCounts.counts(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCounts.counts($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenCounts {
  def counts(text: UTF8String): ArrayData = {
    // limit -1 keeps trailing empty tokens (Spark SQL split / DuckDB
    // string_split semantics — oracle parity on irregular whitespace)
    val toks = text.toString.split(" ", -1)
    val m = new java.util.LinkedHashMap[String, Long]()
    var i = 0
    while (i < toks.length) {
      m.merge(toks(i), 1L, (a, b) => a + b); i += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue))
      j += 1
    }
    new GenericArrayData(out)
  }

  def token_counts(c: Column): Column =
    GraftInternal.toColumn(TokenCounts(GraftInternal.toExpression(c)))
}

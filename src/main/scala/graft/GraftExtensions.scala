package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, DotProduct, MinhashSig, RollingHash, ShingleSet, SimhashSig, TokenCounts}

/** SparkSessionExtensions entry point: makes the engine's custom
  * Catalyst expressions available to pure-SQL users
  * (`--conf spark.sql.extensions=graft.GraftExtensions`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftFunctions.arity
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => { arity(exprs, "cosine_sim", 2, 2)
        CosineSimilarity(exprs(0), exprs(1)) }))
    e.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (exprs: Seq[Expression]) => { arity(exprs, "rolling_hash", 1, 1)
        RollingHash(exprs.head) }))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => { arity(exprs, "dot_product", 2, 2)
        DotProduct(exprs(0), exprs(1)) }))
    e.injectFunction((
      FunctionIdentifier("shingle_set"),
      new ExpressionInfo(classOf[ShingleSet].getName, "shingle_set"),
      (exprs: Seq[Expression]) => { arity(exprs, "shingle_set", 1, 2)
        if (exprs.length > 1)
          ShingleSet(exprs.head,
            GraftFunctions.intLiteralArg(exprs(1), "shingle_set", "n"))
        else ShingleSet(exprs.head) }))
    e.injectFunction((
      FunctionIdentifier("token_counts"),
      new ExpressionInfo(classOf[TokenCounts].getName, "token_counts"),
      (exprs: Seq[Expression]) => { arity(exprs, "token_counts", 1, 1)
        TokenCounts(exprs.head) }))
    e.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => { arity(exprs, "minhash_sig", 2, 2)
        MinhashSig(exprs.head,
          GraftFunctions.intLiteralArg(exprs(1), "minhash_sig", "numHashes")) }))
    e.injectFunction((
      FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(classOf[SimhashSig].getName, "simhash_sig"),
      (exprs: Seq[Expression]) => { arity(exprs, "simhash_sig", 1, 1)
        SimhashSig(exprs.head) }))
    e.injectOptimizerRule(_ => graft.plans.TopKRewrite)
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}

/** Registration on an already-running session (the extensions config
  * only applies at session construction). */
object GraftFunctions {

  /** Argument-count check with a message naming the function — without
    * it, SQL like `minhash_sig(arr)` dies in `exprs(1)` with an
    * IndexOutOfBoundsException instead of an arity error. */
  def arity(exprs: Seq[Expression], fn: String, lo: Int, hi: Int): Unit =
    if (exprs.length < lo || exprs.length > hi)
      throw new IllegalArgumentException(
        s"$fn expects ${if (lo == hi) s"$lo" else s"$lo to $hi"} argument(s), got ${exprs.length}")

  /** Validates a constant integer SQL argument with a message naming
    * the function — `eval().asInstanceOf[Int]` on a column or a BIGINT
    * literal would otherwise fail with an opaque cast/unresolved
    * error. */
  def intLiteralArg(e: Expression, fn: String, arg: String): Int = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: $arg must be a constant integer, got non-constant ${e.sql}")
    e.eval() match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a constant integer, got $other")
    }
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "cosine_sim", exprs => { arity(exprs, "cosine_sim", 2, 2)
        CosineSimilarity(exprs(0), exprs(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction(
      "rolling_hash", exprs => { arity(exprs, "rolling_hash", 1, 1)
        RollingHash(exprs.head) }, "scala_udf")
    reg.createOrReplaceTempFunction(
      "dot_product", exprs => { arity(exprs, "dot_product", 2, 2)
        DotProduct(exprs(0), exprs(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction(
      "shingle_set",
      exprs => { arity(exprs, "shingle_set", 1, 2)
        if (exprs.length > 1)
          ShingleSet(exprs.head,
            GraftFunctions.intLiteralArg(exprs(1), "shingle_set", "n"))
        else ShingleSet(exprs.head) },
      "scala_udf")
    reg.createOrReplaceTempFunction(
      "token_counts", exprs => { arity(exprs, "token_counts", 1, 1)
        TokenCounts(exprs.head) }, "scala_udf")
    reg.createOrReplaceTempFunction(
      "minhash_sig",
      exprs => { arity(exprs, "minhash_sig", 2, 2)
        MinhashSig(exprs.head,
          GraftFunctions.intLiteralArg(exprs(1), "minhash_sig", "numHashes")) },
      "scala_udf")
    reg.createOrReplaceTempFunction(
      "simhash_sig", exprs => { arity(exprs, "simhash_sig", 1, 1)
        SimhashSig(exprs.head) }, "scala_udf")
  }
}

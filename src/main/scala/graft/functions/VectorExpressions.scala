package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two double arrays as a native Catalyst expression
  * with whole-stage codegen.
  *
  * Spark's higher-order functions (`aggregate(zip_with(...))`) are
  * CodegenFallback — every element allocates lambda-variable holders
  * and boxes through InternalRow, which dominates the similarity
  * kernels' profile. This expression compiles to a tight primitive
  * loop over the two ArrayData buffers inside the enclosing
  * WholeStageCodegen stage: no allocation, no boxing, no virtual calls
  * per element.
  *
  * Semantics are identical to the left-fold
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,p) -> acc+p)`:
  * strict left-to-right IEEE double accumulation over min(len) pairs,
  * so results are bit-for-bit unchanged when swapped in (the DuckDB
  * oracles need no adjustment).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires two ARRAY<DOUBLE> args, got ${left.dataType} and ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column-level API for the engine's native functions. */
object GraftFunctions {

  /** Idempotently register the engine's expressions with a session's
    * function registry (per-session, cheap to call from every query
    * builder). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "count_in_set", exprs => CountInSet(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sum_strlen", exprs => SumStrLen(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "py_norm", exprs => PyNorm(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", exprs => MinHashSig(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_tf", exprs => TokenTf(exprs(0)), "built-in")
  }

  def dot_product(a: Column, b: Column): Column = call_function("dot_product", a, b)
  def rolling_hash(tokens: Column, base: Column): Column = call_function("rolling_hash", tokens, base)

  /** Cast any numeric array to ARRAY<DOUBLE> (the kernels' input type). */
  def as_doubles(c: Column): Column =
    org.apache.spark.sql.functions.transform(c, x => x.cast(org.apache.spark.sql.types.DoubleType))

  /** L2 norm via the codegen kernel. */
  def l2_norm(v: Column): Column =
    org.apache.spark.sql.functions.sqrt(dot_product(v, v))

  /** Cosine similarity of two ARRAY<DOUBLE> columns. */
  def cosine(a: Column, b: Column): Column =
    dot_product(a, b) / (l2_norm(a) * l2_norm(b))
}

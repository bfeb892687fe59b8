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

/** Intersection cardinality of two SORTED-ascending ARRAY<LONG> sets
  * as a native codegen expression — the hot inner loop of every
  * near-dup verify join (q27/q66/q70/q79/q88/q125/q128).
  *
  * Why not `size(array_intersect(a, b))`: ArrayIntersect builds a
  * SQLOpenHashSet from one side and MATERIALIZES the intersection
  * array, PER CANDIDATE PAIR — at 100× sf0.1 the verify stage spends
  * its profile in OpenHashSet rehash/add (19M candidate pairs × ~150-
  * element sets, and a doc in k candidate pairs pays k hash-set
  * builds). On pre-sorted distinct arrays the same count is a
  * two-pointer merge: no allocation, no hashing, no output array, and
  * early exit when either side is exhausted.
  *
  * PRECONDITION: both inputs sorted ascending with distinct elements
  * (the engine's set frames are — MinHashSig emits sorted sets and
  * the collect_set paths wrap in sort_array). On unsorted input the
  * count is an UNDERCOUNT, which the cross-engine oracle (raw-text
  * intersection joins in DuckDB) fails loudly.
  */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _                                                 => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"intersect_count requires two ARRAY<BIGINT> args, got ${left.dataType} and ${right.dataType}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements(); val nb = y.numElements()
    var i = 0; var j = 0; var cnt = 0L
    // Null slots (possible when the input type is containsNull=true,
    // e.g. built by a transform() lambda) are not set members: skip
    // them instead of calling getLong on them, which would read
    // garbage.
    while (i < na && j < nb) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val xa = x.getLong(i); val yb = y.getLong(j)
        if (xa < yb) i += 1
        else if (xa > yb) j += 1
        else { cnt += 1L; i += 1; j += 1 }
      }
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val xa = ctx.freshName("xa"); val yb = ctx.freshName("yb")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0; int $j = 0; long $cnt = 0L;
         |while ($i < $na && $j < $nb) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    long $xa = $a.getLong($i);
         |    long $yb = $b.getLong($j);
         |    if ($xa < $yb) { $i++; }
         |    else if ($xa > $yb) { $j++; }
         |    else { $cnt++; $i++; $j++; }
         |  }
         |}
         |${ev.value} = $cnt;
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
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "intersect_count", exprs => IntersectCount(exprs(0), exprs(1)), "built-in")
  }

  /** Sorted-set intersection cardinality (see [[IntersectCount]]);
    * requires [[register]] on the owning session. */
  def intersect_count(a: Column, b: Column): Column =
    call_function("intersect_count", a, b)

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

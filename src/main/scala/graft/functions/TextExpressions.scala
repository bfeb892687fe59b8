package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Membership-count kernel for the text-analysis operators: how many
  * elements of a string array are contained in a fixed word set.
  *
  * Replaces `size(filter(toks, t -> t IN (...)))` — Spark 4 higher-order
  * functions are CodegenFallback, and the lang-ID query evaluated five
  * of them per row (one per language). This compiles to one hash-set
  * probe loop per row inside the enclosing WholeStageCodegen stage: the
  * set is built once per plan from the foldable literal and shared via
  * a reference object — no per-row allocation, no boxing.
  *
  * Semantics match the IN-list form exactly (binary string equality),
  * so the DuckDB `list_contains` oracles are unchanged. Null elements
  * never match (IN-list semantics for the count: a null element adds 0).
  */
case class CountInSet(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isStrArr(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case _                        => false
    }
    if (!isStrArr(left.dataType) || !isStrArr(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"count_in_set requires two ARRAY<STRING> args, got ${left.dataType} and ${right.dataType}")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure("count_in_set's word set must be a literal")
    else TypeCheckResult.TypeCheckSuccess
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_in_set"

  /** The probe set, built once from the foldable right child. UTF8String
    * is cloned out of the literal's backing buffer so the set owns its
    * bytes. */
  @transient private lazy val wordSet: java.util.HashSet[UTF8String] = {
    val arr = right.eval().asInstanceOf[ArrayData]
    val s = new java.util.HashSet[UTF8String](arr.numElements() * 2)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) s.add(arr.getUTF8String(i).clone())
      i += 1
    }
    s
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val toks = a.asInstanceOf[ArrayData]
    var cnt = 0
    var i = 0
    while (i < toks.numElements()) {
      if (!toks.isNullAt(i) && wordSet.contains(toks.getUTF8String(i))) cnt += 1
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", wordSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val i = ctx.freshName("i")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $cnt = 0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Total character count of a string array — replaces the
  * CodegenFallback fold `aggregate(transform(toks, t -> length(t)), 0,
  * (a, x) -> a + x)` in the quality metrics with one primitive loop
  * (`numChars` is the same character semantics as `length()`). */
case class SumStrLen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"sum_strlen requires ARRAY<STRING>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "sum_strlen"

  override def nullSafeEval(a: Any): Any = {
    val toks = a.asInstanceOf[ArrayData]
    var acc = 0L
    var i = 0
    while (i < toks.numElements()) {
      if (!toks.isNullAt(i)) acc += toks.getUTF8String(i).numChars()
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |long $acc = 0L;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i)) $acc += $a.getUTF8String($i).numChars();
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

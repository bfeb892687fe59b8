package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-ROW term frequencies over a token array:
  * `token_tf(toks) -> ARRAY<STRUCT<tok: STRING, tf: BIGINT>>`, empty
  * and null tokens skipped, first-occurrence order.
  *
  * Why an Expression: a document's term frequencies are a ROW-LOCAL
  * construct (all of a doc's tokens live in its one `toks` array), so
  * shuffling exploded token OCCURRENCES into a `groupBy(doc_id, tok)`
  * buys nothing at any scale — the same argument as [[MinHashSig]] for
  * the shingle state. This kernel folds the occurrence level away
  * before anything leaves the row: the q82 keyword query drops from
  * two corpus scans + an occurrence-level exchange to ONE map-only
  * corpus pass whose output is already at (doc, distinct-token)
  * granularity. No built-in composition gets there: `aggregate` into a
  * map is interpreted HOF eval (the measured q116 blow-up family), and
  * `explode + groupBy` is the shuffle this exists to remove.
  *
  * Parity contract (pinned by FunctionsSpec against the SQL twin
  * `explode + filter(length > 0) + groupBy(doc_id, tok).count`): same
  * (tok, tf) multiset per row; order is first occurrence, which no
  * consumer observes (they aggregate or window over the pairs).
  */
case class TokenTf(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"token_tf requires ARRAY<STRING>, got $t")
  }

  override def dataType: DataType = TokenTf.schema
  override def prettyName: String = "token_tf"

  override def nullSafeEval(a: Any): Any =
    TokenTf.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TokenTf.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, a => s"$cls.compute($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenTf {
  val schema: DataType = ArrayType(
    StructType(Seq(
      StructField("tok", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)

  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    // LinkedHashMap: deterministic first-occurrence order. Keys are
    // CLONED — input UTF8Strings may point into a reused scan buffer,
    // and the returned rows outlive this eval.
    val counts = new java.util.LinkedHashMap[UTF8String, Long]()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        if (t.numBytes() > 0) {
          val prev = counts.get(t)
          if (prev == 0L && !counts.containsKey(t)) counts.put(t.clone(), 1L)
          else counts.put(t, prev + 1L)
        }
      }
      i += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var p = 0
    while (it.hasNext) {
      val e = it.next()
      out(p) = new GenericInternalRow(Array[Any](e.getKey, e.getValue))
      p += 1
    }
    new GenericArrayData(out)
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a token array — the document
  * fingerprint primitive [EXT] (SURVEY.md §2B text rows: "document
  * fingerprinting (rolling hash)").
  *
  * h = fold(tokens) { h * base + tokenHash(t) } in wrapping 64-bit
  * arithmetic, where tokenHash is a per-token FNV-1a over utf-8 bytes.
  * Position-sensitive (unlike a bag-of-words md5) and incremental —
  * the streaming form can roll a window by subtracting base^k terms.
  * Codegen emits one tight loop; no boxing.
  */
case class RollingHash(tokens: Expression, base: Expression)
    extends BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = base
  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, base.dataType) match {
      case (ArrayType(StringType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (t, b) => TypeCheckResult.TypeCheckFailure(
        s"rolling_hash requires (ARRAY<STRING>, BIGINT), got ($t, $b)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(ts: Any, b: Any): Any = {
    val arr = ts.asInstanceOf[ArrayData]
    val bs = b.asInstanceOf[Long]
    var h = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      h = h * bs + RollingHash.fnv1a(arr.getUTF8String(i))
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, bs) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val cls = RollingHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |int $n = $arr.numElements();
         |long $h = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $h = $h * $bs + $cls.fnv1a($arr.getUTF8String($i));
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(tokens = newLeft, base = newRight)
}

object RollingHash {
  /** FNV-1a over the token's utf-8 bytes (wrapping 64-bit). */
  def fnv1a(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}

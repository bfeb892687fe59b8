package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-ROW 64-bit SimHash (Charikar, STOC '02) over a token array —
  * the shuffle-free fingerprint kernel.
  *
  * The aggregate formulation (q28/q61: explode -> distinct -> groupBy)
  * spends a full shuffle of every token to build fingerprints; at
  * 100 TB that exchange dominates the job. This expression computes the
  * same construction row-local — distinct tokens, one 64-bit FNV-1a
  * per token, per-bit ±1 votes, sign -> bit — inside whole-stage
  * codegen, so fingerprinting a corpus is a map-only scan and the ONLY
  * shuffle a dedup needs is on the (tiny) fingerprint itself.
  *
  * Deliberately fnv1a-based, not md5: the whole hash fits one long, no
  * digest allocation per token. q28 keeps the md5 form as the published
  * cross-engine fingerprint; both are valid SimHash families. The
  * DuckDB oracle (q63) reproduces this bit-for-bit from the same fnv1a
  * fold in HUGEINT arithmetic.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 requires ARRAY<STRING>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(a: Any): Any =
    SimHash64.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SimHash64.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, a => s"$cls.compute($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  /** Shared by interpreted eval and codegen: distinct non-empty tokens,
    * fnv1a per token, ±1 vote per bit, sign -> bit. */
  def compute(toks: ArrayData): Long = {
    val votes = new Array[Int](64)
    val seen = new java.util.HashSet[UTF8String]()
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        if (t.numBytes() > 0 && seen.add(t)) {
          val h = RollingHash.fnv1a(t)
          var j = 0
          while (j < 64) {
            if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
            j += 1
          }
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.types.TypeLattice

/** Normalize a string through the PYTHON literal grammars so a
  * following ANSI cast is bit-faithful to the reference's `int()` /
  * `float()` / `cast_timestamp_compat` / `datetime.fromisoformat`
  * casts (mongo2pq/schema.py:123-158). Returns NULL when Python would
  * raise ValueError — the caller decides whether that is an error
  * (Normalizer raises, matching the reference's crash-on-bad-row).
  *
  * Modes:
  *  - 'int':   Python int() — Unicode digits, single underscores,
  *             isspace() stripping; renders a decimal string
  *  - 'float': Python float() — adds inf/infinity/nan forms and
  *             scientific notation; renders a Spark-castable double
  *  - 'epoch': int() falling back to float() (cast_timestamp_compat,
  *             schema.py:143-150)
  *  - 'iso':   CPython 3.11 fromisoformat; renders
  *             'yyyy-MM-dd HH:mm:ss.SSSSSS' (UTC wall-clock)
  *
  * Codegen is a single static call — the surrounding projection stays
  * inside WholeStageCodegen (same pattern as [[RollingHash]]).
  */
case class PyNorm(child: Expression, modeExpr: Expression)
    extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = modeExpr

  private lazy val mode: String =
    Option(modeExpr.eval(null)).map(_.asInstanceOf[UTF8String].toString).orNull

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, modeExpr.dataType) match {
      case (StringType, StringType) if modeExpr.foldable =>
        val m = mode // null when the foldable mode is a NULL literal
        if (m != null && PyNorm.modes(m)) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(s"unknown py_norm mode '$m'")
      case (t, m) => TypeCheckResult.TypeCheckFailure(
        s"py_norm requires (STRING, foldable STRING), got ($t, $m)")
    }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "py_norm"

  override def nullSafeEval(s: Any, m: Any): Any =
    PyNorm.normalize(s.asInstanceOf[UTF8String], m.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PyNorm.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (s, m) => {
      s"""
         |${ev.value} = $cls.normalize($s, $m);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(child = newLeft, modeExpr = newRight)
}

object PyNorm {
  private val modes = Set("int", "float", "epoch", "iso")

  private val isoOut = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** Double -> Spark-ANSI-castable string ("Infinity"/"NaN" spellings
    * match Spark's string->double cast). */
  private def renderDouble(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d == Double.PositiveInfinity) "Infinity"
    else if (d == Double.NegativeInfinity) "-Infinity"
    else d.toString

  def normalize(s: UTF8String, mode: UTF8String): UTF8String = {
    val str = s.toString
    val out: Option[String] = mode.toString match {
      case "int"   => TypeLattice.parsePythonInt(str).map(_.toString)
      case "float" => TypeLattice.parsePythonFloat(str).map(renderDouble)
      case "epoch" => TypeLattice.parsePythonInt(str).map(_.toString)
        .orElse(TypeLattice.parsePythonFloat(str).map(renderDouble))
      case "iso"   => TypeLattice.parseIsoDateTime(str).map(isoOut.format)
      case _       => None
    }
    out.map(UTF8String.fromString).orNull
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product over two `array<double>` columns.
  *
  * The similarity tier's hot loop is `Σ aᵢ·bᵢ` evaluated per candidate
  * pair. Spark's built-in rendering (`aggregate(zip_with(a, b, ...))`)
  * is a higher-order function, which Catalyst evaluates interpreted —
  * one closure call per element per pair. At bench scale that made the
  * exact cosine tier 70%+ of total runtime. This native Expression
  * generates a tight primitive loop inside whole-stage codegen instead
  * (the brief's preference order: native `Expression` with `doGenCode`
  * over UDFs), ~50× faster per pair and still fully Catalyst-planned.
  *
  * Semantics: pairwise product-sum accumulated left-to-right in index
  * order (so results are bit-stable and reproducible by an oracle engine
  * summing in list order). Null arrays propagate null, and so does a
  * LENGTH MISMATCH — `zip_with` pads the shorter side with nulls and the
  * null product sinks `aggregate` to NULL, so returning a truncated
  * partial sum here would both diverge from the builtin rendering and
  * dress up an upstream dimension bug as a plausible score. Elements are
  * assumed non-null (embedding vectors), matching `zip_with`+`aggregate`
  * on the same data.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // No ExpectsInputTypes (its input-type API is private[sql]): each side
  // must already be array<float> or array<double> — no implicit numeric
  // coercion. Floats are widened per element inside the loop, which is
  // bit-identical to cast-the-array-then-multiply but avoids the
  // interpreted `transform()` pass (and its per-row array allocation)
  // that a cast would otherwise cost in the hot path.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> arguments, got ${l.sql} and ${r.sql}")
    }

  private def floatSide(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // resolved-type flags hoisted out of the per-row loop (interpreted
  // eval would otherwise pattern-match dataType twice per row); lazy so
  // they evaluate only after analysis resolves the children
  @transient private lazy val leftIsFloat = floatSide(left)
  @transient private lazy val rightIsFloat = floatSide(right)

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = ArrayDot.Name

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        val xv = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
        acc += xv * yv
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val xv = if (floatSide(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val yv = if (floatSide(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $xv * $yv;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  val Name = "graft_array_dot"

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[ArrayDot].getName, null, Name,
    "_FUNC_(a, b) - dot product of two array<double> values.",
    "", "", "", "", "", "", "built-in")
}

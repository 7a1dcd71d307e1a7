package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** All `tables` sign-LSH bucket ids of one embedding vector in a single
  * native expression: returns `array<long>` of length `tables`, entry t
  * = Σ_{p : dot(e, plane(t,p)) > 0} 2^p over the md5-derived hyperplane
  * family ([[graft.operators.Similarity.planeComponent]] — the ONE
  * definition, shared with the oracle SQL).
  *
  * Why an expression and not the column-combinator rendering: the
  * previous plan inlined tables × bits literal hyperplanes (16 × 12 ×
  * 64 = 12,288 array literals) into one projection. Whole-stage codegen
  * compiled it, but the generated method's bytecode exceeded the JVM's
  * JIT compilation limit (DontCompileHugeMethods, 8 KB), so the hottest
  * projection of the similarity tier ran in the BYTECODE INTERPRETER —
  * measured 2.8 s for 2,000 rows at 16×12 where the arithmetic is ~25 ms
  * (r15 probe; guide §1.2 step 2, per-task work). Here the plane matrix
  * is ONE flattened `double[]` reference object and the loop lives in a
  * small JIT-compiled helper, so per-row cost is the arithmetic.
  *
  * Semantics are bit-identical to the literal rendering: each plane dot
  * accumulates left-to-right in index order with per-element float
  * widening (the [[ArrayDot]] contract), the strict `> 0` sign test, and
  * bucket bits summed as 2^p. A length-mismatched vector yields NULL
  * (as ArrayDot's mismatch rule; the operator guards with raise_error
  * upstream so it is unreachable in practice).
  */
case class SignLshBuckets(child: Expression, tables: Int, bits: Int, dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> argument, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = SignLshBuckets.Name

  @transient private lazy val childIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Flattened (tables × bits × dim) plane matrix; rebuilt lazily on
    * each JVM from the deterministic md5 derivation, so the expression
    * serializes as three ints, never kilobytes of literals.
    */
  @transient private lazy val planes: Array[Double] =
    SignLshBuckets.planeMatrix(tables, bits, dim)

  override def nullSafeEval(input: Any): Any =
    SignLshBuckets.compute(
      input.asInstanceOf[ArrayData], planes, tables, bits, dim, childIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    val cls = SignLshBuckets.getClass.getName.stripSuffix("$") // companion
    nullSafeCodeGen(ctx, ev, e => {
      val r = ctx.freshName("r")
      s"""
         |ArrayData $r = $cls.compute($e, $planesRef, $tables, $bits, $dim, $childIsFloat);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignLshBuckets =
    copy(child = newChild)
}

object SignLshBuckets {
  val Name = "graft_sign_lsh_buckets"

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SignLshBuckets].getName, null, Name,
    "_FUNC_(e, tables, bits, dim) - per-table sign-LSH bucket ids of an embedding.",
    "", "", "", "", "", "", "built-in")

  /** The flattened md5-derived hyperplane family — delegates to the one
    * plane definition the oracle SQL mirrors.
    */
  def planeMatrix(tables: Int, bits: Int, dim: Int): Array[Double] = {
    val out = new Array[Double](tables * bits * dim)
    var i = 0
    var t = 0
    while (t < tables) {
      var p = 0
      while (p < bits) {
        var d = 0
        while (d < dim) {
          out(i) = graft.operators.Similarity.planeComponent(t, p, d)
          i += 1; d += 1
        }
        p += 1
      }
      t += 1
    }
    out
  }

  /** The JIT-compiled kernel (called from both eval paths and from the
    * generated code): all-table buckets of one vector, or null on a
    * dimension mismatch.
    */
  def compute(e: ArrayData, planes: Array[Double], tables: Int, bits: Int,
      dim: Int, isFloat: Boolean): ArrayData = {
    if (e.numElements() != dim) return null
    val out = new Array[Long](tables)
    var off = 0
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < bits) {
        var acc = 0.0
        var d = 0
        while (d < dim) {
          val ev = if (isFloat) e.getFloat(d).toDouble else e.getDouble(d)
          acc += ev * planes(off + d)
          d += 1
        }
        if (acc > 0) bucket |= 1L << p
        off += dim
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd portable 60-bit md5 hash of a string — the native form of
  * the engine's ubiquitous
  * `cast(conv(substr(md5(x), 1, 15), 16, 10) as bigint)` chain
  * ([[graft.operators.Dedup.h60]]'s contract: the value DuckDB
  * reproduces as `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`).
  *
  * That chain sits in the hot path of every shingle, sketch, bucket,
  * and split derivation, and the built-in rendering pays for it three
  * times per row: md5 bytes → 32-char hex string, substring copy, then
  * conv()'s radix PARSE back to the integer the hex was printed from.
  * This expression computes the identical value directly from the
  * digest bytes — the first 15 hex chars of an md5 are the top 60 bits
  * of its first 8 bytes, so the value is `(first-8-bytes big-endian)
  * >>> 4` — one thread-local digest call, zero string materialization,
  * inside whole-stage codegen.
  *
  * EQUIVALENCE IS THE CONTRACT: FunctionsSpec pins `graft_h60(x)` ==
  * the builtin chain over adversarial inputs (unicode, empty, long)
  * and the corpus, and every oracle gate re-proves it end-to-end —
  * the DuckDB side still renders the hex form.
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = Hash60.Name

  override def nullSafeEval(s: Any): Any =
    Hash60.hash(s.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Hash60.hash($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

object Hash60 {
  val Name = "graft_h60"

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[Hash60].getName, null, Name,
    "_FUNC_(str) - top 60 bits of md5(str) as a non-negative bigint " +
      "(equals cast(conv(substr(md5(str), 1, 15), 16, 10) as bigint)).",
    "", "", "", "", "", "", "built-in")

  private val digest =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Top 60 bits of md5(bytes): first 8 digest bytes big-endian,
    * shifted right 4 — exactly the integer the first 15 hex chars
    * print. Always in [0, 2^60).
    */
  def hash(bytes: Array[Byte]): Long = {
    val d = digest.get()
    d.reset()
    val md = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (md(i) & 0xffL); i += 1 }
    v >>> 4
  }
}

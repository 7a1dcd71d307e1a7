package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.functions.call_function

/** Registration point for the engine's native Catalyst expressions.
  *
  * Wired through the public `SparkSessionExtensions` API (the
  * `withExtensions` hook on the session builder — see `Graft.session`),
  * so the functions resolve by name in SQL text and via
  * [[org.apache.spark.sql.functions.call_function]] — no private Spark
  * internals, no UDF registry.
  */
object GraftFunctions {

  def register(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(ArrayDot.Name),
      ArrayDot.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, s"${ArrayDot.Name} takes exactly 2 arguments")
        ArrayDot(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier(Hash60.Name),
      Hash60.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, s"${Hash60.Name} takes exactly 1 argument")
        Hash60(children.head)
      }))
  }

  /** Column-level helper: `array_dot(a, b)` — codegen'd Σ aᵢ·bᵢ. */
  def array_dot(a: Column, b: Column): Column = call_function(ArrayDot.Name, a, b)
}

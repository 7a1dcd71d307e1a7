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
    ext.injectFunction((
      FunctionIdentifier(SignLshBuckets.Name),
      SignLshBuckets.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 4, s"${SignLshBuckets.Name} takes exactly 4 arguments")
        def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
            what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
              org.apache.spark.sql.types.IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"${SignLshBuckets.Name}: $what must be an int literal, got $other")
        }
        SignLshBuckets(children.head, intLit(children(1), "tables"),
          intLit(children(2), "bits"), intLit(children(3), "dim"))
      }))
  }

  /** Column-level helper: `array_dot(a, b)` — codegen'd Σ aᵢ·bᵢ. */
  def array_dot(a: Column, b: Column): Column = call_function(ArrayDot.Name, a, b)

  /** Column-level helper: all `tables` sign-LSH bucket ids of an
    * embedding as `array<long>` — one JIT-friendly kernel instead of
    * tables × bits inlined literal-plane dots (see [[SignLshBuckets]]).
    */
  def sign_lsh_buckets(e: Column, tables: Int, bits: Int, dim: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function(SignLshBuckets.Name, e, lit(tables), lit(bits), lit(dim))
  }
}

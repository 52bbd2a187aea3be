package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column expressions (similarity search over
  * `Array[Float]` columns). The dot-product inner loop is the native
  * codegen'd [[DotProductExpr]] — Spark's higher-order functions are
  * CodegenFallback (interpreted, intermediate-array-allocating), too cold
  * for the ANN hot path; the HOF forms are kept as `dotHof`/`norm2Hof`
  * reference implementations (spec-compared). Doubles throughout for
  * cross-engine parity.
  */
object VectorFns {

  private def expr(c: Column) = org.apache.spark.sql.graft.Bridge.expression(c)
  private def toCol(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.graft.Bridge.column(e)

  def dot(a: Column, b: Column): Column = toCol(DotProductExpr(expr(a), expr(b)))

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  private def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Reference HOF forms (CodegenFallback — correctness baseline only). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm2Hof(a: Column): Column =
    sqrt(aggregate(toDouble(a), lit(0.0), (acc, x) => acc + x * x))

  /** Coarse LSH/IVF-style bucket from the signs of the first 4 dimensions
    * (0..15). At scale: bucket both sides, shuffle on bucket, search within
    * bucket only — the classic random-hyperplane LSH with axis-aligned
    * planes (deterministic, oracle-reproducible).
    */
  def signBucket4(v: Column): Column = {
    def bit(i: Int) = when(element_at(v, i + 1) > 0.0f, 1).otherwise(0)
    (bit(0) * 8 + bit(1) * 4 + bit(2) * 2 + bit(3)).cast("int")
  }
}

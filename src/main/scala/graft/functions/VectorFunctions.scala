package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions over ArrayType(FloatType) (SURVEY.md
  * §2.D D3/D5). Pure higher-order Catalyst expressions — the fold in [[dot]]
  * is a strict left-to-right accumulation, which matches DuckDB's
  * list_sum(list_transform(...)) ordering, so cosine scores agree
  * bit-for-bit with a SQL oracle.
  */
object VectorFunctions {
  /** Dot product in double precision: the codegen'd [[FloatDotProduct]]
    * expression (register per session via [[FloatDotProduct.register]]).
    * Same left-fold accumulation as the higher-order
    * `aggregate(zip_with(...))` formulation it replaces, ~10x faster in
    * pair joins because it participates in whole-stage codegen.
    */
  def dot(a: Column, b: Column): Column = call_function("float_dot", a, b)

  /** Reference formulation via Spark built-ins only (interpreted HOFs);
    * kept for cross-checking the custom expression.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity given precomputed norms (avoids recomputing the
    * per-row norm inside an O(n²) pair join).
    */
  def cosineWithNorms(dotAB: Column, normA: Column, normB: Column): Column =
    dotAB / (normA * normB)

  /** DuckDB fragments computing the same values. */
  def oDot(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
  def oNorm(a: String): String =
    s"sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
}

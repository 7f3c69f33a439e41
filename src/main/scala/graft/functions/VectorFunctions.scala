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
  def cosineWithNorms(dotAB: Column, normA: Column, normB: Column): Column = {
    // Spark 4's default ANSI mode throws DIVIDE_BY_ZERO even for DOUBLE
    // division, so a zero-norm (degenerate) vector would abort the whole
    // query. The JVM tile kernels compute the same expression in raw
    // double arithmetic and get NaN (0/0) — mirror that here so every
    // formulation agrees: zero-norm cosines surface as NaN (ranked
    // greatest, the documented tie contract), never a runtime error.
    // (DuckDB returns NULL for double/0 — fixtures carry no zero-norm
    // vectors, so the oracle never sees the case; the cross-engine edge
    // is documented rather than silently divergent.)
    // dotAB * NaN keeps NULL propagation intact: a NULL dot (mismatched
    // vector lengths — float_dot's ragged contract) must stay NULL, not
    // become a NaN pair the tile kernel's ragged path would never emit.
    val denom = normA * normB
    when(denom === lit(0.0), dotAB * lit(Double.NaN))
      .otherwise(dotAB / denom)
  }

  /** DuckDB fragments computing the same values. */
  def oDot(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
  def oNorm(a: String): String =
    s"sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
}

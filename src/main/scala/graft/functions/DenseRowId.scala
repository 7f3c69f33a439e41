package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{DataType, LongType}

/** Dense, gap-free, strictly increasing row id: partition `i` emits
  * `start + offsets(i) + 1, start + offsets(i) + 2, …` in row order.
  *
  * This is the codegen replacement for the `localCheckpoint + rdd.
  * zipWithIndex` id path (reference node.py:291-294 "unique, strictly
  * monotonically increasing" — which `monotonically_increasing_id()` alone
  * cannot satisfy: its ids are neither dense nor stable across executions).
  * The caller pre-computes per-partition row counts with one cheap
  * aggregate pass (`spark_partition_id` groupBy — map-side partial agg, so
  * only #partitions rows shuffle) and hands the exclusive prefix sums in as
  * `offsets`; this expression then assigns ids inside whole-stage codegen,
  * so the write path keeps its batch in the query plan instead of pinning
  * it in executor storage and rebuilding a DataFrame from an RDD.
  *
  * Correctness contract (the same one zipWithIndex had): the two passes
  * must see the same partitioning — true for append batches, which are
  * unions of already-materialized user frames and deterministic scans.
  */
case class DenseRowId(start: Long, offsets: Array[Long])
    extends LeafExpression with Nondeterministic {

  @transient private[this] var next: Long = _

  override def stateful: Boolean = true

  override def initializeInternal(partitionIndex: Int): Unit = {
    if (partitionIndex >= offsets.length) throw DenseRowId.drift(
      partitionIndex, offsets.length)
    next = start + offsets(partitionIndex) + 1L
  }

  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "dense_row_id"

  override def evalInternal(input: InternalRow): Any = {
    val v = next
    next += 1L
    v
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nextTerm = ctx.addMutableState(CodeGenerator.JAVA_LONG, "denseRowIdNext")
    val offsetsRef = ctx.addReferenceObj("denseRowIdOffsets", offsets, "long[]")
    // fail LOUDLY if the write pass sees more partitions than the counting
    // pass reserved for (partitioning drift) — silent modulo/clamp would
    // mint duplicate "unique, strictly monotonically increasing" ids
    ctx.addPartitionInitializationStatement(
      s"""if (partitionIndex >= $offsetsRef.length) {
         |  throw graft.functions.DenseRowId.drift(partitionIndex, $offsetsRef.length);
         |}
         |$nextTerm = ${start}L + $offsetsRef[partitionIndex] + 1L;""".stripMargin)
    ev.copy(
      code = code"final long ${ev.value} = $nextTerm; $nextTerm++;",
      isNull = FalseLiteral)
  }
}

object DenseRowId {
  /** Partitioning-drift error (called from generated code too). */
  def drift(partitionIndex: Int, reserved: Int): IllegalStateException =
    new IllegalStateException(
      s"dense_row_id: partition index $partitionIndex outside the " +
        s"$reserved partitions the counting pass reserved ids for - the " +
        "write pass's partitioning drifted; the batch must be pinned " +
        "(localCheckpoint) before id assignment")

  /** Register `dense_row_id(start, offsets_array)` (idempotent). Both
    * arguments must be foldable — the builder folds them at plan time into
    * the expression's driver-computed seed values (they are write-path
    * plumbing, not per-row inputs).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dense_row_id"),
      new ExpressionInfo(classOf[DenseRowId].getName, "dense_row_id"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2 && exprs.forall(_.foldable),
          "dense_row_id(startLiteral, offsetsArrayLiteral)")
        val start = exprs(0).eval(null).asInstanceOf[Long]
        val offsets = exprs(1).eval(null).asInstanceOf[ArrayData].toLongArray()
        DenseRowId(start, offsets)
      })

  /** Column form, for `withColumn` on the write path. */
  def column(spark: SparkSession, start: Long, offsets: Array[Long]): Column = {
    register(spark)
    // non-empty literal list keeps the array literal typed long even for a
    // zero-partition frame (where the expression never initializes)
    val safe = if (offsets.isEmpty) Array(0L) else offsets
    expr(s"dense_row_id(${start}L, array(${safe.map(o => s"${o}L").mkString(",")}))")
  }
}

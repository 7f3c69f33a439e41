package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BpeTokenCount, DescKey, DistinctNgramCount, FloatDotProduct, Int8Quantize, RepetitionProfile, TokenNgrams, TopKStructs}

/** Spark-native packaging of the engine's custom expressions: register the
  * library through the extensions hook instead of imperative per-session
  * calls —
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * (or `.withExtensions(new GraftExtensions)` on the builder). Every
  * session created with the conf gets `float_dot` in its function
  * registry; cluster deployments set one conf instead of threading
  * `FloatDotProduct.register(spark)` through user code. The injected
  * builder is identical to the one `register` installs, so either path
  * yields the same analyzed plans.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"float_dot requires exactly 2 arguments, got ${exprs.length}")
        FloatDotProduct(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("bpe_token_count"),
      new ExpressionInfo(classOf[BpeTokenCount].getName, "bpe_token_count"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"bpe_token_count requires exactly 1 argument, got ${exprs.length}")
        BpeTokenCount(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("distinct_ngram_count"),
      new ExpressionInfo(classOf[DistinctNgramCount].getName, "distinct_ngram_count"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"distinct_ngram_count requires exactly 2 arguments, got ${exprs.length}")
        DistinctNgramCount(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("repetition_profile"),
      new ExpressionInfo(classOf[RepetitionProfile].getName, "repetition_profile"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"repetition_profile requires exactly 1 argument, got ${exprs.length}")
        RepetitionProfile(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("token_ngrams"),
      new ExpressionInfo(classOf[TokenNgrams].getName, "token_ngrams"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          s"token_ngrams requires exactly 3 arguments, got ${exprs.length}")
        TokenNgrams(exprs(0), exprs(1), exprs(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("int8_quantize"),
      new ExpressionInfo(classOf[Int8Quantize].getName, "int8_quantize"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"int8_quantize requires exactly 1 argument, got ${exprs.length}")
        Int8Quantize(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("topk_structs"),
      new ExpressionInfo(classOf[TopKStructs].getName, "topk_structs"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"topk_structs requires exactly 2 arguments, got ${exprs.length}")
        TopKStructs(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("desc_key"),
      new ExpressionInfo(classOf[DescKey].getName, "desc_key"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"desc_key requires exactly 1 argument, got ${exprs.length}")
        DescKey(exprs.head)
      }))
  }
}

object GraftExtensions {
  // weak keys: a registered session must stay collectable
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, java.lang.Boolean]())

  /** Idempotently register every library expression in `spark`'s function
    * registry — the imperative twin of the extensions hook, for sessions
    * built without `spark.sql.extensions`. Guarded per session so repeat
    * calls (the query layer invokes this on every table read) are free and
    * don't log replace warnings.
    */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit =
    if (registered.putIfAbsent(spark, java.lang.Boolean.TRUE) == null) {
      graft.functions.FloatDotProduct.register(spark)
      graft.functions.BpeTokenCount.register(spark)
      graft.functions.DistinctNgramCount.register(spark)
      graft.functions.RepetitionProfile.register(spark)
      graft.functions.TokenNgrams.register(spark)
      graft.functions.Int8Quantize.register(spark)
      graft.functions.TopKStructs.register(spark)
      graft.functions.DescKey.register(spark)
    }
}

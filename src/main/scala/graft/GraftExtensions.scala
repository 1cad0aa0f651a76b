package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions._

/** SparkSessionExtensions registering the graft SQL function surface, so SQL
  * text can use the fuzzy scorers directly:
  *
  * {{{
  *   spark.sql("SELECT wratio(a, b) FROM pairs WHERE token_set_ratio(a, b) >= 85")
  * }}}
  *
  * Enable with `.config("spark.sql.extensions", "graft.GraftExtensions")`, or
  * call [[GraftFunctions.register]] on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptors.foreach { case (name, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name),
         new ExpressionInfo("graft.functions", name),
         builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.FuzzyConjunctReorder)
  }
}

object GraftFunctions {
  private def checked(name: String, n: Int)(
      make: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      if (args.length != n) throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${args.length}")
      make(args)
    }

  /** name → expression builder for every graft SQL function. */
  val descriptors: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "fuzz_ratio" -> checked("fuzz_ratio", 2) { args => FuzzRatio(args(0), args(1)) },
    "partial_ratio" -> checked("partial_ratio", 2) { args => PartialRatio(args(0), args(1)) },
    "token_sort_ratio" -> checked("token_sort_ratio", 2) { args => TokenSortRatio(args(0), args(1)) },
    "token_set_ratio" -> checked("token_set_ratio", 2) { args => TokenSetRatio(args(0), args(1)) },
    "wratio" -> checked("wratio", 2) { args => WRatio(args(0), args(1)) },
    "normalize_title" -> checked("normalize_title", 1) { args => NormalizeTitle(args(0)) },
    "word_shingles" -> checked("word_shingles", 2) { args =>
      WordShingles(args(0), litInt(args(1), "word_shingles", "n")) },
    "char_ngrams" -> checked("char_ngrams", 2) { args =>
      CharNgrams(args(0), litInt(args(1), "char_ngrams", "q")) },
    "minhash_sig" -> checked("minhash_sig", 2) { args =>
      MinHashSig(args(0), litInt(args(1), "minhash_sig", "k")) },
    "simhash64" -> checked("simhash64", 1) { args => SimHash64(args(0)) },
    "bpe_token_count" -> checked("bpe_token_count", 1) { args =>
      BpeTokenCount(args(0)) },
    "bpe_shingles" -> checked("bpe_shingles", 2) { args =>
      BpeShingles(args(0), litInt(args(1), "bpe_shingles", "n")) },
    "bitset_inter_count" -> checked("bitset_inter_count", 2) { args =>
      BitsetInterCount(args(0), args(1)) },
    "bitset_jaccard" -> checked("bitset_jaccard", 4) { args =>
      BitsetJaccard(args(0), args(1), args(2), args(3)) },
    "sorted_string_jaccard" -> checked("sorted_string_jaccard", 2) { args =>
      SortedStringJaccard(args(0), args(1)) },
    "sorted_long_jaccard" -> checked("sorted_long_jaccard", 2) { args =>
      SortedLongJaccard(args(0), args(1)) },
    "sorted_long_jaccard_ge" -> checked("sorted_long_jaccard_ge", 3) { args =>
      SortedLongJaccardGE(args(0), args(1),
        litDouble(args(2), "sorted_long_jaccard_ge", "theta")) },
    "vec_dot" -> checked("vec_dot", 2) { args => VecDot(args(0), args(1)) },
    "dhash_bits" -> checked("dhash_bits", 1) { args => DhashBits(args(0)) },
    "vec_sub" -> checked("vec_sub", 2) { args => VecSub(args(0), args(1)) },
    // bounded per-group top-k (the rankedTopK aggregate) for SQL users:
    // SELECT key, top_k_by_key(score, id, 3) FROM t GROUP BY key
    "top_k_by_key" -> checked("top_k_by_key", 3) { args =>
      TopKByKey(args(0), args(1),
        litInt(args(2), "top_k_by_key", "k")).toAggregateExpression() },
    "vec_sum_fixed" -> checked("vec_sum_fixed", 3) { args =>
      VecSumFixed(args(0), litDouble(args(1), "vec_sum_fixed", "scale"),
        litInt(args(2), "vec_sum_fixed", "dim")) },
    "vec_norm_quant_i8" -> checked("vec_norm_quant_i8", 2) { args =>
      VecNormQuantI8(args(0), litInt(args(1), "vec_norm_quant_i8", "levels")) },
    "vec_dot_int" -> checked("vec_dot_int", 2) { args =>
      VecDotInt(args(0), args(1)) },
  )

  private def litInt(e: Expression, fn: String, param: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $param must be an integer literal, got $other")
  }

  private def litDouble(e: Expression, fn: String, param: String): Double = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Double, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: java.math.BigDecimal, _) =>
      v.doubleValue()
    case org.apache.spark.sql.catalyst.expressions.Literal(v: org.apache.spark.sql.types.Decimal, _) =>
      v.toDouble
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$fn: $param must be a numeric literal, got $other")
  }

  /** Idempotently register all graft functions on a live session — for
    * sessions not built with the extensions config (e.g. the driver's
    * Verify/Bench sessions).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    descriptors.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}

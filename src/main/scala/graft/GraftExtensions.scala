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
  /** name → expression builder for every graft SQL function. */
  val descriptors: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "fuzz_ratio" -> { args => FuzzRatio(args(0), args(1)) },
    "partial_ratio" -> { args => PartialRatio(args(0), args(1)) },
    "token_sort_ratio" -> { args => TokenSortRatio(args(0), args(1)) },
    "token_set_ratio" -> { args => TokenSetRatio(args(0), args(1)) },
    "wratio" -> { args => WRatio(args(0), args(1)) },
    "normalize_title" -> { args => NormalizeTitle(args(0)) },
    "word_shingles" -> { args => WordShingles(args(0), litInt(args(1), "word_shingles", "n")) },
    "char_ngrams" -> { args => CharNgrams(args(0), litInt(args(1), "char_ngrams", "q")) },
    "minhash_sig" -> { args => MinHashSig(args(0), litInt(args(1), "minhash_sig", "k")) },
    "simhash64" -> { args => SimHash64(args(0)) },
    "bitset_inter_count" -> { args => BitsetInterCount(args(0), args(1)) },
    "vec_dot" -> { args => VecDot(args(0), args(1)) },
  )

  private def litInt(e: Expression, fn: String, param: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $param must be an integer literal, got $other")
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

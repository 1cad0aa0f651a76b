package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Structure-level repetition signals — the Gopher-rule quality filters
  * (Rae et al. 2021 §A1.1, public) a pretraining pipeline applies on top
  * of the per-token battery in [[graft.functions.TextFunctions]]:
  * duplicate-LINE fraction, duplicate-line CHARACTER fraction, and the
  * share of word 2-grams taken by the single most frequent one. A doc of
  * boilerplate repeats whole lines (nav bars, templating) long before
  * its token-level stats look degenerate — `t5_repetition`'s distinct-
  * 2-gram ratio and these are complementary gates.
  *
  * Shape at scale: one explode + two hash aggregations keyed on
  * (doc id, line|gram) then (doc id) — all map-side-combining, no
  * windows, no driver state. The per-(doc, value) count grouping is the
  * codegen path; a per-row higher-order-function formulation would avoid
  * the shuffle but drops the whole projection to interpreted eval
  * (HOFs are CodegenFallback — the VecDot/TextKernel lesson), and the
  * aggregation's map-side combine already collapses each doc's lines
  * within its scan partition.
  */
object QualitySignals {

  /** Token array of the trimmed text; empty text → empty array in BOTH
    * engines (`split("", "\\s+")` is `[""]`, so the guard is explicit —
    * mirrored in the t9 oracle's CASE). */
  private def toks(textCol: Column): Column =
    when(length(trim(textCol)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(textCol), "\\s+"))

  /** Per-document line-repetition metrics over SYNTHESIZED lines: the
    * token stream regrouped into `lineWidth`-token lines. (The synthetic
    * corpus carries no newlines, so — like t7's embedded PII and t8's
    * embedded URLs — the structure under test is derived
    * deterministically from the text itself; on a real corpus pass
    * `split(col, "\n")` lines to the same aggregation.)
    *
    * Output per input row: idCol, `n_lines`, `dup_line_frac`
    * (1 − distinct/total), `dup_line_char_frac` (characters in repeat
    * occurrences / all line characters), `top_2gram_frac` (occurrences
    * of the most frequent word 2-gram / total 2-grams). Degenerate docs
    * (no tokens / single token) score 0.0 everywhere. */
  def lineRepetition(df: DataFrame, idCol: String, textCol: String,
      lineWidth: Int = 7): DataFrame = {
    require(lineWidth > 0, s"lineWidth must be positive, got $lineWidth")
    // spread the raw docs BEFORE the tokenize/explode/aggregate chain: a
    // one-file corpus otherwise runs it all as a single task (measured
    // 1.5 s of t9's wall at sf0.1), and both (id, …) aggregations then
    // land on the hash(id) partitioning exchange-free
    val base = df.select(col(idCol), col(textCol).as("__text"))
      .transform(Par.spread(_, col(idCol)))
      .select(col(idCol), toks(col("__text")).as("__ws"))
      .withColumn("__n", size(col("__ws")))

    // lines: ⌈n/width⌉ slices of the token array, space-joined —
    // sequence() rejects inverted bounds, so empty docs take the
    // empty-array branch (explode then emits nothing; the left join
    // below zero-fills)
    val lines = base.select(col(idCol),
        explode(when(col("__n") === 0, array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(0),
              (ceil(col("__n") / lit(lineWidth.toDouble)) - 1).cast("int"),
              lit(1)),
            i => array_join(
              slice(col("__ws"), i * lineWidth + 1, lit(lineWidth)),
              " ")))).as("line"))
    val lineAgg = lines
      .groupBy(col(idCol), col("line"))
      .agg(count(lit(1)).as("cnt"), length(col("line")).as("len"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_lines"),
        count(lit(1)).as("n_distinct"),
        sum((col("cnt") - 1) * col("len")).as("dup_chars"),
        sum(col("cnt") * col("len")).as("tot_chars"))

    // word 2-grams WITH multiplicity (word_shingles dedups — here the
    // counts are the signal)
    val grams = base.select(col(idCol),
      explode(when(col("__n") < 2, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), col("__n") - 1, lit(1)),
          i => concat_ws(" ", element_at(col("__ws"), i),
            element_at(col("__ws"), i + 1))))).as("gram"))
    val gramAgg = grams
      .groupBy(col(idCol), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol))
      .agg(max(col("cnt")).as("top_cnt"), sum(col("cnt")).as("tot_grams"))

    df.select(col(idCol))
      .join(lineAgg, Seq(idCol), "left")
      .join(gramAgg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        when(coalesce(col("n_lines"), lit(0L)) === 0, lit(0.0))
          .otherwise(lit(1.0) - col("n_distinct").cast("double")
            / col("n_lines").cast("double")).as("dup_line_frac"),
        when(coalesce(col("tot_chars"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("dup_chars").cast("double")
            / col("tot_chars").cast("double")).as("dup_line_char_frac"),
        when(coalesce(col("tot_grams"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("top_cnt").cast("double")
            / col("tot_grams").cast("double")).as("top_2gram_frac"))
  }
}

package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.operators.{Blocking, SimilarityJoin, SimilarityJoinConfig}
import graft.queries.Tables.t

/** The reference's flagship GOLD flow, end to end and oracle-checked:
  * similarity join (J1) + salary-band theta predicate (P6) + per-left
  * top-k (A3/W2) + join-output row assembly (J3) + gold projection/rename
  * (S10, sql/cleaned.sql:2-15) and the group-by-MAX unique variant
  * (sql/cleaned.sql:28-42). Scoring uses normalized Levenshtein so DuckDB
  * can replay it bit-for-bit — the WRatio flavor of the same machinery is
  * covered by j2 + ScalaTest golden pairs. */
object GoldQueries {

  private def levSim(a: Column, b: Column): Column =
    lit(100.0) * (lit(1.0) -
      levenshtein(a, b).cast("double") /
        greatest(length(a), length(b)).cast("double"))

  /** Fuzzy match `part` against itself as postings↔payroll (the testdata
    * has no payroll table; part carries a name + a money column, which is
    * all the flow needs). The postings side is a 1-in-50 sample: the
    * reference's flow is a SMALL postings table against a large payroll
    * (≈5k × 600k), and the testdata's 64-name key space would otherwise
    * make the row join-back quadratic in rows-per-name. */
  private def matches(s: SparkSession, dir: String): DataFrame = {
    val postings = t(s, dir, "part")
      .where(col("p_partkey") % 50 === 0)
      .select(
        col("p_partkey").as("posting_id"),
        col("p_name").as("business_title"),
        col("p_retailprice").as("posting_mid_salary"))
    val payroll = t(s, dir, "part").select(
      col("p_partkey").as("payroll_id"),
      col("p_name").as("title_description"),
      col("p_retailprice").as("base_salary"))
    val cfg = SimilarityJoinConfig(
      leftKey = "business_title", rightKey = "title_description",
      preScorer = levSim, preThreshold = 60.0,
      scorer = levSim, scoreThreshold = 60.0,
      blocking = Blocking.Exact, normalize = false,
      // P6 salary band (±10%) + no self-matches
      extraPredicate = Some(
        col("base_salary") >= col("posting_mid_salary") * 0.9 &&
        col("base_salary") <= col("posting_mid_salary") * 1.1 &&
        col("posting_id") =!= col("payroll_id")),
      topKPerLeft = Some(3),
      topKTieBreak = Seq(col("payroll_id").asc))
    SimilarityJoin(postings, payroll, cfg)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // GOLD.nyc_salary_matches shape: projection/rename over the match
    // output (the ORDER BY in the reference CTAS is cosmetic storage
    // order; the serving layer re-sorts — SURVEY §2.6 O1)
    "g1_gold_matches" -> ((s, dir) =>
      matches(s, dir).select(
        col("business_title").as("posted_job_title"),
        col("title_description").as("matched_actual_payroll_title"),
        floor(col("score")).cast("int").as("match_score"),
        col("posting_mid_salary"),
        col("base_salary").as("actual_base_salary"),
        col("posting_id"), col("payroll_id"))),

    // GOLD.…_unique_job_posting_title shape: one row per posted title via
    // MAX over every carried column (incl. the computed score)
    "g2_gold_unique" -> ((s, dir) =>
      matches(s, dir)
        .groupBy(col("business_title").as("posted_job_title"))
        .agg(
          max(col("title_description")).as("matched_actual_payroll_title"),
          max(floor(col("score")).cast("int")).as("match_score"),
          max(col("posting_mid_salary")).as("posting_mid_salary"),
          max(col("base_salary")).as("actual_base_salary")))
  )

  private val simCte =
    """WITH sim AS (
      |  SELECT a.p_partkey AS posting_id, a.p_name AS business_title,
      |         a.p_retailprice AS posting_mid_salary,
      |         b.p_partkey AS payroll_id, b.p_name AS title_description,
      |         b.p_retailprice AS base_salary,
      |         100.0 * (1.0 - CAST(levenshtein(a.p_name, b.p_name) AS DOUBLE)
      |           / CAST(greatest(length(a.p_name), length(b.p_name)) AS DOUBLE)) AS score
      |  FROM part a, part b
      |  WHERE a.p_partkey % 50 = 0),
      |f AS (SELECT * FROM sim
      |      WHERE score >= 60.0
      |        AND base_salary >= posting_mid_salary * 0.9
      |        AND base_salary <= posting_mid_salary * 1.1
      |        AND posting_id <> payroll_id),
      |r AS (SELECT *, row_number() OVER (PARTITION BY posting_id
      |        ORDER BY score DESC, payroll_id ASC) AS rn FROM f),
      |m AS (SELECT * FROM r WHERE rn <= 3)""".stripMargin

  val oracles: Map[String, String] = Map(
    "g1_gold_matches" -> (simCte +
      """
        |SELECT business_title AS posted_job_title,
        |       title_description AS matched_actual_payroll_title,
        |       CAST(floor(score) AS INT) AS match_score,
        |       posting_mid_salary, base_salary AS actual_base_salary,
        |       posting_id, payroll_id
        |FROM m""".stripMargin),

    "g2_gold_unique" -> (simCte +
      """
        |SELECT business_title AS posted_job_title,
        |       max(title_description) AS matched_actual_payroll_title,
        |       max(CAST(floor(score) AS INT)) AS match_score,
        |       max(posting_mid_salary) AS posting_mid_salary,
        |       max(base_salary) AS actual_base_salary
        |FROM m GROUP BY business_title""".stripMargin)
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Tables.t

/** Disclosure-risk gates (operators/Privacy) — the compliance family a
  * government-records platform runs before release (the reference
  * publishes NYC hiring data; these are the checks such a release
  * skips at its peril). All three are oracle-exact: the reports are
  * pure integer aggregation, and the DP noise is seeded md5 (the
  * portable-sketch discipline applied to randomness). */
object PrivacyQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // p1 (r14): k-ANONYMITY report over (nation, segment) — group
    // sizes + the at-risk flag at k=10. Pure counts -> exact oracle.
    "p1_k_anonymity" -> ((s, dir) =>
      graft.operators.Privacy.kAnonymityReport(
        t(s, dir, "customer"), Seq("c_nationkey", "c_mktsegment"),
        k = 10)),

    // p2 (r14): l-DIVERSITY report — market segment as the sensitive
    // attribute within each nation's quasi-group at l=5 (a k-anonymous
    // group whose members share one segment still discloses it).
    // Counts + countDistinct -> exact oracle.
    "p2_l_diversity" -> ((s, dir) =>
      graft.operators.Privacy.lDiversityReport(
        t(s, dir, "customer"), Seq("c_nationkey"), "c_mktsegment",
        l = 5)),

    // p3 (r14): ε-DP noisy segment counts, SEEDED — Laplace(1/ε) by
    // inverse CDF over the md5-derived uniform, ε=0.5 so b=2 is an
    // exact double. The release replays in any engine (auditable); ln
    // rides round(…,6) (the k5 discipline).
    "p3_dp_counts" -> ((s, dir) =>
      graft.operators.Privacy.dpCounts(
        t(s, dir, "customer"), Seq("c_mktsegment"), epsilon = 0.5,
        salt = "dp-r14"))
  )

  val oracles: Map[String, String] = Map(
    "p1_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS group_n,
        |  CAST(count(*) < 10 AS BIGINT) AS at_risk
        |FROM customer GROUP BY 1, 2""".stripMargin,

    "p2_l_diversity" ->
      """SELECT c_nationkey,
        |  CAST(count(*) AS BIGINT) AS group_n,
        |  CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_sensitive,
        |  CAST(count(DISTINCT c_mktsegment) >= 5 AS BIGINT) AS diverse
        |FROM customer GROUP BY 1""".stripMargin,

    // the noise replayed in SQL: the k2 rolling hex parse over
    // md5('dp-r14|' || segment), the +0.5/16^13 open-interval uniform,
    // the piecewise Laplace inverse CDF with b = 2
    "p3_dp_counts" ->
      """WITH g AS (
        |  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS true_n
        |  FROM customer GROUP BY 1),
        |h AS (
        |  SELECT *,
        |    (CAST(list_reduce(list_transform(string_split(substring(
        |        md5('dp-r14|' || c_mktsegment), 1, 13), ''),
        |        c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
        |        (a, c) -> a * 16 + c) AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |      / 4503599627370496 AS u
        |  FROM g),
        |nz AS (
        |  SELECT c_mktsegment, true_n,
        |    round(CASE WHEN u < 0.5
        |      THEN CAST(2 AS DOUBLE) * ln(CAST(2 AS DOUBLE) * u)
        |      ELSE CAST(-2 AS DOUBLE) *
        |        ln(CAST(2 AS DOUBLE) * (CAST(1 AS DOUBLE) - u)) END, 6)
        |      AS noise
        |  FROM h)
        |SELECT c_mktsegment, true_n, noise,
        |  round(true_n + noise, 6) AS dp_n
        |FROM nz""".stripMargin
  )
}

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

    // p5 (r14): right-to-ERASURE audit — the delete-propagation proof:
    // for the subjects to forget (every 97th customer), each keyed
    // table's total rows, referencing rows, and rows after the erasure
    // anti-join, across the key mapping (c_custkey = o_custkey =
    // events.user_id). Pure counts -> exact oracle; the spec pins
    // n_total = n_refs + n_after and the re-audit-after-erase zero.
    "p5_erasure_audit" -> ((s, dir) => {
      val subjects = t(s, dir, "customer")
        .where(col("c_custkey") % 97 === 0)
        .select(col("c_custkey").as("subject"))
      graft.operators.Privacy.erasureAudit(
        Seq(
          ("customer", t(s, dir, "customer"), "c_custkey"),
          ("orders", t(s, dir, "orders"), "o_custkey"),
          ("events", t(s, dir, "events"), "user_id")),
        subjects, "subject")
    }),

    // p4 (r14): GENERALIZE-then-suppress release (local recoding) —
    // the utility-preserving k-anonymization: each customer releases
    // at the finest level whose group reaches k=13 (nation → region →
    // suppressed), counting level 1 over the rows level 0 could not
    // place. Pure group counts -> exact row-level oracle.
    "p4_generalize" -> ((s, dir) =>
      graft.operators.Privacy.generalizeSuppress(
        t(s, dir, "customer"), "c_custkey", "c_nationkey",
        t(s, dir, "nation"), "n_nationkey", "n_regionkey",
        Seq("c_mktsegment"), k = 13)),

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

    // p5: the subject set + three per-table count triples unioned
    "p5_erasure_audit" ->
      """WITH s AS (SELECT DISTINCT c_custkey AS k FROM customer
        |           WHERE c_custkey % 97 = 0)
        |SELECT 'customer' AS "table",
        |  (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_total,
        |  (SELECT CAST(count(*) AS BIGINT) FROM customer
        |   WHERE c_custkey IN (SELECT k FROM s)) AS n_refs,
        |  (SELECT CAST(count(*) AS BIGINT) FROM customer
        |   WHERE c_custkey IS NULL
        |      OR c_custkey NOT IN (SELECT k FROM s)) AS n_after
        |UNION ALL
        |SELECT 'orders',
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders),
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders
        |   WHERE o_custkey IN (SELECT k FROM s)),
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders
        |   WHERE o_custkey IS NULL
        |      OR o_custkey NOT IN (SELECT k FROM s))
        |UNION ALL
        |SELECT 'events',
        |  (SELECT CAST(count(*) AS BIGINT) FROM events),
        |  (SELECT CAST(count(*) AS BIGINT) FROM events
        |   WHERE user_id IN (SELECT k FROM s)),
        |  (SELECT CAST(count(*) AS BIGINT) FROM events
        |   WHERE user_id IS NULL
        |      OR user_id NOT IN (SELECT k FROM s))""".stripMargin,

    // level 0 = fine group count, level 1 counted over the level-0
    // leftovers (local recoding), else suppressed — all pure counts
    "p4_generalize" ->
      """WITH g0 AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(count(*) AS BIGINT) AS n0
        |  FROM customer GROUP BY 1, 2),
        |b AS (
        |  SELECT c.c_custkey, c.c_mktsegment, c.c_nationkey, g0.n0,
        |    n.n_regionkey AS coarse
        |  FROM customer c
        |  JOIN g0 USING (c_nationkey, c_mktsegment)
        |  LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey),
        |g1 AS (
        |  SELECT coarse, c_mktsegment, CAST(count(*) AS BIGINT) AS n1
        |  FROM b WHERE n0 < 13 GROUP BY 1, 2)
        |SELECT b.c_custkey, b.c_mktsegment,
        |  CAST(CASE WHEN b.n0 >= 13 THEN 0
        |            WHEN g1.n1 >= 13 THEN 1 ELSE 2 END AS BIGINT)
        |    AS level,
        |  CASE WHEN b.n0 >= 13 THEN CAST(b.c_nationkey AS VARCHAR)
        |       WHEN g1.n1 >= 13 THEN 'c:' || CAST(b.coarse AS VARCHAR)
        |       ELSE 'SUPPRESSED' END AS released
        |FROM b LEFT JOIN g1 ON b.coarse = g1.coarse
        |  AND b.c_mktsegment = g1.c_mktsegment""".stripMargin,

    // the noise replayed in SQL: the k2 rolling hex parse over
    // md5('dp-r14|' || coalesce(segment, '<null>')) — the seed
    // coalesces NULL quasi values to the sentinel exactly as the
    // operator does (r15: the NULL-seed-correlation fix lives IN
    // dpCounts, mirrored here) — the +0.5/16^13 open-interval uniform,
    // the piecewise Laplace inverse CDF with b = 2
    "p3_dp_counts" ->
      """WITH g AS (
        |  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS true_n
        |  FROM customer GROUP BY 1),
        |h AS (
        |  SELECT *,
        |    (CAST(list_reduce(list_transform(string_split(substring(
        |        md5('dp-r14|' ||
        |          coalesce(CAST(c_mktsegment AS VARCHAR), '<null>')),
        |        1, 13), ''),
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

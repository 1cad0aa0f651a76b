package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.TemporalJoins
import graft.queries.Tables.t

/** Temporal-join battery over `events` (engine extensions — SURVEY §2.3
  * lists as-of/interval joins as absent from the reference). Both have
  * full DuckDB oracles (DuckDB 1.0 ships native ASOF JOIN). */
object TemporalQueries {

  /** Right side of the as-of: clicks, deduped to one row per
    * (user_id, ts) with a deterministic winner so both engines resolve
    * ties identically. */
  private def clicks(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("ts"))
      .orderBy(col("event_id").desc)
    t(s, dir, "events").where(col("event_type") === "click")
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"),
        col("value").as("click_value"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // x1: for every purchase, the latest click at-or-before it (per
    // user). Unmatched lefts keep left-join semantics in the operator
    // (spec-covered); the GATE projection coalesces the nulls to
    // sentinels because NaN/NaT cells hash unreliably in a pandas-level
    // compare (CPython hashes NaN by object identity)
    "x1_asof_join" -> ((s, dir) => {
      val purchases = t(s, dir, "events")
        .where(col("event_type") === "purchase")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("value").as("purchase_value"))
      TemporalJoins.asofJoin(purchases, clicks(s, dir),
        keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
        rightCols = Seq("click_id", "click_value"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("purchase_value"),
          coalesce(col("asof_ts"), lit("1970-01-01 00:00:00").cast("timestamp"))
            .as("click_ts"),
          coalesce(col("asof_click_id"), lit(-1L)).as("click_id"),
          coalesce(col("asof_click_value"), lit(-1.0)).as("click_value"))
    }),

    // x2: every view within 30 minutes AFTER a click, same user
    "x2_interval_join" -> ((s, dir) => {
      val clicksRaw = t(s, dir, "events")
        .where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      val views = t(s, dir, "events")
        .where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
      TemporalJoins.intervalJoin(clicksRaw, views,
        keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
        window = "30 minutes")
        .select(col("user_id"), col("click_id"), col("ts").as("click_ts"),
          col("view_id"), col("r_ts").as("view_ts"))
    }),

    // x3 (r12): item co-occurrence with PMI scoring over the events
    // stream — the association statistic behavioral training pairs are
    // mined from ("users who touched A also touched B"). Items come
    // from the event props payload (the `k` attribute, extracted with
    // the same regex in both engines); the per-user pair space is
    // capped by the operator's power-user guard. Deterministic counts
    // + one ln -> exact oracle under round(…,6) (operators/CoOccur).
    "x3_covisit_pmi" -> ((s, dir) => {
      val inc = t(s, dir, "events").select(col("user_id"),
        regexp_extract(col("props"), "(\\d+)", 1).cast("int").as("item"))
      graft.operators.CoOccur
        .itemPmi(inc, "user_id", "item", minUsers = 3,
          maxItemsPerUser = 1000)
        .select(col("item_a"), col("item_b"), col("n_co"),
          round(col("pmi"), 6).as("rpmi"))
    }),

    // x4 (r13): fixed-iteration PageRank over the user↔item incidence
    // graph (x3's incidence, prefixed node ids, both edge directions so
    // the bipartite walk mixes) — the whole-graph recursion sibling of
    // d8's connected components. 3 rounds, d=0.85, per-round 12-decimal
    // rounding in BOTH engines -> exact oracle as 3 unrolled CTEs
    // (operators/PageRank).
    "x4_pagerank" -> ((s, dir) => {
      val inc = t(s, dir, "events").select(col("user_id"),
        regexp_extract(col("props"), "(\\d+)", 1).cast("int").as("item"))
        .where(col("user_id").isNotNull && col("item").isNotNull)
      val fwd = inc.select(
        concat(lit("u:"), col("user_id").cast("string")).as("src"),
        concat(lit("i:"), col("item").cast("string")).as("dst"))
      val edges = fwd.unionByName(
        fwd.select(col("dst").as("src"), col("src").as("dst")))
      graft.operators.PageRank.fixedIter(edges, "src", "dst", iters = 3)
        .select(col("node"), round(col("pr"), 6).as("pr"))
    }),

    // x12 (r14): funnel LATENCY quantiles — the time-to-convert report
    // next to x5's completion counts: rank-exact p50/p90/p99 of the
    // view→purchase duration over completed funnels (the k3 ⌈q·n⌉
    // selection over exact integer epoch-µs — no interpolation, no
    // float anywhere but the quantile label).
    "x12_funnel_latency" -> ((s, dir) =>
      graft.operators.Funnel.latencyQuantiles(
        t(s, dir, "events"), "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), qs = Seq(0.5, 0.9, 0.99))),

    // x11 (r14): fixed-iteration LABEL PROPAGATION over x4's
    // user↔item graph — community detection as the clustering sibling
    // of d8's components and x4's PageRank (operators/LabelProp).
    // Synchronous rounds, most-frequent neighbor label, min-label tie
    // break: integer counts + string mins, no float anywhere -> exact
    // oracle as 3 unrolled argmax CTEs.
    "x11_label_prop" -> ((s, dir) => {
      val inc = t(s, dir, "events").select(col("user_id"),
        regexp_extract(col("props"), "(\\d+)", 1).cast("int").as("item"))
        .where(col("user_id").isNotNull && col("item").isNotNull)
      val fwd = inc.select(
        concat(lit("u:"), col("user_id").cast("string")).as("src"),
        concat(lit("i:"), col("item").cast("string")).as("dst"))
      val edges = fwd.unionByName(
        fwd.select(col("dst").as("src"), col("src").as("dst")))
      graft.operators.LabelProp.fixedIter(edges, "src", "dst", iters = 3)
    }),

    // x16 (r16): recency-DECAYED category frequency — "what is
    // trending" as x10's exactness discipline lifted from per-event
    // weights to per-day count·2^-k terms (every term a count times
    // an exact power of two; the sum replays bit-for-bit under the
    // enforced mantissa bound — no rounding anywhere). event_type
    // filtered non-NULL so the s18 ledger-served face equals this
    // scan-fed one exactly.
    "x16_decayed_freq" -> ((s, dir) =>
      graft.operators.Decay.decayedCounts(
        t(s, dir, "events"), "event_type", "ts", halfLifeDays = 7)),

    // x15 (r16): VOLUME LEVEL-SHIFT — x13's sibling on the count axis
    // (the categorical mix can hold steady while the feed silently
    // halves; TV sees nothing, the volume monitor does). Daily event
    // volumes, 3-before vs 3-from-here integer sums, one division +
    // round(6), flag at 0.25; edges without full windows emit
    // nothing. event_type filtered non-NULL so the s17 ledger-served
    // face (which inherits refreshDriftLedger's NULL drops) equals
    // this scan-fed one exactly.
    "x15_level_shift" -> ((s, dir) =>
      graft.operators.Drift.levelShift(
        t(s, dir, "events").where(col("event_type").isNotNull)
          .select(date_trunc("day", col("ts")).cast("date").as("day")),
        "day", windowN = 3, threshold = 0.25)
      .select(col("period").cast("timestamp").as("day"), col("n"),
        col("before_sum"), col("after_sum"), col("shift_ratio"),
        col("shifted"))),

    // x14 (r16): per-node TRIANGLE COUNTS over the co-visitation
    // item graph (x3's ≥3-shared-users pairs as the edge set — the
    // bipartite user↔item incidence x4/x11 walk has no triangles by
    // construction, so the cohesion question only exists on the
    // one-mode projection). Degree-ordered wedge counting: every
    // triangle tallied once at its lowest-(deg, id) corner, closing
    // edge verified by semi-join — integer-exact, so the oracle is
    // x3's pair CTE + the same orientation spelled in SQL
    // (operators/Triangles; Suri & Vassilvitskii WWW'11 formulation).
    "x14_triangles" -> ((s, dir) => {
      val inc = t(s, dir, "events").select(col("user_id"),
        regexp_extract(col("props"), "(\\d+)", 1).cast("int").as("item"))
      val edges = graft.operators.CoOccur
        .itemPmi(inc, "user_id", "item", minUsers = 3,
          maxItemsPerUser = 1000)
        .select(col("item_a"), col("item_b"))
      graft.operators.Triangles.perNodeCounts(edges, "item_a", "item_b")
    }),

    // x10 (r14): recency-DECAYED engagement — per (user, event_type),
    // each event weighs 2^-(whole half-lives old), half-life 7 days
    // against the corpus-max reference date (operators/Decay). Exact
    // powers of two summed within the mantissa -> the score doubles
    // replay bit-for-bit, no rounding needed (pow(0.5, fractional)
    // would drift cross-engine; this is the drift-free formulation,
    // the x9 ratio-not-zscore discipline applied to decay).
    "x10_decay_engagement" -> ((s, dir) =>
      graft.operators.Decay.halfLifeScores(
        t(s, dir, "events"), "user_id", "event_type", "ts",
        halfLifeDays = 7)),

    // x9 (r14): hourly rate-BURST detection — each event type's hourly
    // count vs the mean of its previous 24 OBSERVED hourly buckets
    // (ROWS frame: calendar gaps don't dilute the baseline), flagged
    // at 2× (operators/Burst). Ratio-to-baseline, deliberately NOT a
    // z-score: stddev's accumulation order float-drifts cross-engine,
    // the integer-sum mean doesn't. First-hour buckets emit NULL
    // baseline and flag 0 in both engines.
    "x9_burst_detect" -> ((s, dir) =>
      graft.operators.Burst.hourlyBursts(
        t(s, dir, "events"), "event_type", "ts",
        trailingHours = 24, threshold = 2.0)),

    // x8 (r14): gap-based SESSIONIZATION — 30-minute inactivity splits
    // a user's (ts, event_id)-ordered events into visits, each rolled
    // up to (start, end, n_events, duration). The gap compares exact
    // integer epoch-MICROseconds (unix_micros ≡ DuckDB epoch_us — the
    // corpus carries µs precision, so second/ms truncation would flip
    // boundary events between engines; operators/Sessions scaladoc).
    "x8_sessionize" -> ((s, dir) =>
      graft.operators.Sessions.sessionize(
        t(s, dir, "events"), "user_id", "ts", "event_id",
        gapMicros = 30L * 60 * 1000000)),

    // x7 (r13): first-order Markov transition matrix over per-user
    // event-type sequences (ts order, event_id tie-break) — next-event
    // statistics, t16's bigram-LM shape applied to behavior
    // (operators/Markov). Integer counts + one division -> exact
    // oracle under round(…,6).
    "x7_markov" -> ((s, dir) =>
      graft.operators.Markov.transitions(
        t(s, dir, "events"), "user_id", "event_type", "ts", "event_id")),

    // x6 (r13): weekly cohort retention — users cohorted by the ISO
    // week of their first event, distinct-counted at each week offset
    // (operators/Retention). Deterministic mins/distincts/date
    // arithmetic -> exact oracle.
    "x6_retention" -> ((s, dir) =>
      graft.operators.Retention.weeklyCohorts(
        t(s, dir, "events"), "user_id", "ts")),

    // x13 (r15): week-over-week distribution DRIFT — the snapshot
    // monitor a continuously-fed pipeline runs at every period
    // boundary: per adjacent week pair, the total-variation distance
    // between event-type distributions (p7's exact-integer TV over
    // the common denominator n_a·n_b; one division + round(6)), with
    // the drift flag at 0.03 (splits the sf0.01 pairs 2/2). Periods output as TIMESTAMP (the
    // date32 hazard).
    "x13_weekly_drift" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(date_trunc("week", col("ts")).cast("date").as("wk"),
          col("event_type"))
      graft.operators.Drift.tvDrift(ev, "wk", "event_type",
          threshold = 0.03)
        .select(col("period_a").cast("timestamp").as("week_a"),
          col("period_b").cast("timestamp").as("week_b"),
          col("n_a"), col("n_b"), col("tv_dist"), col("drifted"))
    }),

    // x5 (r13): ordered-funnel completion — per user, the earliest
    // view → click → purchase chain (greedy-earliest conditional mins,
    // one co-keyed join per transition; operators/Funnel). Stalled
    // steps surface as the epoch sentinel (the x1 discipline).
    "x5_funnel" -> ((s, dir) => {
      val epoch = lit("1970-01-01 00:00:00").cast("timestamp")
      graft.operators.Funnel.earliestCompletion(
        t(s, dir, "events"), "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
        .select(col("user").as("user_id"), col("t1"),
          coalesce(col("t2"), epoch).as("t2"),
          coalesce(col("t3"), epoch).as("t3"),
          col("reached"))
    })
  )

  val oracles: Map[String, String] = Map(
    "x1_asof_join" ->
      """WITH c AS (
        |  SELECT user_id, ts, event_id AS click_id, value AS click_value,
        |         row_number() OVER (PARTITION BY user_id, ts
        |                            ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type = 'click'),
        |cd AS (SELECT user_id, ts, click_id, click_value FROM c WHERE rn = 1),
        |p AS (SELECT event_id, ts, user_id, value AS purchase_value
        |      FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts, p.purchase_value,
        |       coalesce(cd.ts, TIMESTAMP '1970-01-01 00:00:00') AS click_ts,
        |       coalesce(cd.click_id, -1) AS click_id,
        |       coalesce(cd.click_value, -1.0) AS click_value
        |FROM p ASOF LEFT JOIN cd
        |  ON p.user_id = cd.user_id AND p.ts >= cd.ts""".stripMargin,

    "x2_interval_join" ->
      """WITH c AS (SELECT user_id, ts, event_id AS click_id
        |           FROM events WHERE event_type = 'click'),
        |v AS (SELECT user_id, ts, event_id AS view_id
        |      FROM events WHERE event_type = 'view')
        |SELECT c.user_id, c.click_id, c.ts AS click_ts,
        |       v.view_id, v.ts AS view_ts
        |FROM c JOIN v ON c.user_id = v.user_id
        |  AND v.ts >= c.ts AND v.ts <= c.ts + INTERVAL 30 MINUTE""".stripMargin,

    // distinct incidence, the power-user cap as a HAVING, per-user
    // pair self-join, item counts + qualifying-user total, PMI
    "x3_covisit_pmi" ->
      """WITH inc0 AS (
        |  SELECT DISTINCT user_id AS u,
        |    TRY_CAST(regexp_extract(props, '[0-9]+') AS INT) AS i
        |  FROM events WHERE user_id IS NOT NULL AND props IS NOT NULL
        |    AND TRY_CAST(regexp_extract(props, '[0-9]+') AS INT) IS NOT NULL),
        |q AS (SELECT u FROM inc0 GROUP BY u HAVING count(*) <= 1000),
        |inc AS (SELECT inc0.* FROM inc0 JOIN q USING (u)),
        |nn AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS n_users FROM inc),
        |ci AS (SELECT i, CAST(count(*) AS BIGINT) AS c FROM inc GROUP BY i),
        |p AS (
        |  SELECT a.i AS item_a, b.i AS item_b,
        |    CAST(count(*) AS BIGINT) AS n_co
        |  FROM inc a JOIN inc b ON a.u = b.u AND a.i < b.i
        |  GROUP BY a.i, b.i HAVING count(*) >= 3)
        |SELECT p.item_a, p.item_b, p.n_co,
        |  round(ln(CAST(p.n_co AS DOUBLE) * n_users /
        |    (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE))), 6) AS rpmi
        |FROM p JOIN ci ca ON ca.i = p.item_a
        |  JOIN ci cb ON cb.i = p.item_b
        |  CROSS JOIN nn""".stripMargin,

    // x10's decay oracle lifted to per-day count terms: the same
    // shiftleft power-of-two weights, summed per category — exact, so
    // no rounding anywhere
    "x16_decayed_freq" ->
      """WITH b AS (
        |  SELECT event_type AS category, CAST(ts AS DATE) AS d
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
        |g AS (SELECT category, d, CAST(count(*) AS BIGINT) AS cnt
        |      FROM b GROUP BY category, d),
        |mx AS (SELECT max(d) AS ref FROM g),
        |e AS (SELECT category, cnt,
        |        CAST(datediff('day', d, ref) AS INT) AS age
        |      FROM g CROSS JOIN mx),
        |w AS (SELECT category, cnt, age,
        |        CAST(1 AS DOUBLE) /
        |          (1::BIGINT << least(age // 7, 30)) AS w
        |      FROM e)
        |SELECT category, CAST(sum(cnt) AS BIGINT) AS n_total,
        |       min(age) AS last_age_days,
        |       sum(CAST(cnt AS DOUBLE) * w) AS score
        |FROM w GROUP BY category""".stripMargin,

    // the same full-window frames; sums CAST BIGINT (DuckDB window
    // sums are HUGEINT); the flag computed from the ROUNDED ratio
    "x15_level_shift" ->
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day
        |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
        |np AS (SELECT day, CAST(count(*) AS BIGINT) AS n
        |       FROM d GROUP BY day),
        |w AS (SELECT day, n,
        |        CAST(sum(n) OVER (ORDER BY day
        |          ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS BIGINT)
        |          AS before_sum,
        |        count(*) OVER (ORDER BY day
        |          ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS cb,
        |        CAST(sum(n) OVER (ORDER BY day
        |          ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS BIGINT)
        |          AS after_sum,
        |        count(*) OVER (ORDER BY day
        |          ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS ca
        |      FROM np),
        |sel AS (SELECT CAST(day AS TIMESTAMP) AS day, n, before_sum,
        |          after_sum,
        |          round(CAST(abs(after_sum - before_sum) AS DOUBLE) /
        |            CAST(before_sum AS DOUBLE), 6) AS shift_ratio
        |        FROM w WHERE cb = 3 AND ca = 3)
        |SELECT day, n, before_sum, after_sum, shift_ratio,
        |       CAST(CASE WHEN shift_ratio > 0.25 THEN 1 ELSE 0 END
        |         AS BIGINT) AS shifted
        |FROM sel""".stripMargin,

    // x3's pair CTEs re-used as the edge set, then the operator's
    // degree-ordered wedge counting spelled in SQL: orient low→high
    // under (deg, id), pivot wedges at the low corner, order the two
    // high ends by the same tuple, close by EXISTS — integer-exact
    "x14_triangles" ->
      """WITH inc0 AS (
        |  SELECT DISTINCT user_id AS u,
        |    TRY_CAST(regexp_extract(props, '[0-9]+') AS INT) AS i
        |  FROM events WHERE user_id IS NOT NULL AND props IS NOT NULL
        |    AND TRY_CAST(regexp_extract(props, '[0-9]+') AS INT) IS NOT NULL),
        |q AS (SELECT u FROM inc0 GROUP BY u HAVING count(*) <= 1000),
        |inc AS (SELECT inc0.* FROM inc0 JOIN q USING (u)),
        |e AS (SELECT a.i AS a, b.i AS b
        |      FROM inc a JOIN inc b ON a.u = b.u AND a.i < b.i
        |      GROUP BY a.i, b.i HAVING count(*) >= 3),
        |nodes AS (SELECT a AS node FROM e UNION ALL SELECT b FROM e),
        |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d
        |        FROM nodes GROUP BY node),
        |wd AS (SELECT e.a, e.b, da.d AS da, db.d AS db
        |       FROM e JOIN deg da ON da.node = e.a
        |              JOIN deg db ON db.node = e.b),
        |o AS (SELECT
        |  CASE WHEN da < db OR (da = db AND a < b) THEN a ELSE b END AS lo,
        |  CASE WHEN da < db OR (da = db AND a < b) THEN b ELSE a END AS hi,
        |  CASE WHEN da < db OR (da = db AND a < b) THEN db ELSE da END
        |    AS hideg
        |  FROM wd),
        |w AS (SELECT o1.lo AS ta, o1.hi AS tb, o2.hi AS tc
        |      FROM o o1 JOIN o o2 ON o1.lo = o2.lo
        |        AND (o1.hideg < o2.hideg
        |             OR (o1.hideg = o2.hideg AND o1.hi < o2.hi))),
        |tr AS (SELECT ta, tb, tc FROM w
        |       WHERE EXISTS (SELECT 1 FROM e
        |                     WHERE e.a = least(w.tb, w.tc)
        |                       AND e.b = greatest(w.tb, w.tc)))
        |SELECT node, CAST(count(*) AS BIGINT) AS n_tri
        |FROM (SELECT ta AS node FROM tr UNION ALL
        |      SELECT tb FROM tr UNION ALL
        |      SELECT tc FROM tr)
        |GROUP BY node""".stripMargin,

    // the PageRank recursion unrolled: distinct bipartite edges (both
    // directions; prefixes keep the node spaces disjoint), out-degrees,
    // then 3 rounds of contribution-sum + teleport, each rounded to 12
    // decimals exactly as the operator does; all float constants forced
    // through the same IEEE double ops Spark folds
    "x4_pagerank" ->
      """WITH inc AS (
        |  SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS src,
        |    'i:' || CAST(TRY_CAST(regexp_extract(props, '[0-9]+') AS INT)
        |                 AS VARCHAR) AS dst
        |  FROM events
        |  WHERE user_id IS NOT NULL
        |    AND TRY_CAST(regexp_extract(props, '[0-9]+') AS INT) IS NOT NULL),
        |e AS (SELECT src, dst FROM inc
        |      UNION SELECT dst AS src, src AS dst FROM inc),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        |od AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
        |       FROM e GROUP BY src),
        |ed AS (SELECT e.src, e.dst, od.deg FROM e JOIN od USING (src)),
        |pr0 AS (SELECT node, CAST(1 AS DOUBLE) / nn.n AS pr
        |        FROM nodes CROSS JOIN nn),
        |c1 AS (SELECT ed.dst AS node, sum(pr0.pr / ed.deg) AS m
        |       FROM ed JOIN pr0 ON ed.src = pr0.node GROUP BY ed.dst),
        |pr1 AS (SELECT nodes.node,
        |  round((CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n +
        |    CAST(0.85 AS DOUBLE) * coalesce(c1.m, CAST(0 AS DOUBLE)), 12)
        |    AS pr
        |  FROM nodes LEFT JOIN c1 USING (node) CROSS JOIN nn),
        |c2 AS (SELECT ed.dst AS node, sum(pr1.pr / ed.deg) AS m
        |       FROM ed JOIN pr1 ON ed.src = pr1.node GROUP BY ed.dst),
        |pr2 AS (SELECT nodes.node,
        |  round((CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n +
        |    CAST(0.85 AS DOUBLE) * coalesce(c2.m, CAST(0 AS DOUBLE)), 12)
        |    AS pr
        |  FROM nodes LEFT JOIN c2 USING (node) CROSS JOIN nn),
        |c3 AS (SELECT ed.dst AS node, sum(pr2.pr / ed.deg) AS m
        |       FROM ed JOIN pr2 ON ed.src = pr2.node GROUP BY ed.dst),
        |pr3 AS (SELECT nodes.node,
        |  round((CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n +
        |    CAST(0.85 AS DOUBLE) * coalesce(c3.m, CAST(0 AS DOUBLE)), 12)
        |    AS pr
        |  FROM nodes LEFT JOIN c3 USING (node) CROSS JOIN nn)
        |SELECT node, round(pr, 6) AS pr FROM pr3""".stripMargin,

    // x12: the x5 funnel CTEs cut to completed users, integer epoch-µs
    // durations, the k3 ⌈q·n⌉ rank selection (q CAST to DOUBLE — the
    // decimal-literal hazard)
    "x12_funnel_latency" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' AND user_id IS NOT NULL
        |    AND ts IS NOT NULL
        |  GROUP BY user_id),
        |s2 AS (
        |  SELECT s1.user_id, s1.t1, min(e.ts) AS t2
        |  FROM s1 LEFT JOIN events e
        |    ON e.user_id = s1.user_id AND e.event_type = 'click'
        |   AND e.ts >= s1.t1
        |  GROUP BY s1.user_id, s1.t1),
        |s3 AS (
        |  SELECT s2.user_id, s2.t1, s2.t2, min(e.ts) AS t3
        |  FROM s2 LEFT JOIN events e
        |    ON e.user_id = s2.user_id AND e.event_type = 'purchase'
        |   AND e.ts >= s2.t2
        |  GROUP BY s2.user_id, s2.t1, s2.t2),
        |done AS (
        |  SELECT user_id,
        |    CAST(epoch_us(t3) - epoch_us(t1) AS BIGINT) AS dur_us
        |  FROM s3 WHERE t3 IS NOT NULL),
        |r AS (SELECT *, row_number() OVER (ORDER BY dur_us, user_id)
        |        AS rn FROM done),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_completed FROM done),
        |t AS (SELECT n_completed, CAST(q AS DOUBLE) AS q,
        |        CAST(ceil(CAST(q AS DOUBLE) * n_completed) AS INT) AS rq
        |      FROM nn, unnest([0.5, 0.9, 0.99]) AS u(q))
        |SELECT t.q, t.n_completed, r.dur_us
        |FROM t JOIN r ON t.rq = r.rn""".stripMargin,

    // x11: the x4 edge CTEs, then three synchronous vote/argmax rounds
    // — (count desc, label asc) row_number picks the winner, a LEFT
    // JOIN keeps isolated nodes' labels
    "x11_label_prop" ->
      """WITH inc AS (
        |  SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS src,
        |    'i:' || CAST(TRY_CAST(regexp_extract(props, '[0-9]+') AS INT)
        |                 AS VARCHAR) AS dst
        |  FROM events
        |  WHERE user_id IS NOT NULL
        |    AND TRY_CAST(regexp_extract(props, '[0-9]+') AS INT) IS NOT NULL),
        |e AS (SELECT src, dst FROM inc
        |      UNION SELECT dst AS src, src AS dst FROM inc),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |l0 AS (SELECT node, node AS label FROM nodes),
        |v1 AS (SELECT e.dst, l.label, CAST(count(*) AS BIGINT) AS c
        |       FROM e JOIN l0 l ON e.src = l.node GROUP BY e.dst, l.label),
        |w1 AS (SELECT dst AS node, label FROM
        |        (SELECT *, row_number() OVER (PARTITION BY dst
        |           ORDER BY c DESC, label ASC) AS rn FROM v1)
        |       WHERE rn = 1),
        |l1 AS (SELECT l0.node, coalesce(w1.label, l0.label) AS label
        |       FROM l0 LEFT JOIN w1 USING (node)),
        |v2 AS (SELECT e.dst, l.label, CAST(count(*) AS BIGINT) AS c
        |       FROM e JOIN l1 l ON e.src = l.node GROUP BY e.dst, l.label),
        |w2 AS (SELECT dst AS node, label FROM
        |        (SELECT *, row_number() OVER (PARTITION BY dst
        |           ORDER BY c DESC, label ASC) AS rn FROM v2)
        |       WHERE rn = 1),
        |l2 AS (SELECT l1.node, coalesce(w2.label, l1.label) AS label
        |       FROM l1 LEFT JOIN w2 USING (node)),
        |v3 AS (SELECT e.dst, l.label, CAST(count(*) AS BIGINT) AS c
        |       FROM e JOIN l2 l ON e.src = l.node GROUP BY e.dst, l.label),
        |w3 AS (SELECT dst AS node, label FROM
        |        (SELECT *, row_number() OVER (PARTITION BY dst
        |           ORDER BY c DESC, label ASC) AS rn FROM v3)
        |       WHERE rn = 1)
        |SELECT l2.node, coalesce(w3.label, l2.label) AS label
        |FROM l2 LEFT JOIN w3 USING (node)""".stripMargin,

    // x10: day ages against the corpus-max date, exact 2^-k weights
    // (one IEEE division by a shifted BIGINT), order-free exact sum
    "x10_decay_engagement" ->
      """WITH b AS (
        |  SELECT user_id, event_type, CAST(ts AS DATE) AS d
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |    AND ts IS NOT NULL),
        |mx AS (SELECT max(d) AS ref FROM b),
        |e AS (
        |  SELECT user_id, event_type,
        |    CAST(datediff('day', d, ref) AS INT) AS age
        |  FROM b CROSS JOIN mx),
        |w AS (
        |  SELECT user_id, event_type, age,
        |    CAST(1 AS DOUBLE) /
        |      (1::BIGINT << least(age // 7, 30)) AS w
        |  FROM e)
        |SELECT user_id, event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(min(age) AS INT) AS last_age_days,
        |  sum(w) AS score
        |FROM w GROUP BY user_id, event_type""".stripMargin,

    // x9: the hourly bucket aggregation, the trailing ROWS-frame
    // average, ratio + threshold CASE — round 6 at the output only
    "x9_burst_detect" ->
      """WITH h AS (
        |  SELECT event_type AS etype, date_trunc('hour', ts) AS hour,
        |         CAST(count(*) AS BIGINT) AS n_events
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |t AS (
        |  SELECT etype, hour, n_events,
        |    avg(n_events) OVER (PARTITION BY etype ORDER BY hour
        |      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS ta
        |  FROM h)
        |SELECT etype, CAST(hour AS TIMESTAMP) AS hour, n_events,
        |  round(ta, 6) AS trailing_avg,
        |  round(n_events / ta, 6) AS burst_ratio,
        |  CAST(CASE WHEN n_events / ta >= 2.0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS is_burst
        |FROM t""".stripMargin,

    // x8: lag over (ts, event_id) per user in epoch-µs, boundary flag
    // at gap > 1 800 000 000 µs, running-sum session index, rollup
    "x8_sessionize" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id, epoch_us(ts) AS us
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |l AS (
        |  SELECT *, lag(us) OVER (PARTITION BY user_id
        |                          ORDER BY ts, event_id) AS pus
        |  FROM o),
        |b AS (
        |  SELECT *, CASE WHEN pus IS NULL OR us - pus > 1800000000
        |                 THEN 1 ELSE 0 END AS brk
        |  FROM l),
        |sx AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_idx
        |  FROM b)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(max(us) - min(us) AS BIGINT) AS duration_us
        |FROM sx GROUP BY user_id, session_idx""".stripMargin,

    // the operator's window verbatim: lead over (ts, event_id) per
    // user, pair counts, window-normalized conditional probability
    "x7_markov" ->
      """WITH seq AS (
        |  SELECT event_type AS cur,
        |    lead(event_type) OVER (PARTITION BY user_id
        |                           ORDER BY ts, event_id) AS next
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |    AND ts IS NOT NULL),
        |c AS (SELECT cur, next, CAST(count(*) AS BIGINT) AS n_trans
        |      FROM seq WHERE next IS NOT NULL GROUP BY cur, next)
        |SELECT cur, next, n_trans,
        |  round(CAST(n_trans AS DOUBLE) /
        |        sum(n_trans) OVER (PARTITION BY cur), 6) AS p
        |FROM c""".stripMargin,

    // the operator's two aggregations verbatim: per-user first week,
    // distinct (user, week) activity, integer week offsets
    // x13: the p7 HUGEINT TV numerator over adjacent week pairs
    // (row_number ledger), category grid from the global distinct set
    "x13_weekly_drift" ->
      """WITH ev AS (
        |  SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
        |         event_type AS c
        |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
        |np AS (SELECT wk, CAST(count(*) AS BIGINT) AS n
        |       FROM ev GROUP BY wk),
        |rk AS (SELECT wk, n, row_number() OVER (ORDER BY wk) AS r
        |       FROM np),
        |pairs AS (
        |  SELECT a.wk AS wa, a.n AS na, b.wk AS wb, b.n AS nb
        |  FROM rk a JOIN rk b ON b.r = a.r + 1),
        |pc AS (SELECT wk, c, CAST(count(*) AS BIGINT) AS cnt
        |       FROM ev GROUP BY wk, c),
        |cats AS (SELECT DISTINCT c FROM ev),
        |terms AS (
        |  SELECT p.wa, p.wb, p.na, p.nb,
        |    abs(CAST(coalesce(ca.cnt, 0) AS HUGEINT) * p.nb -
        |        CAST(coalesce(cb.cnt, 0) AS HUGEINT) * p.na) AS term
        |  FROM pairs p CROSS JOIN cats k
        |  LEFT JOIN pc ca ON ca.wk = p.wa AND ca.c = k.c
        |  LEFT JOIN pc cb ON cb.wk = p.wb AND cb.c = k.c),
        |agg AS (SELECT wa, wb, na, nb, sum(term) AS num
        |        FROM terms GROUP BY 1, 2, 3, 4)
        |SELECT CAST(wa AS TIMESTAMP) AS week_a,
        |  CAST(wb AS TIMESTAMP) AS week_b, na AS n_a, nb AS n_b,
        |  round(CAST(num AS DOUBLE) /
        |    (2.0 * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6)
        |    AS tv_dist,
        |  CAST(round(CAST(num AS DOUBLE) /
        |    (2.0 * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) > 0.03
        |    AS BIGINT) AS drifted
        |FROM agg""".stripMargin,

    "x6_retention" ->
      """WITH ev AS (
        |  SELECT user_id AS u, CAST(date_trunc('week', ts) AS DATE) AS wk
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |cohorts AS (SELECT u, min(wk) AS cohort_week FROM ev GROUP BY u),
        |active AS (SELECT DISTINCT u, wk FROM ev)
        |SELECT CAST(c.cohort_week AS TIMESTAMP) AS cohort_week,
        |  CAST(datediff('day', c.cohort_week, a.wk) / 7 AS INT)
        |    AS week_offset,
        |  CAST(count(DISTINCT a.u) AS BIGINT) AS n_users
        |FROM active a JOIN cohorts c ON a.u = c.u
        |GROUP BY 1, 2""".stripMargin,

    // the funnel as three conditional mins: step 1 an aggregation,
    // each transition a left join keyed on the user with the
    // at-or-after condition; a NULL previous step nulls the condition
    // and every later step
    "x5_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' AND user_id IS NOT NULL
        |    AND ts IS NOT NULL
        |  GROUP BY user_id),
        |s2 AS (
        |  SELECT s1.user_id, s1.t1, min(e.ts) AS t2
        |  FROM s1 LEFT JOIN events e
        |    ON e.user_id = s1.user_id AND e.event_type = 'click'
        |   AND e.ts >= s1.t1
        |  GROUP BY s1.user_id, s1.t1),
        |s3 AS (
        |  SELECT s2.user_id, s2.t1, s2.t2, min(e.ts) AS t3
        |  FROM s2 LEFT JOIN events e
        |    ON e.user_id = s2.user_id AND e.event_type = 'purchase'
        |   AND e.ts >= s2.t2
        |  GROUP BY s2.user_id, s2.t1, s2.t2)
        |SELECT user_id, CAST(t1 AS TIMESTAMP) AS t1,
        |  CAST(coalesce(t2, TIMESTAMP '1970-01-01 00:00:00')
        |       AS TIMESTAMP) AS t2,
        |  CAST(coalesce(t3, TIMESTAMP '1970-01-01 00:00:00')
        |       AS TIMESTAMP) AS t3,
        |  CAST(CAST(t1 IS NOT NULL AS INT) + CAST(t2 IS NOT NULL AS INT)
        |       + CAST(t3 IS NOT NULL AS INT) AS INT) AS reached
        |FROM s3""".stripMargin
  )
}

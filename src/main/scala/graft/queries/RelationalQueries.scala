package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Tables.t

/** Relational operator battery — one query per SURVEY.md §2 operator family,
  * expressed over the driver testdata, each with a DuckDB oracle
  * (SparkEntry.oracleSql). Money sums go through DECIMAL(18,2)
  * *internally* so they are order-independent, but every emitted column
  * is DOUBLE/INT/STRING: the driver's pandas-level compare turns DuckDB
  * decimals into float64 while Spark parquet decimals surface as Decimal
  * objects, so a decimal output column can never hash-match.
  */
object RelationalQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1/P3: filtered group-by aggregation (TPC-H Q1 shape;
    // SURVEY §2.4 A1, §2.2 P3)
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1999-01-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          count(lit(1)).as("count_order"))
    }),

    // P1/P2/P3: projection + cast + range predicate
    // (reference fuzzy_match_salary.py:67-71)
    "q2_filter_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_quantity").cast("int").between(10, 20) &&
          col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("int").as("qty"))
    }),

    // Equi-join chain + aggregation (broadcast dims; SURVEY §2.3)
    "q3_join_agg" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val customer = broadcast(t(s, dir, "customer"))
      val nation = broadcast(t(s, dir, "nation"))
      orders
        .join(customer, orders("o_custkey") === customer("c_custkey"))
        .join(nation, customer("c_nationkey") === nation("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec(col("o_totalprice"))).cast("double").as("total_spend"),
          count(lit(1)).as("order_count"))
    }),

    // W2/A3: per-group top-k via row_number window
    // (reference utils.py:141-157)
    "q4_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_totalprice").as("totalprice"), col("rn"))
    }),

    // A2: DISTINCT (reference sql/cleaned.sql:44-51)
    "q5_distinct" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_mktsegment"), col("c_nationkey")).distinct()),

    // O1/O2: global sort + offset/limit pagination
    // (reference api/fetch_data.py:57-63)
    "q6_sort_limit_offset" -> ((s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .offset(10).limit(20)
        .select(col("o_orderkey"), col("o_totalprice").as("totalprice"))),

    // U1: UNION ALL with provenance tag (reference utils.py:73)
    "q7_union" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      orders.where(col("o_orderstatus") === "O")
        .select(col("o_orderkey"), lit("open").as("tag"))
        .unionByName(
          orders.where(col("o_orderstatus") === "F")
            .select(col("o_orderkey"), lit("closed").as("tag")))
    }),

    // F4-F7: date parse/format/arith incl. the reference's uppercase
    // dd-MMM-yyyy convention (utils.py:135, sql/cleaned.sql:10)
    "q8_dates" -> ((s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        upper(date_format(col("o_orderdate"), "dd-MMM-yyyy")).as("post_until_style"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
          .as("days_before_2002"),
        date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd")
          .as("plus_30d"))),

    // S5/W1: bronze audit columns (_source_file, _record_id); the dense
    // record id runs DISTRIBUTED (range repartition + partition offsets,
    // Bronze.denseIds) over an explicit unique ordering — same 1..N ids
    // as the reference's ROW_NUMBER() OVER (), without the
    // single-partition window
    "q9_bronze_audit" -> ((s, dir) =>
      graft.sources.Bronze.denseIds(
        t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber")),
        Seq("l_orderkey", "l_linenumber"))
        .withColumn("_source_file", lit("lineitem"))),

    // A1 exact shape: GROUP BY + MAX over many columns incl. a computed
    // date-diff inside MAX (reference sql/cleaned.sql:28-42)
    "q10_groupby_max" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(
          max(col("l_quantity")).as("max_qty"),
          max(col("l_extendedprice")).as("max_price"),
          max(col("l_returnflag")).as("max_flag"),
          max(datediff(lit("2002-01-01").cast("date"), col("l_shipdate").cast("date")))
            .as("max_ship_age_days"))),

    // A4/A5: scalar aggregates (reference streamlit/app.py:56-57,90)
    "q11_scalar_aggs" -> ((s, dir) =>
      t(s, dir, "orders").agg(
        count(lit(1)).as("cnt"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        countDistinct(col("o_custkey")).as("customers"))),

    // ROLLUP hierarchy totals (SURVEY §2.4 notes grouping sets as absent
    // from the reference — engine extension; one hash-agg pass produces
    // all grouping levels). Group columns coalesce to 'ALL' so subtotal
    // rows carry no NULLs through the gate compare.
    "q12_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          count(lit(1)).as("cnt"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("sum_qty"), col("cnt"))),

    // q19 (r14): CUBE — q12's ROLLUP sibling, all 2^n grouping-set
    // combinations in one pass (Spark expands to a single Expand +
    // aggregation, one shuffle — never n separate GROUP BYs unioned).
    // GROUPING() disambiguates a real NULL from a subtotal row, the
    // reason coalesce-to-'ALL' alone is not a faithful CUBE consumer.
    "q19_cube" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          count(lit(1)).as("cnt"),
          grouping(col("l_returnflag")).cast("long").as("g_flag"),
          grouping(col("l_linestatus")).cast("long").as("g_status"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("g_flag"), col("g_status"), col("sum_qty"), col("cnt"))),

    // q20 (r16): DATA-QUALITY EXPECTATIONS — the validation report a
    // lake runs before promoting a batch (the reference's weekly chain
    // promotes bronze→gold unchecked; an audit platform should audit
    // its own inputs). Row checks (null / accepted-set / range) fold
    // in ONE map-side-combined scan per table regardless of check
    // count; key uniqueness rides the same aggregate via
    // count(distinct); the FK check is the one two-table expectation —
    // one join against the parent's distinct keys, unhinted for AQE.
    // NULL semantics are explicit: a check that cannot prove a row
    // valid (predicate NULL) counts it as a violation.
    "q20_dq_checks" -> ((s, dir) => {
      import graft.operators.Expectations.{Check, UniqueKey, fkReport, report}
      val orders = t(s, dir, "orders")
      report(orders, "orders", Seq(
          Check("custkey_not_null", col("o_custkey").isNotNull),
          Check("status_accepted",
            col("o_orderstatus").isin("O", "F", "P")),
          Check("totalprice_positive", col("o_totalprice") > 0.0),
          Check("orderdate_not_null", col("o_orderdate").isNotNull)),
        Seq(UniqueKey("orderkey_unique", col("o_orderkey"))))
      .unionByName(report(t(s, dir, "lineitem"), "lineitem", Seq(
          Check("quantity_in_range", col("l_quantity").between(1.0, 50.0)),
          Check("discount_in_range", col("l_discount").between(0.0, 0.1)),
          Check("shipdate_not_null", col("l_shipdate").isNotNull))))
      .unionByName(fkReport(orders, "o_custkey", t(s, dir, "customer"),
        "c_custkey", "orders", "custkey_fk_customer"))
    }),

    // LEFT SEMI + LEFT ANTI join (existence checks without row
    // multiplication — the join shapes a filter pipeline needs; both are
    // broadcast-able on the probe side at scale)
    "q13_semi_anti" -> ((s, dir) => {
      val customer = t(s, dir, "customer")
      val orderKeys = t(s, dir, "orders").select(col("o_custkey"))
      customer.join(orderKeys, customer("c_custkey") === orderKeys("o_custkey"),
          "left_semi")
        .select(col("c_custkey"), lit("has_orders").as("tag"))
        .unionByName(
          customer.join(orderKeys, customer("c_custkey") === orderKeys("o_custkey"),
              "left_anti")
            .select(col("c_custkey"), lit("no_orders").as("tag")))
    }),

    // PIVOT: long→wide conditional aggregation with a fixed value list
    // (explicit values keep the plan deterministic and skip the
    // values-collection job a dynamic pivot needs)
    "q14_pivot" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(sum(dec(col("o_totalprice"))).cast("double"))
        .na.fill(0.0, Seq("O", "F", "P"))),

    // Exact interpolated percentiles via distributed order statistics
    // (graft.operators.Quantiles: range-repartition + partition-offset
    // rank arithmetic — never buffers a group in memory, unlike the
    // built-in exact `percentile`, and bit-identical to it and to DuckDB
    // quantile_cont; QuantilesSpec proves the builtin equivalence).
    "q15_percentiles" -> ((s, dir) => {
      val q = graft.operators.Quantiles.exactQuantiles(
        t(s, dir, "lineitem"), Seq("l_returnflag"), "l_extendedprice",
        Seq(0.25, 0.5, 0.75))
      q.groupBy(col("l_returnflag"))
        .agg(min(when(col("p") === 0.25, col("q"))).as("p25"),
          min(when(col("p") === 0.5, col("q"))).as("p50"),
          min(when(col("p") === 0.75, col("q"))).as("p75"),
          min(col("n")).as("cnt"))
    }),

    // Window frames: lag/lead + rows-frame running aggregate per key
    // (SURVEY §2.5 notes frames as absent from the reference — engine
    // extension; one shuffle on the partition key, frames evaluated in
    // the sorted window pass)
    "q16_window_frames" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val w3 = w.rowsBetween(-2, Window.currentRow)
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        coalesce(lag(col("o_orderkey"), 1).over(w), lit(-1L)).as("prev_order"),
        coalesce(lead(col("o_orderkey"), 1).over(w), lit(-1L)).as("next_order"),
        sum(dec(col("o_totalprice"))).over(w3).cast("double").as("trailing3_spend"),
        datediff(col("o_orderdate").cast("date"),
          coalesce(lag(col("o_orderdate"), 1).over(w), col("o_orderdate"))
            .cast("date")).as("days_since_prev"))
    }),

    // FULL OUTER join (unmatched rows from BOTH sides survive; nulls
    // coalesced to sentinels for the gate's hash compare). supplier and
    // customer nation-keys only partially overlap per segment, so both
    // null fringes are exercised.
    "q17_outer_join" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .where(col("c_mktsegment") === "BUILDING")
        .groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("n_cust"))
      val supp = t(s, dir, "supplier")
        .where(col("s_acctbal") > 5000.0)
        .groupBy(col("s_nationkey").as("nk")).agg(count(lit(1)).as("n_supp"))
      cust.join(supp, Seq("nk"), "full_outer")
        .select(col("nk"),
          coalesce(col("n_cust"), lit(-1L)).as("n_cust"),
          coalesce(col("n_supp"), lit(-1L)).as("n_supp"))
    }),

    // INTERSECT / EXCEPT (SURVEY §2.7 notes both as absent from the
    // reference — engine extension; hash-distinct set semantics)
    "q18_setops" -> ((s, dir) => {
      val building = t(s, dir, "customer")
        .where(col("c_mktsegment") === "BUILDING").select(col("c_nationkey"))
      val machinery = t(s, dir, "customer")
        .where(col("c_mktsegment") === "MACHINERY").select(col("c_nationkey"))
      building.intersect(machinery)
        .select(col("c_nationkey"), lit("both").as("tag"))
        .unionByName(building.except(machinery)
          .select(col("c_nationkey"), lit("building_only").as("tag")))
    }),

    // KMV distinct sketch (r13): the cross-engine-replayable
    // cardinality estimate — per event type, the k=128 smallest md5
    // hashes of the user set, estimate (k−1)/U₍ₖ₎, checked against the
    // exact countDistinct it replaces at scale (operators/Sketches;
    // the sketch shuffle is O(groups·k) partial buffers, never the
    // distinct keys). Deterministic hashes + IEEE doubles -> exact
    // oracle: DuckDB rebuilds the identical sketch from the same md5s.
    "k1_kmv_distinct" -> ((s, dir) => {
      val ev = t(s, dir, "events").where(col("event_type").isNotNull)
      val sk = graft.operators.Sketches.kmvDistinct(
        ev, Seq("event_type"), "user_id", k = 128)
      val exact = ev.where(col("user_id").isNotNull)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_d"))
      sk.join(exact, "event_type")
        .select(col("event_type"), col("exact_d"), col("n_kept"),
          col("kth_hash"),
          round(col("est_distinct"), 6).as("est_distinct"),
          round(abs(col("est_distinct") - col("exact_d")) /
            col("exact_d"), 6).as("rel_err"))
    }),

    // k8 (r16): KMV SET ALGEBRA — union/intersection/Jaccard estimates
    // from TWO sketches without ever co-scanning the feeds (Beyer et
    // al. SIGMOD'07; the theta-sketch question, completing the
    // portable-sketch family's eighth answer). Sides: users who
    // touched an even item vs users who touched a multiple-of-3 item
    // (overlapping by construction). The merged k-minima ARE a valid
    // union sketch; ρ over the merged minima estimates Jaccard;
    // ρ·est_union the intersection — all exact below k. Exact counts
    // ride along s9-style so the report shows the error it carries.
    "k8_kmv_setops" -> ((s, dir) => {
      val inc = t(s, dir, "events").select(col("user_id"),
        regexp_extract(col("props"), "(\\d+)", 1).cast("int").as("item"))
        .where(col("user_id").isNotNull && col("item").isNotNull)
      def sketch(side: org.apache.spark.sql.DataFrame, tag: String) =
        graft.operators.Sketches.kmvDistinct(
            side.withColumn("g", lit(1)), Seq("g"), "user_id", k = 128)
          .select(col("kmins").as(s"kmins_$tag"),
            col("n_kept").as(s"n_kept_$tag"))
      val a = sketch(inc.where(col("item") % 2 === 0), "a")
      val b = sketch(inc.where(col("item") % 3 === 0), "b")
      val flags = inc.groupBy("user_id").agg(
        max(when(col("item") % 2 === 0, 1).otherwise(0)).as("in_a"),
        max(when(col("item") % 3 === 0, 1).otherwise(0)).as("in_b"))
      val exact = flags.agg(
        sum(when(col("in_a") === 1 || col("in_b") === 1, 1L)
          .otherwise(0L)).as("exact_union"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L)
          .otherwise(0L)).as("exact_intersect"))
      val est = graft.operators.Sketches.kmvSetEstimates(
        col("kmins_a"), col("kmins_b"), k = 128)
      a.crossJoin(b).crossJoin(exact)
        .select(col("n_kept_a"), col("n_kept_b"),
          round(est.getField("est_union"), 6).as("est_union"),
          round(est.getField("est_intersect"), 6).as("est_intersect"),
          round(est.getField("jaccard"), 6).as("est_jaccard"),
          col("exact_union"), col("exact_intersect"))
    }),

    // Count-Min frequency sketch (r13): k1's frequency sibling — item
    // occurrence estimates from a 4×32 md5-hashed counter table
    // (deliberately narrow so collisions and the overcount-only
    // contract are visible in the output), checked against the exact
    // per-item counts. Deterministic integers -> exact oracle: DuckDB
    // rebuilds the identical counter table from the same md5s.
    "k2_cms_freq" -> ((s, dir) => {
      val items = t(s, dir, "events")
        .select(regexp_extract(col("props"), "(\\d+)", 1).cast("int")
          .as("item"))
        .where(col("item").isNotNull)
      val sk = graft.operators.Sketches
      val est = sk.cmsEstimate(sk.cmsBuild(items, "item", 32, 4),
        items, "item", 32, 4)
      val exact = items.groupBy("item")
        .agg(count(lit(1)).cast("long").as("exact_n"))
      est.join(exact, est("key") === exact("item"))
        .select(col("item"), col("exact_n"), col("est_n"),
          (col("est_n") - col("exact_n")).as("overcount"))
    }),

    // Hash-sample quantile sketch (r13): the third portable sketch —
    // k1 distincts, k2 frequencies, k3 QUANTILES. The deterministic
    // md5 gate draws the identical 20% sample in any engine; each
    // quantile is then rank-exact over the sample (value at ⌈q·n⌉,
    // hash tie-break) — pure row selection, so the whole estimate
    // replays bit-for-bit (operators/Sketches.sampleQuantiles).
    "k3_quantile_sample" -> ((s, dir) =>
      graft.operators.Sketches.sampleQuantiles(
        t(s, dir, "lineitem"),
        concat_ws("-", col("l_orderkey"), col("l_linenumber")),
        "l_extendedprice", Seq("l_returnflag"), "quantile-r13",
        rate = 0.2, qs = Seq(0.25, 0.5, 0.75, 0.95))),

    // Bloom membership sketch (r14): the fourth portable sketch — k1
    // distincts, k2 frequencies, k3 quantiles, k4 MEMBERSHIP. The bit
    // set is md5-derived (any engine rebuilds it identically) and
    // stored as distinct pos ROWS, mergeable by UNION+DISTINCT (the
    // KMV duplicate-insensitive algebra). Built over the custkeys that
    // HAVE orders, probed with every customer: present keys must all
    // answer 1 (no false negatives — visible in the output as
    // present=1 ⇒ might_contain=1), absent keys show the measured
    // false-positive rate at 5 hashes × 8192 bits.
    "k4_bloom_filter" -> ((s, dir) =>
      bloomProbeReport(s, dir,
        graft.operators.Sketches.bloomBuild(
          t(s, dir, "orders").select(col("o_custkey").as("ck"))
            .where(col("ck").isNotNull),
          "ck", numHashes = 5, mBits = 8192))),

    // HyperLogLog distinct sketch (r14): the fifth portable sketch —
    // k1's KMV answers the same question with k·12-char state; HLL
    // answers it in 1024 small registers (~3.3% error) that merge by
    // per-bucket MAX across engines/shards/days. Registers are
    // md5-derived, rho comes from the exact binary-string bitlength
    // (never floor(log2)), and the indicator sum is an exact BIGINT,
    // so raw estimates replay bit-for-bit; the linear-counting branch
    // is the one ln() and rides round(…,6). Same input as k1 so the
    // two sketches' errors are directly comparable in the gate output.
    "k5_hll_distinct" -> ((s, dir) =>
      hllReport(s, dir,
        graft.operators.Sketches.hllBuild(
          t(s, dir, "events").where(col("event_type").isNotNull),
          Seq("event_type"), "user_id"))),

    // Heavy hitters (r15): the SEVENTH portable-sketch question —
    // frequent items, answered as CMS candidates (est >= ceil(φ·N),
    // N summed from the sketch's own row 0) verified by ONE exact
    // semi-join recount. Both contract halves show in the output:
    // every truly-φ-heavy item appears (CMS never undercounts — no
    // false negatives), and collision-inflated candidates carry
    // heavy = 0. k2's item stream at width 64 so some overcounts
    // survive the min; deterministic integers -> exact oracle.
    "k7_heavy_hitters" -> ((s, dir) => {
      val items = t(s, dir, "events")
        .select(regexp_extract(col("props"), "(\\d+)", 1).cast("int")
          .as("item"))
        .where(col("item").isNotNull)
      graft.operators.Sketches.heavyHitters(items, "item",
        phi = 0.0115, width = 64, depth = 4)
    }),

    // Portable MinHash fidelity (r14): the sixth portable sketch —
    // set-SIMILARITY (k1/k5 cardinality, k2 frequency, k3 quantiles,
    // k4 membership). Signatures are per-seed minima of 12-hex md5s,
    // so any engine rebuilds them identically; the gate scores the
    // estimate against d2's exact-Jaccard pairs (both sides exact
    // int-ratio doubles — no rounding anywhere but the |err| display).
    "k6_minhash_fidelity" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sk = graft.operators.Sketches
      // the pair set is consumed three times (both member projections
      // + the final join) — checkpoint the output-sized frame once
      // instead of re-running the pair join per consumer
      val pairs = graft.operators.Dedup.jaccardPairs(
          docs, "doc_id", "text", n = 2, theta = 0.5)
        .localCheckpoint(true)
      // sign only the PAIR MEMBERS (output-sized): the report needs
      // |set|·16 md5s per doc it mentions, not per doc in the corpus —
      // a stored k6 sketch would precompute all docs once, but a
      // fidelity report over detected pairs should cost like its output
      val members = pairs.select(col("doc_a").as("doc_id"))
        .unionByName(pairs.select(col("doc_b").as("doc_id"))).distinct()
      val sigs = docs.join(members, "doc_id")
        .select(col("doc_id"),
          sk.minhashPortable(
            graft.functions.word_shingles(col("text"), 2), 16).as("sig"))
      pairs
        .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")),
          "doc_a")
        .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")),
          "doc_b")
        .withColumn("n_agree",
          sk.minhashAgreement(col("sig_a"), col("sig_b")).cast("long"))
        .select(col("doc_a"), col("doc_b"), col("n_agree"),
          (col("n_agree").cast("double") / 16).as("est_jaccard"),
          col("jaccard"),
          round(abs(col("n_agree").cast("double") / 16 - col("jaccard")), 6)
            .as("abs_err"))
    })
  )

  /** The shared k5/s12 register report: the estimate + the exact
    * countDistinct it stands in for, from a REGISTER TABLE — one
    * definition so the batch (k5) and streamed (s12) gates can never
    * drift apart; only the register SOURCE differs between them. */
  private[queries] def hllReport(s: SparkSession, dir: String,
      regs: DataFrame): DataFrame = {
    val est = graft.operators.Sketches
      .hllEstimate(regs, Seq("event_type"))
    val exact = t(s, dir, "events")
      .where(col("event_type").isNotNull && col("user_id").isNotNull)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_d"))
    est.join(exact, "event_type")
      .select(col("event_type"), col("exact_d"), col("n_buckets"),
        col("n_zero"), col("t_fingerprint"),
        round(col("est_raw"), 6).as("est_raw"),
        round(col("est_hll"), 6).as("est_hll"),
        round(abs(col("est_hll") - col("exact_d")) / col("exact_d"), 6)
          .as("rel_err"))
  }

  /** The shared k4/s10 probe report: membership answers for EVERY
    * customer plus a shifted guaranteed-absent twin per customer —
    * the superset makes both contract halves visible in the output
    * (present rows must all answer 1; absent rows measure the fp rate)
    * — labelled with the ground truth. ONE definition so the batch
    * (k4) and streamed (s10) gates can never drift apart; only the
    * bit-set SOURCE differs between them. */
  private[queries] def bloomProbeReport(s: SparkSession, dir: String,
      bloom: DataFrame): DataFrame = {
    val present = t(s, dir, "orders")
      .select(col("o_custkey").as("ck")).where(col("ck").isNotNull)
    val cust = t(s, dir, "customer").select(col("c_custkey").as("ck"))
    val probes = cust.unionByName(
      cust.select((col("ck") + 1000000L).as("ck")))
    val truth = present.distinct()
      .withColumnRenamed("ck", "key").withColumn("present", lit(1L))
    graft.operators.Sketches
      .bloomMightContain(bloom, probes, "ck", numHashes = 5,
        mBits = 8192)
      .join(truth, Seq("key"), "left")
      .select(col("key"), col("n_pos"), col("n_hit"),
        col("might_contain"),
        coalesce(col("present"), lit(0L)).as("present"),
        (col("might_contain") === 1L &&
          coalesce(col("present"), lit(0L)) === 0L)
          .cast("long").as("false_positive"))
  }

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1999-01-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    // trunc() matches Spark's toward-zero double→int cast; DuckDB's bare
    // CAST rounds half-to-even and would diverge on fractional quantities
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber, CAST(trunc(l_quantity) AS INT) AS qty
        |FROM lineitem
        |WHERE CAST(trunc(l_quantity) AS INT) BETWEEN 10 AND 20 AND l_returnflag = 'R'""".stripMargin,

    "q3_join_agg" ->
      """SELECT n_name,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
        |       count(*) AS order_count
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,

    "q4_window_topk" ->
      """SELECT o_custkey, o_orderkey,
        |       o_totalprice AS totalprice, rn
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |WHERE rn <= 3""".stripMargin,

    "q5_distinct" ->
      "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",

    "q6_sort_limit_offset" ->
      """SELECT o_orderkey, o_totalprice AS totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 20 OFFSET 10""".stripMargin,

    "q7_union" ->
      """SELECT o_orderkey, 'open' AS tag FROM orders WHERE o_orderstatus = 'O'
        |UNION ALL
        |SELECT o_orderkey, 'closed' AS tag FROM orders WHERE o_orderstatus = 'F'""".stripMargin,

    "q8_dates" ->
      """SELECT o_orderkey,
        |       upper(strftime(o_orderdate, '%d-%b-%Y')) AS post_until_style,
        |       datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_before_2002,
        |       strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus_30d
        |FROM orders""".stripMargin,

    "q9_bronze_audit" ->
      """SELECT l_orderkey, l_linenumber, 'lineitem' AS _source_file,
        |       row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS _record_id
        |FROM lineitem""".stripMargin,

    "q10_groupby_max" ->
      """SELECT l_orderkey,
        |       max(l_quantity) AS max_qty,
        |       max(l_extendedprice) AS max_price,
        |       max(l_returnflag) AS max_flag,
        |       max(datediff('day', CAST(l_shipdate AS DATE), DATE '2002-01-01')) AS max_ship_age_days
        |FROM lineitem
        |GROUP BY l_orderkey""".stripMargin,

    "q11_scalar_aggs" ->
      """SELECT count(*) AS cnt,
        |       min(o_totalprice) AS min_price,
        |       max(o_totalprice) AS max_price,
        |       count(DISTINCT o_custkey) AS customers
        |FROM orders""".stripMargin,

    "q12_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |       coalesce(l_linestatus, 'ALL') AS status,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       count(*) AS cnt
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q19_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |       coalesce(l_linestatus, 'ALL') AS status,
        |       CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
        |       CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       count(*) AS cnt
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    // one SELECT per check, mirroring the operator's three-valued NULL
    // rule (NOT coalesce(valid, FALSE) = violation); FILTER keeps the
    // counts BIGINT on both engines
    "q20_dq_checks" ->
      """SELECT 'orders' AS table_name, 'custkey_not_null' AS check_name,
        |       count(*) AS n_rows,
        |       CAST(count(*) FILTER (WHERE NOT coalesce(
        |         o_custkey IS NOT NULL, FALSE)) AS BIGINT) AS violations,
        |       count(*) FILTER (WHERE NOT coalesce(
        |         o_custkey IS NOT NULL, FALSE)) = 0 AS pass
        |FROM orders
        |UNION ALL
        |SELECT 'orders', 'status_accepted', count(*),
        |       CAST(count(*) FILTER (WHERE NOT coalesce(
        |         o_orderstatus IN ('O','F','P'), FALSE)) AS BIGINT),
        |       count(*) FILTER (WHERE NOT coalesce(
        |         o_orderstatus IN ('O','F','P'), FALSE)) = 0
        |FROM orders
        |UNION ALL
        |SELECT 'orders', 'totalprice_positive', count(*),
        |       CAST(count(*) FILTER (WHERE NOT coalesce(
        |         o_totalprice > 0.0, FALSE)) AS BIGINT),
        |       count(*) FILTER (WHERE NOT coalesce(
        |         o_totalprice > 0.0, FALSE)) = 0
        |FROM orders
        |UNION ALL
        |SELECT 'orders', 'orderdate_not_null', count(*),
        |       CAST(count(*) FILTER (WHERE NOT coalesce(
        |         o_orderdate IS NOT NULL, FALSE)) AS BIGINT),
        |       count(*) FILTER (WHERE NOT coalesce(
        |         o_orderdate IS NOT NULL, FALSE)) = 0
        |FROM orders
        |UNION ALL
        |SELECT 'orders', 'orderkey_unique', count(*),
        |       CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT),
        |       count(o_orderkey) - count(DISTINCT o_orderkey) = 0
        |FROM orders
        |UNION ALL
        |SELECT 'lineitem', 'quantity_in_range', count(*),
        |       CAST(count(*) FILTER (WHERE NOT coalesce(
        |         l_quantity BETWEEN 1.0 AND 50.0, FALSE)) AS BIGINT),
        |       count(*) FILTER (WHERE NOT coalesce(
        |         l_quantity BETWEEN 1.0 AND 50.0, FALSE)) = 0
        |FROM lineitem
        |UNION ALL
        |SELECT 'lineitem', 'discount_in_range', count(*),
        |       CAST(count(*) FILTER (WHERE NOT coalesce(
        |         l_discount BETWEEN 0.0 AND 0.1, FALSE)) AS BIGINT),
        |       count(*) FILTER (WHERE NOT coalesce(
        |         l_discount BETWEEN 0.0 AND 0.1, FALSE)) = 0
        |FROM lineitem
        |UNION ALL
        |SELECT 'lineitem', 'shipdate_not_null', count(*),
        |       CAST(count(*) FILTER (WHERE NOT coalesce(
        |         l_shipdate IS NOT NULL, FALSE)) AS BIGINT),
        |       count(*) FILTER (WHERE NOT coalesce(
        |         l_shipdate IS NOT NULL, FALSE)) = 0
        |FROM lineitem
        |UNION ALL
        |SELECT 'orders', 'custkey_fk_customer', count(*),
        |       CAST(count(*) FILTER (WHERE o_custkey IS NOT NULL
        |         AND NOT EXISTS (SELECT 1 FROM customer
        |                         WHERE c_custkey = o_custkey)) AS BIGINT),
        |       count(*) FILTER (WHERE o_custkey IS NOT NULL
        |         AND NOT EXISTS (SELECT 1 FROM customer
        |                         WHERE c_custkey = o_custkey)) = 0
        |FROM orders""".stripMargin,

    "q13_semi_anti" ->
      """SELECT c_custkey, 'has_orders' AS tag FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT c_custkey, 'no_orders' AS tag FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q14_pivot" ->
      """SELECT o_orderpriority,
        |  coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (o_orderstatus = 'O') AS DOUBLE), 0.0) AS "O",
        |  coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (o_orderstatus = 'F') AS DOUBLE), 0.0) AS "F",
        |  coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (o_orderstatus = 'P') AS DOUBLE), 0.0) AS "P"
        |FROM orders
        |GROUP BY o_orderpriority""".stripMargin,

    // count(l_extendedprice), not count(*): the operator's n counts
    // non-null values, and a key whose values were all NULL produces no
    // row at all (documented in Quantiles) — keep the oracle on the same
    // semantics so a null-bearing corpus can't silently diverge
    "q15_percentiles" ->
      """SELECT l_returnflag,
        |       quantile_cont(l_extendedprice, 0.25) AS p25,
        |       quantile_cont(l_extendedprice, 0.5) AS p50,
        |       quantile_cont(l_extendedprice, 0.75) AS p75,
        |       count(l_extendedprice) AS cnt
        |FROM lineitem
        |GROUP BY l_returnflag""".stripMargin,

    "q16_window_frames" ->
      """SELECT o_custkey, o_orderkey,
        |  coalesce(lag(o_orderkey, 1) OVER w, -1) AS prev_order,
        |  coalesce(lead(o_orderkey, 1) OVER w, -1) AS next_order,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS trailing3_spend,
        |  datediff('day',
        |    CAST(coalesce(lag(o_orderdate, 1) OVER w, o_orderdate) AS DATE),
        |    CAST(o_orderdate AS DATE)) AS days_since_prev
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate ASC, o_orderkey ASC)""".stripMargin,

    "q17_outer_join" ->
      """WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust
        |           FROM customer WHERE c_mktsegment = 'BUILDING' GROUP BY 1),
        |s AS (SELECT s_nationkey AS nk, count(*) AS n_supp
        |      FROM supplier WHERE s_acctbal > 5000.0 GROUP BY 1)
        |SELECT coalesce(c.nk, s.nk) AS nk,
        |       coalesce(n_cust, -1) AS n_cust,
        |       coalesce(n_supp, -1) AS n_supp
        |FROM c FULL OUTER JOIN s ON c.nk = s.nk""".stripMargin,

    "q18_setops" ->
      """SELECT c_nationkey, 'both' AS tag FROM (
        |  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  INTERSECT
        |  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY')
        |UNION ALL
        |SELECT c_nationkey, 'building_only' AS tag FROM (
        |  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  EXCEPT
        |  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY')""".stripMargin,

    // the sketch REBUILT in SQL: distinct md5-prefix hashes, the 128
    // smallest per group via row_number, the k-th value parsed from hex
    // by the rolling list_reduce, the same (k−1)·16¹²/v estimate
    // per-side k-minima rebuilt the k1 way, merged top-k of the hash
    // union, common counted against BOTH stored sides, the same
    // double-division order as the operator
    "k8_kmv_setops" ->
      """WITH inc AS (
        |  SELECT DISTINCT user_id AS u,
        |    TRY_CAST(regexp_extract(props, '[0-9]+') AS INT) AS i
        |  FROM events WHERE user_id IS NOT NULL
        |    AND TRY_CAST(regexp_extract(props, '[0-9]+') AS INT) IS NOT NULL),
        |ha AS (SELECT DISTINCT substring(md5(CAST(u AS VARCHAR)), 1, 12)
        |         AS hk FROM inc WHERE i % 2 = 0),
        |hb AS (SELECT DISTINCT substring(md5(CAST(u AS VARCHAR)), 1, 12)
        |         AS hk FROM inc WHERE i % 3 = 0),
        |sa AS (SELECT hk FROM (SELECT hk,
        |         row_number() OVER (ORDER BY hk) AS rn FROM ha)
        |       WHERE rn <= 128),
        |sb AS (SELECT hk FROM (SELECT hk,
        |         row_number() OVER (ORDER BY hk) AS rn FROM hb)
        |       WHERE rn <= 128),
        |mg AS (SELECT hk, rn FROM (SELECT hk,
        |         row_number() OVER (ORDER BY hk) AS rn
        |       FROM (SELECT hk FROM sa UNION SELECT hk FROM sb))
        |       WHERE rn <= 128),
        |ms AS (SELECT CAST(count(*) AS BIGINT) AS msize FROM mg),
        |kthv AS (SELECT coalesce(
        |    (SELECT hk FROM mg ORDER BY rn DESC LIMIT 1), '0') AS kth),
        |cm AS (SELECT CAST(count(*) AS BIGINT) AS common FROM mg
        |       WHERE hk IN (SELECT hk FROM sa)
        |         AND hk IN (SELECT hk FROM sb)),
        |est AS (SELECT
        |  CASE WHEN ms.msize < 128 THEN CAST(ms.msize AS DOUBLE)
        |       ELSE CAST(127 AS DOUBLE) * CAST(281474976710656 AS DOUBLE)
        |         / CAST(list_reduce(list_transform(string_split(kth, ''),
        |             c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
        |             (a, c) -> a * 16 + c) AS DOUBLE) END AS est_union,
        |  CASE WHEN ms.msize = 0 THEN CAST(0 AS DOUBLE)
        |       ELSE CAST(cm.common AS DOUBLE) / CAST(ms.msize AS DOUBLE)
        |       END AS rho
        |  FROM ms, kthv, cm),
        |na AS (SELECT CAST(count(*) AS INT) AS n_kept_a FROM sa),
        |nb AS (SELECT CAST(count(*) AS INT) AS n_kept_b FROM sb),
        |fl AS (SELECT u,
        |         max(CASE WHEN i % 2 = 0 THEN 1 ELSE 0 END) AS in_a,
        |         max(CASE WHEN i % 3 = 0 THEN 1 ELSE 0 END) AS in_b
        |       FROM inc GROUP BY u),
        |ex AS (SELECT
        |    CAST(sum(CASE WHEN in_a = 1 OR in_b = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS exact_union,
        |    CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS exact_intersect
        |  FROM fl)
        |SELECT na.n_kept_a, nb.n_kept_b,
        |  round(est_union, 6) AS est_union,
        |  round(rho * est_union, 6) AS est_intersect,
        |  round(rho, 6) AS est_jaccard,
        |  exact_union, exact_intersect
        |FROM na, nb, est, ex""".stripMargin,

    "k1_kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT event_type,
        |    substring(md5(CAST(user_id AS VARCHAR)), 1, 12) AS hk
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |r AS (
        |  SELECT event_type, hk,
        |    row_number() OVER (PARTITION BY event_type ORDER BY hk) AS rn,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS m
        |  FROM h),
        |kth AS (
        |  SELECT event_type, CAST(least(m, 128) AS INT) AS n_kept,
        |         hk AS kth_hash, m
        |  FROM r WHERE rn = least(m, 128)),
        |est AS (
        |  SELECT event_type, n_kept, kth_hash,
        |    CASE WHEN m < 128 THEN CAST(m AS DOUBLE)
        |         ELSE CAST(127 AS DOUBLE) * CAST(281474976710656 AS DOUBLE)
        |           / CAST(list_reduce(
        |           list_transform(string_split(kth_hash, ''),
        |             c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
        |           (a, c) -> a * 16 + c) AS DOUBLE) END AS est0
        |  FROM kth),
        |ex AS (
        |  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_d
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY event_type)
        |SELECT e.event_type, ex.exact_d, e.n_kept, e.kth_hash,
        |  round(est0, 6) AS est_distinct,
        |  round(abs(est0 - exact_d) / exact_d, 6) AS rel_err
        |FROM est e JOIN ex USING (event_type)""".stripMargin,

    // the counter table rebuilt in SQL: every occurrence × 4 row
    // hashes (md5 '<row>:<item>' 12-hex prefix mod 32 via the rolling
    // hex parse), counts per (row, bucket), estimate = min over the
    // item's 4 buckets
    "k2_cms_freq" ->
      """WITH it AS (
        |  SELECT TRY_CAST(regexp_extract(props, '[0-9]+') AS INT) AS item
        |  FROM events
        |  WHERE props IS NOT NULL
        |    AND TRY_CAST(regexp_extract(props, '[0-9]+') AS INT)
        |        IS NOT NULL),
        |rws AS (SELECT unnest(range(0, 4)) AS r),
        |h AS (
        |  SELECT it.item, rws.r,
        |    list_reduce(list_transform(string_split(substring(
        |      md5(CAST(rws.r AS VARCHAR) || ':' ||
        |          CAST(it.item AS VARCHAR)), 1, 12), ''),
        |      c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
        |      (a, c) -> a * 16 + c) % 32 AS bucket
        |  FROM it CROSS JOIN rws),
        |sk AS (SELECT r, bucket, CAST(count(*) AS BIGINT) AS cnt
        |       FROM h GROUP BY r, bucket),
        |qh AS (SELECT DISTINCT item, r, bucket FROM h),
        |est AS (
        |  SELECT qh.item, min(coalesce(sk.cnt, 0)) AS est_n
        |  FROM qh LEFT JOIN sk ON qh.r = sk.r AND qh.bucket = sk.bucket
        |  GROUP BY qh.item),
        |ex AS (SELECT item, CAST(count(*) AS BIGINT) AS exact_n
        |       FROM it GROUP BY item)
        |SELECT ex.item, ex.exact_n, est.est_n,
        |  est.est_n - ex.exact_n AS overcount
        |FROM est JOIN ex USING (item)""".stripMargin,

    // k7: the k2 counter CTEs at width 64, N as row 0's counter sum,
    // threshold ceil(φ·N), candidates est >= thr, one exact recount —
    // heavy = exact >= thr shows the verified-out false candidates.
    // The threshold multiplies through CAST(0.0115 AS DOUBLE): DuckDB
    // would otherwise take 0.0115 as exact DECIMAL, and when φ·N lands
    // on an integer the binary-double product Spark computes
    // (math.ceil(phi * n)) can round one above it — both engines must
    // share the rounding regime for the heavy set to replay
    "k7_heavy_hitters" ->
      """WITH it AS (
        |  SELECT TRY_CAST(regexp_extract(props, '[0-9]+') AS INT) AS item
        |  FROM events
        |  WHERE props IS NOT NULL
        |    AND TRY_CAST(regexp_extract(props, '[0-9]+') AS INT)
        |        IS NOT NULL),
        |rws AS (SELECT unnest(range(0, 4)) AS r),
        |h AS (
        |  SELECT it.item, rws.r,
        |    list_reduce(list_transform(string_split(substring(
        |      md5(CAST(rws.r AS VARCHAR) || ':' ||
        |          CAST(it.item AS VARCHAR)), 1, 12), ''),
        |      c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
        |      (a, c) -> a * 16 + c) % 64 AS bucket
        |  FROM it CROSS JOIN rws),
        |sk AS (SELECT r, bucket, CAST(count(*) AS BIGINT) AS cnt
        |       FROM h GROUP BY r, bucket),
        |tot AS (SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n,
        |          CAST(ceil(CAST(0.0115 AS DOUBLE) *
        |                    coalesce(sum(cnt), 0)) AS BIGINT)
        |            AS thr
        |        FROM sk WHERE r = 0),
        |qh AS (SELECT DISTINCT item, r, bucket FROM h),
        |est AS (
        |  SELECT qh.item, min(coalesce(sk.cnt, 0)) AS est_n
        |  FROM qh LEFT JOIN sk ON qh.r = sk.r AND qh.bucket = sk.bucket
        |  GROUP BY qh.item),
        |ex AS (SELECT item, CAST(count(*) AS BIGINT) AS exact_n
        |       FROM it GROUP BY item)
        |SELECT est.item AS key, tot.n AS n_total, est.est_n, ex.exact_n,
        |  CAST(ex.exact_n >= tot.thr AS BIGINT) AS heavy
        |FROM est CROSS JOIN tot JOIN ex USING (item)
        |WHERE est.est_n >= tot.thr""".stripMargin,

    // k4: the bit set rebuilt in SQL from the same md5s (the k2
    // rolling hex parse), distinct (key, pos) on the probe side so a
    // key's colliding hashes can't fake a false negative
    "k4_bloom_filter" ->
      """WITH pres AS (
        |  SELECT DISTINCT o_custkey AS ck FROM orders
        |  WHERE o_custkey IS NOT NULL),
        |rws AS (SELECT unnest(range(0, 5)) AS r),
        |bits AS (
        |  SELECT DISTINCT
        |    list_reduce(list_transform(string_split(substring(
        |      md5(CAST(rws.r AS VARCHAR) || ':' ||
        |          CAST(pres.ck AS VARCHAR)), 1, 12), ''),
        |      c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
        |      (a, c) -> a * 16 + c) % 8192 AS pos
        |  FROM pres CROSS JOIN rws),
        |pr AS (SELECT DISTINCT key FROM (
        |  SELECT c_custkey AS key FROM customer
        |  WHERE c_custkey IS NOT NULL
        |  UNION ALL
        |  SELECT c_custkey + 1000000 AS key FROM customer
        |  WHERE c_custkey IS NOT NULL)),
        |pp AS (
        |  SELECT DISTINCT key,
        |    list_reduce(list_transform(string_split(substring(
        |      md5(CAST(rws.r AS VARCHAR) || ':' ||
        |          CAST(pr.key AS VARCHAR)), 1, 12), ''),
        |      c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
        |      (a, c) -> a * 16 + c) % 8192 AS pos
        |  FROM pr CROSS JOIN rws),
        |agg AS (
        |  SELECT key, CAST(count(*) AS BIGINT) AS n_pos,
        |         CAST(count(b.pos) AS BIGINT) AS n_hit
        |  FROM pp LEFT JOIN bits b USING (pos)
        |  GROUP BY key)
        |SELECT a.key, a.n_pos, a.n_hit,
        |  CAST(a.n_pos = a.n_hit AS BIGINT) AS might_contain,
        |  CAST(p2.ck IS NOT NULL AS BIGINT) AS present,
        |  CAST(a.n_pos = a.n_hit AND p2.ck IS NULL AS BIGINT)
        |    AS false_positive
        |FROM agg a LEFT JOIN pres p2 ON a.key = p2.ck""".stripMargin,

    // k6: d2's exact-Jaccard pair CTEs + the signatures rebuilt in SQL
    // (per-seed list_min of 12-hex md5("i:gram")), agreement counted
    // positionally
    "k6_minhash_fidelity" ->
      """WITH d AS (SELECT doc_id,
        |             string_split_regex(trim(text), '\s+') AS ws
        |           FROM documents),
        |s AS (SELECT doc_id,
        |        list_distinct(list_transform(range(1, len(ws)),
        |          i -> ws[i] || ' ' || ws[i+1])) AS sh
        |      FROM d),
        |sg AS (SELECT doc_id,
        |         list_transform(range(0, 16), i ->
        |           list_min(list_transform(sh, g ->
        |             substring(md5(CAST(i AS VARCHAR) || ':' || g),
        |               1, 12)))) AS sig
        |       FROM s),
        |j AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |        CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |        CAST(len(a.sh) + len(b.sh) -
        |             len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS jaccard
        |      FROM s a, s b WHERE a.doc_id < b.doc_id),
        |p AS (SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.5),
        |e AS (SELECT p.doc_a, p.doc_b, p.jaccard,
        |        CAST(len(list_filter(range(1, 17),
        |          i -> a.sig[i] = b.sig[i])) AS BIGINT) AS n_agree
        |      FROM p JOIN sg a ON a.doc_id = p.doc_a
        |        JOIN sg b ON b.doc_id = p.doc_b)
        |SELECT doc_a, doc_b, n_agree,
        |  CAST(n_agree AS DOUBLE) / 16 AS est_jaccard, jaccard,
        |  round(abs(CAST(n_agree AS DOUBLE) / 16 - jaccard), 6) AS abs_err
        |FROM e""".stripMargin,

    // k5: the register table rebuilt in SQL — 13-hex md5 prefix via
    // the rolling parse, low 10 bits the bucket, rho = 43 − length of
    // bin(high 42 bits) capped at 40, per-bucket max; the indicator
    // sum stays an exact BIGINT so the raw estimate's doubles agree
    // bit-for-bit (every decimal literal CAST to DOUBLE — DuckDB would
    // otherwise run DECIMAL arithmetic)
    "k5_hll_distinct" ->
      """WITH h AS (
        |  SELECT event_type,
        |    list_reduce(list_transform(string_split(substring(
        |      md5(CAST(user_id AS VARCHAR)), 1, 13), ''),
        |      c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
        |      (a, c) -> a * 16 + c) AS hv
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |r AS (
        |  SELECT event_type, hv % 1024 AS bucket,
        |    least(CASE WHEN hv // 1024 = 0 THEN 43
        |               ELSE 43 - length(bin(hv // 1024)) END, 40) AS rho
        |  FROM h),
        |regs AS (SELECT event_type, bucket, max(rho) AS reg
        |         FROM r GROUP BY 1, 2),
        |agg AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_buckets,
        |    CAST(sum(1::BIGINT << (40 - reg)) AS BIGINT) AS t_non
        |  FROM regs GROUP BY 1),
        |fp AS (
        |  SELECT event_type, n_buckets,
        |    CAST(1024 - n_buckets AS BIGINT) AS n_zero,
        |    t_non + (1024 - n_buckets) * (1::BIGINT << 40)
        |      AS t_fingerprint
        |  FROM agg),
        |est AS (
        |  SELECT *,
        |    (CAST(0.7213 AS DOUBLE) / (1 + CAST(1.079 AS DOUBLE) / 1024)
        |      * 1048576) /
        |      (CAST(t_fingerprint AS DOUBLE)
        |        / CAST(1::BIGINT << 40 AS DOUBLE)) AS raw
        |  FROM fp),
        |fin AS (
        |  SELECT *, CASE WHEN raw <= 2560 AND n_zero > 0
        |    THEN 1024 * ln(CAST(1024 AS DOUBLE) / n_zero)
        |    ELSE raw END AS esth
        |  FROM est),
        |ex AS (
        |  SELECT event_type,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS exact_d
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1)
        |SELECT f.event_type, ex.exact_d, f.n_buckets, f.n_zero,
        |  f.t_fingerprint, round(raw, 6) AS est_raw,
        |  round(esth, 6) AS est_hll,
        |  round(abs(esth - exact_d) / exact_d, 6) AS rel_err
        |FROM fin f JOIN ex USING (event_type)""".stripMargin,

    // the sketch rebuilt in SQL: same md5 sample gate (threshold(0.2)
    // = '333333333333'), same (value, hash) rank order, same ⌈q·n⌉
    // target ranks
    "k3_quantile_sample" ->
      """WITH sm AS (
        |  SELECT l_returnflag, l_extendedprice AS v,
        |    substring(md5('quantile-r13:' || CAST(l_orderkey AS VARCHAR)
        |      || '-' || CAST(l_linenumber AS VARCHAR)), 1, 12) AS hk
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL
        |    AND substring(md5('quantile-r13:' || CAST(l_orderkey AS VARCHAR)
        |      || '-' || CAST(l_linenumber AS VARCHAR)), 1, 12)
        |        < '333333333333'),
        |r AS (SELECT l_returnflag, v, hk,
        |        row_number() OVER (PARTITION BY l_returnflag
        |                           ORDER BY v, hk) AS rn,
        |        CAST(count(*) OVER (PARTITION BY l_returnflag) AS BIGINT)
        |          AS n
        |      FROM sm),
        |t AS (SELECT DISTINCT l_returnflag, n FROM r),
        |tq AS (SELECT l_returnflag, n AS n_sample,
        |         unnest([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
        |                 CAST(0.75 AS DOUBLE), CAST(0.95 AS DOUBLE)]) AS q
        |       FROM t)
        |SELECT tq.l_returnflag, tq.q, tq.n_sample, r.v AS est_value
        |FROM tq JOIN r ON r.l_returnflag = tq.l_returnflag
        |  AND r.rn = CAST(ceil(tq.q * tq.n_sample) AS INT)""".stripMargin
  )
}

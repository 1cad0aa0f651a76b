package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy / disclosure-risk operators — the compliance pass a
  * government-records platform (the reference publishes NYC hiring
  * data) runs before releasing a table: quasi-identifier re-identification
  * risk (k-anonymity, Sweeney 2002), sensitive-attribute homogeneity
  * (l-diversity, Machanavajjhala et al. 2007), and reproducible
  * noisy-count release (ε-differential privacy via the Laplace
  * mechanism, Dwork et al. 2006 — seeded here so a release is
  * AUDITABLE: the md5-derived uniforms make the same release replay in
  * any engine, the [[Sketches]] portability discipline applied to
  * noise; a production release under a strict DP threat model draws
  * fresh randomness instead and gives up replayability).
  *
  * Scale shape: every report is one map-side-combined groupBy over the
  * table scan (output = |quasi groups| rows); [[suppress]] joins the
  * at-risk group list back as a broadcast anti-join side when small,
  * an ordinary co-keyed join otherwise. Nothing is ever all-pairs. */
object Privacy {

  private def grp(quasiCols: Seq[String]): Seq[Column] = quasiCols.map(col)

  /** Per-group k-anonymity report: (quasi..., group_n, at_risk) —
    * `at_risk = 1` when fewer than k rows share the quasi-identifier
    * combination (each is re-identifiable within < k candidates).
    * NULL quasi values form their own groups (NULL is a disclosure
    * too: "the one row with no listed agency" singles a person out). */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String],
      k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymityReport needs quasi columns")
    require(k >= 2, s"k must be >= 2: $k")
    df.groupBy(grp(quasiCols): _*)
      .agg(count(lit(1)).as("group_n"))
      .withColumn("at_risk", (col("group_n") < k).cast("long"))
  }

  /** The release action: rows whose quasi-identifier group reaches k,
    * at-risk rows SUPPRESSED (the standard minimal-distortion release
    * when generalization hierarchies aren't available). */
  def suppress(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    // null-SAFE equality: the report counts a NULL quasi value as its
    // own group, so a NULL group that reaches k must survive the
    // release too — a plain equi-join would silently suppress every
    // NULL row regardless of its group's size. Fresh key aliases on
    // the safe-group side (it DERIVES from df — reusing the attribute
    // names leaves disambiguation to the analyzer's relation-dedup
    // heuristics, the generalizeSuppress discipline).
    val safe = kAnonymityReport(df, quasiCols, k)
      .where(col("at_risk") === 0)
      .select(quasiCols.zipWithIndex.map { case (c, i) =>
        col(c).as(s"__q$i") }: _*)
    val cond = quasiCols.zipWithIndex
      .map { case (c, i) => df(c) <=> safe(s"__q$i") }.reduce(_ && _)
    df.join(safe, cond, "left_semi")
  }

  /** Generalize-then-suppress release (LOCAL RECODING over a two-level
    * hierarchy) — [[suppress]] loses every at-risk row; generalization
    * keeps most of them at coarser granularity, the standard
    * utility-preserving k-anonymization: a row releases at the FINEST
    * level whose (quasi, rest...) group reaches k —
    * level 0 the fine value itself, level 1 the hierarchy's coarse
    * value (counted over the rows level 0 could NOT release — local
    * recoding, so a fine group of k−1 rows still pools into its coarse
    * group), level 2 suppressed. Deterministic: levels are pure group
    * counts, no ordering anywhere.
    *
    * Output: (idCol, rest..., level (0/1/2), released — the fine value
    * as string, "c:" + coarse value, or "SUPPRESSED"). `hierarchy` is
    * a (fine, coarse) dimension — dimension-sized, broadcast.
    *
    * Scale shape: two group-count aggregations (fine and coarse
    * spaces, both output-sized) joined back onto the scan; the
    * hierarchy broadcasts. One pass over the data per level. */
  def generalizeSuppress(df: DataFrame, idCol: String, fineCol: String,
      hierarchy: DataFrame, hFineCol: String, hCoarseCol: String,
      rest: Seq[String], k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    val restC = rest.map(col)
    // null-SAFE (<=>) joins throughout: a NULL quasi value is its own
    // group (the kAnonymityReport/suppress discipline) — plain
    // equi-joins would strand NULL rows at "suppressed" regardless of
    // their group's size
    // every rollup/dimension joins back under FRESH key aliases: the
    // right sides derive from (or could alias) the left, and reusing
    // the attribute names both trips DetectAmbiguousSelfJoin and
    // leaves correctness to the analyzer's relation-dedup heuristics
    val g0 = df.groupBy(col(fineCol) +: restC: _*)
      .agg(count(lit(1)).as("__n0"))
      .select(col(fineCol).as("__f0") +:
        rest.zipWithIndex.map { case (c, i) => col(c).as(s"__q$i") } :+
        col("__n0"): _*)
    val cond0 = (df(fineCol) <=> g0("__f0")) +: rest.zipWithIndex
      .map { case (c, i) => df(c) <=> g0(s"__q$i") }
    val withN0 = df.join(g0, cond0.reduce(_ && _), "left")
      .select(df.col("*"), col("__n0"))
    val dim = broadcast(hierarchy
      .select(col(hFineCol).as("__fdim"), col(hCoarseCol).as("__coarse"))
      .distinct())
    val base = withN0.join(dim, withN0(fineCol) <=> dim("__fdim"), "left")
      .select(withN0.col("*"), col("__coarse"))
    val rem = base.where(col("__n0") < k)
    // fresh aliases on the rollup keys: g1 derives from base, and a
    // direct join-back would be an ambiguous self-join (shared
    // attribute ids) — renaming mints new ones
    val g1 = rem.groupBy(col("__coarse") +: restC: _*)
      .agg(count(lit(1)).as("__n1"))
      .select(col("__coarse").as("__c1") +:
        rest.zipWithIndex.map { case (c, i) => col(c).as(s"__r$i") } :+
        col("__n1"): _*)
    val cond = (base("__coarse") <=> g1("__c1")) +: rest.zipWithIndex
      .map { case (c, i) => base(c) <=> g1(s"__r$i") }
    base.join(g1, cond.reduce(_ && _), "left")
      .select(base.col(idCol) +: rest.map(base.col) :+
        when(base.col("__n0") >= k, lit(0L))
          .when(col("__n1") >= k, lit(1L))
          .otherwise(lit(2L)).as("level") :+
        when(base.col("__n0") >= k, base.col(fineCol).cast("string"))
          .when(col("__n1") >= k,
            concat(lit("c:"), base.col("__coarse").cast("string")))
          .otherwise(lit("SUPPRESSED")).as("released"): _*)
  }

  /** Per-group l-diversity report: (quasi..., group_n, n_sensitive,
    * diverse) — a k-anonymous group whose members all share one
    * sensitive value still discloses it ("all 12 applicants in that
    * group were rejected"); `diverse = 1` needs ≥ l DISTINCT sensitive
    * values. NULL sensitive values drop from the distinct count (an
    * absent value disperses nothing). */
  def lDiversityReport(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "lDiversityReport needs quasi columns")
    require(l >= 2, s"l must be >= 2: $l")
    df.groupBy(grp(quasiCols): _*)
      .agg(count(lit(1)).as("group_n"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("diverse", (col("n_sensitive") >= l).cast("long"))
  }

  /** Per-group t-CLOSENESS report (Li, Li & Venkatasubramanian 2007) —
    * the third of the classic disclosure triple: k-anonymity bounds
    * re-identification, l-diversity bounds homogeneity, t-closeness
    * bounds what a group's sensitive DISTRIBUTION reveals relative to
    * the global one (a group that is 95% "rejected" against a 50%
    * baseline discloses plenty even with l distinct values). Distance
    * is total variation over the categorical sensitive domain —
    * TV(g) = ½ Σ_s |q_g(s) − p(s)| — the standard categorical
    * instantiation (the paper's EMD over an unordered domain).
    *
    * Cross-engine exactness discipline (the x9 lesson — no float
    * ACCUMULATION): the sum runs over the common denominator N·n_g as
    * EXACT integer arithmetic, Σ_s |cnt_gs·N − cnt_s·n_g| in
    * decimal(38,0) (products reach N·n_g ≈ 10²¹ at 100 TB — past
    * int64), and pays exactly ONE double division + round(…,6) at the
    * end, so the report replays bit-for-bit in any engine.
    *
    * Output: (quasi..., group_n, tv_dist, t_close = [tv_dist ≤ t]).
    * NULL sensitive values drop (the l-diversity discipline); NULL
    * quasi values form their own group.
    *
    * Scale shape: three map-side-combined group counts over the scan
    * (per-group, per-value, per-(group, value)), then everything is
    * output-sized: the |groups|×|values| grid (the sensitive-value
    * dimension broadcasts), one null-safe join of the gs counts, one
    * re-aggregation. Nothing row-sized moves after the scan. */
  def tClosenessReport(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, t: Double): DataFrame = {
    require(quasiCols.nonEmpty, "tClosenessReport needs quasi columns")
    require(t > 0.0 && t <= 1.0, s"t must be in (0, 1]: $t")
    val rows = df.where(col(sensitiveCol).isNotNull)
    val ng = rows.groupBy(grp(quasiCols): _*)
      .agg(count(lit(1)).as("__ng"))
    val cs = rows.groupBy(col(sensitiveCol).as("__s"))
      .agg(count(lit(1)).as("__cs"))
    // fresh aliases on the gs side: it derives from the same scan as
    // the grid (the generalizeSuppress discipline)
    val cgs = rows
      .groupBy(grp(quasiCols) :+ col(sensitiveCol).as("__s2"): _*)
      .agg(count(lit(1)).as("__cgs"))
      .select(quasiCols.zipWithIndex.map { case (c, i) =>
        col(c).as(s"__q$i") } :+ col("__s2") :+ col("__cgs"): _*)
    val n = rows.agg(count(lit(1)).as("__n"))
    val grid = ng.crossJoin(broadcast(cs)).crossJoin(broadcast(n))
    val cond = (quasiCols.zipWithIndex.map { case (c, i) =>
      grid(c) <=> cgs(s"__q$i") } :+ (grid("__s") === cgs("__s2")))
      .reduce(_ && _)
    val dec = "decimal(38,0)"
    val term = abs(
      coalesce(col("__cgs"), lit(0L)).cast(dec) * col("__n").cast(dec) -
        col("__cs").cast(dec) * col("__ng").cast(dec))
    grid.join(cgs, cond, "left")
      .groupBy(grp(quasiCols) :+ col("__ng") :+ col("__n"): _*)
      .agg(sum(term).as("__num"))
      .select(grp(quasiCols) :+ col("__ng").as("group_n") :+
        round(col("__num").cast("double") /
          (lit(2.0) * col("__n").cast("double") *
            col("__ng").cast("double")), 6).as("tv_dist"): _*)
      .withColumn("t_close", (col("tv_dist") <= t).cast("long"))
  }

  /** Right-to-ERASURE audit (the GDPR/CCPA delete-propagation check):
    * given the subjects to forget, report every keyed table's exposure
    * — total rows, rows referencing a subject, and rows after the
    * erasure anti-join — so the release ships with PROOF the deletion
    * propagated everywhere (n_after + n_refs = n_total per table, and
    * n_refs = 0 when re-audited post-erasure). [[erase]] is the
    * action; NULL keys never match a subject and survive.
    *
    * Scale shape: the subject set broadcasts (people-sized); each
    * table pays ONE scan — a broadcast left join (the distinct subject
    * side guarantees one output row per input row) aggregated into
    * (count(*), sum of match flags), with n_after the difference — no
    * shuffle anywhere, and tables audit independently (parallel
    * jobs at 100 TB). */
  def erasureAudit(tables: Seq[(String, DataFrame, String)],
      subjects: DataFrame, subjectCol: String): DataFrame = {
    require(tables.nonEmpty, "erasureAudit needs at least one table")
    val subj = broadcast(
      subjects.select(col(subjectCol).as("__s")).distinct())
    tables.map { case (name, df, keyCol) =>
      df.join(subj, df(keyCol) === subj("__s"), "left")
        .agg(count(lit(1)).as("n_total"),
          coalesce(sum(when(col("__s").isNotNull, lit(1L))
            .otherwise(lit(0L))), lit(0L)).as("n_refs"))
        .select(lit(name).as("table"), col("n_total"), col("n_refs"),
          (col("n_total") - col("n_refs")).as("n_after"))
    }.reduce(_ unionByName _)
  }

  /** The erasure action: drop every row referencing a subject. */
  def erase(df: DataFrame, keyCol: String, subjects: DataFrame,
      subjectCol: String): DataFrame =
    df.join(broadcast(subjects.select(col(subjectCol).as("__s"))
        .distinct()),
      df(keyCol) === col("__s"), "left_anti")

  /** ADDITIVE CONTENT DIGEST aggregate (the p8 certificate's survivor
    * fingerprint): Σ over rows of the 52-bit md5 prefix of the
    * '|'-joined string form of `cols`, summed in decimal(38,0).
    * Order-INDEPENDENT (a sum commutes — no corpus-wide sort or
    * collect), output-sized state, engine-portable (md5 + exact
    * integer sum replay in any engine — the portable-sketch
    * discipline). NOT a cryptographic commitment: it certifies against
    * accidental drift (a missed erase, a partial rewrite), not
    * adversarial tampering — state that in the release. NULL values
    * fold as the `<null>` sentinel (the [[dpCounts]] discipline). */
  def contentDigestAgg(cols: Seq[String]): org.apache.spark.sql.Column = {
    require(cols.nonEmpty, "contentDigestAgg needs at least one column")
    coalesce(sum(conv(substring(md5(concat_ws("|",
        cols.map(c => coalesce(col(c).cast("string"), lit("<null>"))): _*)
        .cast("binary")), 1, 13), 16, 10)
      .cast("long").cast("decimal(38,0)")),
      lit(0).cast("decimal(38,0)"))
  }

  /** ε-DP noisy counts per group, SEEDED: noise is Laplace(1/ε) via
    * the inverse CDF over a uniform derived from
    * md5(salt:group-values) — the 13-hex prefix over 16¹³, shifted to
    * the open interval by u' = (h + 0.5)/16¹³ so neither CDF tail hits
    * log(0). Count queries have sensitivity 1, so b = 1/ε. Output:
    * (quasi..., true_n, noise, dp_n) with noise and dp_n rounded to 6
    * (ln is the one libm step — the k5 discipline). Callers releasing
    * externally must drop `true_n`; it is emitted for the gate's
    * noise-accounting only.
    *
    * NULL quasi values seed as the sentinel `<null>` (grouping itself
    * is unchanged — NULL still forms its own group): `concat_ws` skips
    * NULLs, so without the coalesce two groups differing only by a
    * NULL column would share a seed and draw CORRELATED noise — a real
    * DP weakening. A literal `<null>` string still collides with an
    * actual NULL by construction; don't use the sentinel as data. */
  def dpCounts(df: DataFrame, quasiCols: Seq[String], epsilon: Double,
      salt: String): DataFrame = {
    require(quasiCols.nonEmpty, "dpCounts needs quasi columns")
    require(epsilon > 0, s"epsilon must be > 0: $epsilon")
    val space = 4503599627370496.0 // 16^13 = 2^52
    val keyStr = concat_ws("|",
      lit(salt) +: quasiCols.map(c =>
        coalesce(col(c).cast("string"), lit("<null>"))): _*)
    val h = conv(substring(md5(keyStr.cast("binary")), 1, 13), 16, 10)
      .cast("long")
    val b = 1.0 / epsilon
    df.groupBy(grp(quasiCols): _*)
      .agg(count(lit(1)).as("true_n"))
      .withColumn("__u", (h.cast("double") + lit(0.5)) / lit(space))
      .withColumn("noise", round(
        when(col("__u") < 0.5, lit(b) * log(lit(2.0) * col("__u")))
          .otherwise(lit(-b) *
            log(lit(2.0) * (lit(1.0) - col("__u")))), 6))
      .withColumn("dp_n", round(col("true_n") + col("noise"), 6))
      .drop("__u")
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic, engine-portable dataset splits — the reproducible
  * train/validation/test assignment a training pipeline needs.
  *
  * `sample()`/`sampleBy()` are seeded but engine-specific (their RNG
  * stream is a Spark implementation detail): a rerun on another engine —
  * or the same engine after a partitioning change — can move rows
  * between splits. Here membership is a PURE function of (salt, id):
  * the first 12 hex digits of `md5(salt ":" id)` compared
  * lexicographically against cumulative-fraction thresholds (lowercase
  * hex order == numeric order, and every engine's md5 agrees), so the
  * assignment survives reruns, repartitioning, and engine migrations,
  * and any two tables keyed by the same id split consistently.
  * Per-split fractions are accurate to 16⁻¹² ≈ 3.6e-15.
  *
  * Shuffle-free and codegen'd: one md5 + substring + string compares per
  * row, no state at any scale.
  */
object Splits {

  /** 12-hex-digit threshold for cumulative fraction `f`. Defined only for
    * f < 1.0: f = 1.0 would format to the 13-char "1000000000000", and a
    * 12-vs-13-char lexicographic compare keeps ~1/16 of rows instead of
    * all — both callers guard (assignSplit never compares the final
    * cumulative fraction; sampleByHash special-cases r >= 1.0), and this
    * require keeps a future caller from reintroducing the silent
    * mis-split. */
  private[graft] def thresholdHex(f: Double): String = {
    require(f >= 0.0 && f < 1.0,
      s"thresholdHex is defined on [0, 1): got $f — compare against a " +
        "full-range fraction with a constant-true predicate instead")
    f"${(f * math.pow(16, 12)).toLong}%012x"
  }

  /** The per-row hash key: first 12 lowercase-hex digits of
    * md5("salt:id"). `concat` (not `concat_ws`) so a NULL id propagates
    * to a NULL key → the row falls through to the LAST split in every
    * engine (matching SQL CASE semantics), instead of all null ids
    * silently hashing the bare salt. Salts are caller-chosen constants;
    * a salt containing ':' can collide with another (salt, id) pairing,
    * so keep ':' out of salts. */
  def hashKey(idCol: Column, salt: String): Column =
    substring(md5(concat(lit(salt), lit(":"), idCol.cast("string"))
      .cast("binary")), 1, 12)

  /** Deterministic per-stratum downsampling — the data-MIXING primitive:
    * keep a row iff its hash key falls under its stratum's rate. Same
    * portability contract as [[assignSplit]] (pure function of
    * (salt, id)), so remixing with new rates keeps maximal overlap with
    * the previous sample (rate 0.2 ⊃ rate 0.1 exactly), and reruns are
    * identical. Strata missing from `rates` are dropped; rate 1.0 keeps
    * everything. Shuffle-free. */
  def sampleByHash(df: DataFrame, idCol: String, stratumCol: String,
      salt: String, rates: Map[String, Double]): DataFrame = {
    require(rates.nonEmpty && rates.values.forall(r => r >= 0.0 && r <= 1.0),
      s"rates must lie in [0, 1]: $rates")
    val key = hashKey(col(idCol), salt)
    val cond = rates.toSeq.sortBy(_._1).map { case (stratum, r) =>
      col(stratumCol) === stratum &&
        (if (r >= 1.0) lit(true) else key < lit(thresholdHex(r)))
    }.reduce(_ || _)
    df.where(cond)
  }

  /** Deterministic per-stratum selection under a TOKEN BUDGET — the
    * "take N tokens per language/domain" mixing primitive ([[sampleByHash]]
    * is its rate-based sibling; this one targets absolute token counts,
    * which is how pretraining mixes are actually specified). Docs are
    * ordered within their stratum by the same (salt, id) md5 key as
    * [[assignSplit]] — a deterministic uniform shuffle — and kept while
    * the stratum's running token total BEFORE the doc stays under its
    * budget (the boundary-straddling doc is kept, [[Packing]]'s
    * pack-where-the-run-starts discipline — so a stratum may overrun by
    * one doc's tail, never fall short). Raising a budget strictly grows
    * the selection; reruns and engine migrations reproduce it bit-for-bit.
    *
    * Strata absent from `budgets` are dropped. The running totals are
    * [[Packing.cumSumBeforeBy]]'s distributed prefix sum — no
    * single-task stratum window at any scale. Output: input columns ++
    * `cum_before` (stratum tokens before this doc in hash order). */
  def sampleByTokenBudget(df: DataFrame, idCol: String, stratumCol: String,
      tokensCol: String, salt: String, budgets: Map[String, Long]): DataFrame = {
    require(budgets.nonEmpty && budgets.values.forall(_ > 0),
      s"budgets must be positive: $budgets")
    require(!df.columns.contains("__hk"),
      "input already has a __hk column — rename it first")
    val inBudget = df.where(
      col(stratumCol).isin(budgets.keys.toSeq.map(k => k: Any): _*))
    val keyed = inBudget.withColumn("__hk", hashKey(col(idCol), salt))
    val summed = Packing.cumSumBeforeBy(keyed, Seq(stratumCol),
      Seq("__hk", idCol), tokensCol)
    summed.where(col("cum_before") < budgetCase(stratumCol, budgets))
      .drop("__hk")
  }

  /** Per-stratum ROW cap — web curation's standard anti-spam pass ("at
    * most N documents per registered domain"): keep each stratum's
    * first `maxRows` rows in the deterministic (salt, id) md5-hash
    * order ([[assignSplit]]'s portability contract — reruns, engine
    * migrations, and unrelated corpus edits reproduce the same
    * survivors; id ASC breaks hash ties). Returns the surviving input
    * rows plus `cap_rank` (1-based position in the stratum's hash
    * order).
    *
    * Scale shape: the rank is NOT a per-stratum window (a hot domain —
    * the exact thing the cap exists for — would sort corpus-sized in
    * one task) but the bounded [[graft.functions.TopKByKey]] aggregate
    * over the hash's negated numeric image: map-side partials cap at
    * maxRows entries per (task, stratum), the exchange is output-sized,
    * and the survivor set joins back to the input on (stratum, id) —
    * ≤ maxRows·|strata| rows, broadcastable. NULL strata drop (the
    * [[sampleByHash]]/[[temperatureBudgets]] convention — an unowned
    * domain has no cap to count against). */
  def capPerStratum(df: DataFrame, idCol: String, stratumCol: String,
      salt: String, maxRows: Int): DataFrame = {
    require(maxRows >= 1, s"maxRows must be >= 1: $maxRows")
    require(!df.columns.contains("cap_rank"),
      "input already has a cap_rank column — rename it first")
    // hash ASC == DESC of the negated numeric image (12 hex digits =
    // 48 bits, exact in a long); rankedTopK ties break id ASC. NULL
    // strata are filtered BEFORE ranking — the join-back's
    // null-rejecting equality would drop them anyway, but they'd pay
    // shuffle cost grouped under the NULL key first
    val scored = df
      .where(col(stratumCol).isNotNull)
      .select(col(stratumCol).as("__s"), col(idCol).as("__i"))
      .withColumn("__neg",
        -conv(hashKey(col("__i"), salt), 16, 10).cast("long"))
    val kept = AnnSearch.rankedTopK(scored, "__s", "__i", "__neg", maxRows)
      .select(col("__s").as(stratumCol), col("__i").as(idCol),
        col("rank").cast("long").as("cap_rank"))
    df.join(kept, Seq(stratumCol, idCol))
  }

  /** TEMPERATURE-scaled per-stratum token budgets — the standard
    * multilingual/domain reweighting (Devlin et al. 2019 app.;
    * XLM-R/mT5 use the same recipe, public): stratum i's share of the
    * total budget is p_i^(1/T) / Σ_j p_j^(1/T), where p_i is the
    * stratum's OBSERVED token mass in the corpus — T = 1 reproduces the
    * corpus proportions, T → ∞ flattens toward uniform, in between
    * up-weights the tail without drowning the head. Feed the result to
    * [[sampleByTokenBudget]]; c5/c8/c17 fix budgets by hand, this
    * computes them FROM the corpus.
    *
    * Deterministic cross-engine: shares are rounded HALF_UP to 12
    * decimals BEFORE the budget multiply (the x4/a16 round-absorbs-ulp
    * discipline — Σ over doubles and pow may differ by an ulp between
    * engines), budgets are floor(share·total) floored at 1 so no
    * observed stratum silently vanishes (a zero budget would violate
    * [[sampleByTokenBudget]]'s positivity contract). NULL strata drop.
    * Driver-side Map: the aggregation is |strata|-sized — the bounded
    * quantizer-training-style collect, never corpus rows. */
  def temperatureBudgets(df: DataFrame, stratumCol: String,
      tokensCol: String, totalBudget: Long,
      temperature: Double): Map[String, Long] = {
    require(totalBudget > 0, s"totalBudget must be > 0: $totalBudget")
    require(temperature > 0.0 && java.lang.Double.isFinite(temperature),
      s"temperature must be positive and finite: $temperature")
    // coalesce: a stratum whose every row has NULL tokens sums to SQL
    // NULL — it budgets as zero mass (floor-at-1 still keeps it alive)
    // instead of NPE-ing on the collect
    val masses = df.where(col(stratumCol).isNotNull)
      .groupBy(col(stratumCol).cast("string").as("s"))
      .agg(coalesce(sum(col(tokensCol)), lit(0L)).cast("double").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .sortBy(_._1)
    require(masses.nonEmpty,
      s"no non-null '$stratumCol' strata to budget")
    val ws = masses.map { case (s, m) =>
      s -> math.pow(m, 1.0 / temperature) }
    val tot = ws.map(_._2).sum
    // all-zero masses would make every share 0/0 = NaN (which the
    // BigDecimal rounding rejects with an opaque error) — surface the
    // real problem instead
    require(tot > 0.0,
      s"no positive '$tokensCol' mass in any '$stratumCol' stratum")
    ws.map { case (s, w) =>
      val share = BigDecimal(w / tot)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      s -> math.max(1L, math.floor(share * totalBudget).toLong)
    }.toMap
  }

  /** The stratum → budget constant as one CASE column. */
  private def budgetCase(stratumCol: String,
      budgets: Map[String, Long]): Column =
    budgets.toSeq.sortBy(_._1).map { case (s, b) =>
      (col(stratumCol) === s, lit(b)) }
      .foldLeft(Option.empty[Column]) { case (acc, (cond, b)) =>
        Some(acc.fold(when(cond, b))(_.when(cond, b)))
      }.get

  /** [[sampleByTokenBudget]] ordered by an IMPORTANCE WEIGHT instead of
    * the uniform hash — importance RESAMPLING (the selection step DSIR
    * weights exist for, Xie et al. 2023 §3: keep the highest-weighted
    * documents until the target token budget fills). Within each stratum
    * docs are taken by `weightCol` DESC (id ASC tie-break) while the
    * running token total before the doc stays under the stratum budget —
    * boundary doc kept, same overrun contract as the hash-ordered
    * sibling. Deterministic given deterministic weights (pre-round
    * weights to fixed precision if they must survive an engine
    * migration). Same distributed-prefix-sum shape: one range
    * repartition on (stratum, −weight, id), no single-task stratum
    * window at any scale. Output: input columns ++ `cum_before`. */
  def sampleTopByBudget(df: DataFrame, idCol: String, stratumCol: String,
      tokensCol: String, weightCol: String,
      budgets: Map[String, Long]): DataFrame = {
    require(budgets.nonEmpty && budgets.values.forall(_ > 0),
      s"budgets must be positive: $budgets")
    require(!df.columns.contains("__nw"),
      "input already has a __nw column — rename it first")
    val inBudget = df.where(
      col(stratumCol).isin(budgets.keys.toSeq.map(k => k: Any): _*))
    // DESC via negation: cumSumBeforeBy orders ascending; −w asc == w
    // desc (−0.0 and 0.0 compare equal in both engines, ties fall to id)
    val keyed = inBudget.withColumn("__nw", -col(weightCol))
    val summed = Packing.cumSumBeforeBy(keyed, Seq(stratumCol),
      Seq("__nw", idCol), tokensCol)
    summed.where(col("cum_before") < budgetCase(stratumCol, budgets))
      .drop("__nw")
  }

  /** Adds `outCol` naming each row's split. `splits` are
    * (name, fraction) pairs summing to 1.0; assignment follows their
    * order over the hash space. */
  def assignSplit(df: DataFrame, idCol: String, salt: String,
      splits: Seq[(String, Double)], outCol: String = "split"): DataFrame = {
    require(splits.size >= 2, "need at least two splits")
    require(splits.forall(_._2 > 0), s"fractions must be positive: $splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1.0: $splits")
    val key = hashKey(col(idCol), salt)
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val assigned = splits.init.zip(cum.init).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), f)) =>
        val cond = key < lit(thresholdHex(f))
        Some(acc.fold(when(cond, lit(name)))(_.when(cond, lit(name))))
    }.get.otherwise(lit(splits.last._1))
    df.withColumn(outCol, assigned)
  }

  /** LEAKAGE-SAFE split assignment: near-dup CLUSTERS, not documents,
    * are the split unit. [[assignSplit]] keyed on the document id lets
    * a test doc keep a near-duplicate in train — the classic
    * contamination-through-splitting bug (Lee et al. 2021 §6.2 measure
    * exactly this leak in public benchmarks) — so here every doc is
    * first resolved to its near-dup component
    * ([[Components.nearDupComponents]] over caller-supplied pairs) and
    * the split hash is keyed on the COMPONENT root: the whole cluster
    * moves together by construction, and fractions still hold in
    * expectation over clusters. Output: input rows + `component` +
    * `split`.
    *
    * Scale shape: the pairs → closure is the audited d8 large-star/
    * small-star O(log n) path; the assignment itself adds no shuffle
    * (a pure hash of the component column). */
  def leakFreeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
      salt: String, splits: Seq[(String, Double)],
      aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame =
    assignSplit(
      Components.nearDupComponents(docs, idCol, pairs, aCol, bCol),
      "component", salt, splits)

  /** Deterministic EPOCH SHUFFLE — the between-epoch global reshuffle a
    * training loader applies, as a portable (shard, pos) ADDRESS instead
    * of an engine-private RNG permutation. Each row's address is a pure
    * function of (salt, epoch, id): the row's key is
    * md5("salt:epoch:id"); `shard` is the key's first 6 hex digits mod
    * `nShards` (uniform buckets), `pos` the key's rank WITHIN the shard.
    * A loader that streams shards 0..nShards-1, each in pos order, reads
    * a uniform permutation of the corpus that (a) replays bit-for-bit on
    * any engine and after any repartitioning, and (b) changes completely
    * between epochs (the epoch is folded into the hash).
    *
    * Scale shape: the only movement is one hash-partition by shard plus
    * a per-shard sort — the rank window never sees more than
    * corpus/nShards rows, and no global total order is materialized.
    * At 100 TB you size nShards to the loader's read parallelism
    * (thousands); the per-shard sort is exactly the write-side sort the
    * shard files need anyway. */
  def epochShuffle(df: DataFrame, idCol: String, salt: String, epoch: Int,
      nShards: Int): DataFrame = {
    require(nShards >= 1 && nShards <= (1 << 20),
      s"nShards must be in [1, 2^20]: $nShards")
    require(epoch >= 0, s"epoch must be >= 0: $epoch")
    val key = md5(concat(lit(salt), lit(":"), lit(epoch.toString), lit(":"),
      col(idCol).cast("string")).cast("binary"))
    val shard = (conv(substring(key, 1, 6), 16, 10).cast("long")
      % nShards).cast("int")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__k"), col(idCol))
    df.withColumn("__k", key).withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__k")
  }
}

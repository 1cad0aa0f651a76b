package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Sequence packing for training pipelines: assign documents to
  * fixed-token-budget packs (context windows) in a deterministic order.
  *
  * The kernel is a DISTRIBUTED exclusive prefix sum ([[cumSumBefore]]):
  * the classic `sum() OVER (ORDER BY …)` global window moves the whole
  * table through ONE task — fine at 10⁵ rows, fatal at 10¹¹. Here the
  * order is established once by a range repartition (parallel sort);
  * each partition computes its LOCAL running sums with an ordinary
  * window, and a driver-side prefix over the width per-partition totals
  * (the [[graft.sources.Bronze.denseIds]] offset trick, summed instead
  * of counted) lifts them to global values.
  *
  * Packing semantics: doc d goes to pack `⌊cumBefore(d) / budget⌋` —
  * boundary-straddling docs belong to the pack where their token run
  * starts. This is the order-deterministic "chunk the token stream"
  * discipline (packs may overrun by at most one doc's tail); next-fit
  * greedy packing is sequential by nature and belongs within shards,
  * not across a cluster.
  */
object Packing {

  /** Adds `outCol` = sum of `valCol` over all rows strictly BEFORE this
    * row in `orderCols` order (exclusive prefix sum), distributed.
    * `orderCols` should be a total order for deterministic results. */
  def cumSumBefore(df: DataFrame, orderCols: Seq[String], valCol: String,
      outCol: String = "cum_before", width: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "cumSumBefore needs ordering columns")
    require(!df.columns.contains(outCol),
      s"output column '$outCol' already exists on the input — pick another")
    graft.Reserved.requireNone(df, "Packing.cumSumBefore")
    val spark = df.sparkSession
    val w = if (width > 0) width else spark.sparkContext.defaultParallelism
    val ranged = df
      .repartitionByRange(w, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .withColumn("__graft_pid",
        shiftright(monotonically_increasing_id(), 33).cast("int"))
    val cached = graft.ManagedCache.swap("Packing.cumSumBefore", ranged)

    // local exclusive running sum per partition (the window's pid
    // partitioning re-clusters rows that are already clustered — one
    // 1:1 exchange; the alternative is imperative mapPartitions)
    val wLocal = Window.partitionBy(col("__graft_pid"))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = cached.withColumn("__graft_local",
      coalesce(sum(col(valCol)).over(wLocal), lit(0L)))

    // driver prefix over per-partition totals → global offset
    val totals = cached.groupBy("__graft_pid")
      .agg(coalesce(sum(col(valCol)), lit(0L)).as("t")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = totals.keys.toSeq.sorted
      .foldLeft((0L, Vector.empty[(Int, Long)])) { case ((acc, out), pid) =>
        (acc + totals(pid), out :+ (pid -> acc))
      }._2
    val offDf = broadcast(
      spark.createDataFrame(offsets).toDF("__graft_pid", "__graft_off"))
    local.join(offDf, "__graft_pid")
      .withColumn(outCol, col("__graft_off") + col("__graft_local"))
      .drop("__graft_pid", "__graft_local", "__graft_off")
  }

  /** [[cumSumBefore]] with stratum partitioning: the exclusive prefix
    * sum restarts at 0 for every distinct `byCols` value, ordered by
    * `orderCols` WITHIN the stratum. Same distributed shape — one range
    * repartition on (byCols ++ orderCols) establishes a global order in
    * which each stratum is contiguous, local windows compute
    * per-(partition, stratum) running sums, and a driver-side exclusive
    * scan per stratum lifts them to global values. Driver state is one
    * row per (partition, stratum-on-that-partition): range partitioning
    * keeps a stratum on ~(its share of rows / partition size) partitions,
    * so the collect is O(width + strata) rows, not width × strata — fine
    * for the language/domain/source strata this serves, and never
    * proportional to the data. */
  def cumSumBeforeBy(df: DataFrame, byCols: Seq[String],
      orderCols: Seq[String], valCol: String,
      outCol: String = "cum_before", width: Int = 0): DataFrame = {
    require(byCols.nonEmpty,
      "cumSumBeforeBy needs stratum columns — use cumSumBefore otherwise")
    require(orderCols.nonEmpty, "cumSumBeforeBy needs ordering columns")
    require(!df.columns.contains(outCol),
      s"output column '$outCol' already exists on the input — pick another")
    graft.Reserved.requireNone(df, "Packing.cumSumBeforeBy")
    val spark = df.sparkSession
    val w = if (width > 0) width else spark.sparkContext.defaultParallelism
    val keyCols = (byCols ++ orderCols).map(col)
    val ranged = df
      .repartitionByRange(w, keyCols: _*)
      .sortWithinPartitions(keyCols: _*)
      .withColumn("__graft_pid",
        shiftright(monotonically_increasing_id(), 33).cast("int"))
    val cached = graft.ManagedCache.swap("Packing.cumSumBeforeBy", ranged)

    val wLocal = Window
      .partitionBy((col("__graft_pid") +: byCols.map(col)): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = cached.withColumn("__graft_local",
      coalesce(sum(col(valCol)).over(wLocal), lit(0L)))

    // driver prefix per stratum over pid order → per-(pid, stratum)
    // global offsets
    val totals = cached
      .groupBy((col("__graft_pid") +: byCols.map(col)): _*)
      .agg(coalesce(sum(col(valCol)), lit(0L)).as("__graft_t"))
      .collect()
    val byWidth = byCols.size
    val offsets = totals
      .map(r => (r.getInt(0), Seq.tabulate(byWidth)(i => r.get(i + 1)),
        r.getLong(byWidth + 1)))
      .groupBy(_._2)
      .flatMap { case (_, rows) =>
        rows.sortBy(_._1).foldLeft((0L, Vector.empty[(Int, Seq[Any], Long)])) {
          case ((acc, out), (pid, key, t)) =>
            (acc + t, out :+ ((pid, key, acc)))
        }._2
      }.toSeq
    val offSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__graft_pid",
        org.apache.spark.sql.types.IntegerType) +:
      byCols.map(c => df.schema(c)) :+
      org.apache.spark.sql.types.StructField("__graft_off",
        org.apache.spark.sql.types.LongType))
    val offRows = offsets.map { case (pid, key, off) =>
      org.apache.spark.sql.Row.fromSeq(pid +: key :+ off) }
    val offDf = broadcast(spark.createDataFrame(
      java.util.Arrays.asList(offRows: _*), offSchema)
      .withColumnsRenamed(
        (byCols.map(c => c -> s"__graft_by_$c") :+
          ("__graft_pid" -> "__graft_opid")).toMap))
    // null-safe equality on the stratum keys — a using-columns equi-join
    // would silently DROP rows of a null stratum
    val cond = (col("__graft_pid") === col("__graft_opid")) +:
      byCols.map(c => col(c) <=> col(s"__graft_by_$c"))
    local.join(offDf, cond.reduce(_ && _))
      .withColumn(outCol, col("__graft_off") + col("__graft_local"))
      .drop(byCols.map(c => s"__graft_by_$c"): _*)
      .drop("__graft_pid", "__graft_opid", "__graft_local", "__graft_off")
  }

  /** Sliding-window token chunking — split each document into
    * `chunkSize`-token windows advancing by `chunkSize − overlap`
    * tokens (context-window preparation; the intra-document sibling of
    * [[packByTokenBudget]]'s cross-document packing). Pure per-row
    * array work: no shuffle, embarrassingly parallel at any scale.
    *
    * Output: idCol, `chunk_id` (0-based), `n_chunk_tokens`,
    * `chunk_text` (single-space joined). Tokens are whitespace splits
    * of the trimmed text; empty documents produce no chunks; the final
    * window may be shorter than `chunkSize`. Window starts stop at
    * `len − overlap − 1`: a later start would add no tokens beyond the
    * previous chunk's overlap tail and emit a fully-contained duplicate
    * chunk (e.g. 48-token doc at 48/8 → one chunk, not a redundant
    * second one of tokens 41–48). */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int = 0): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val step = chunkSize - overlap
    val ws = split(trim(col(textCol)), "\\s+")
    val chunks = df
      .withColumn("__graft_ws", ws)
      .withColumn("__graft_len", size(col("__graft_ws")))
      .where(length(trim(col(textCol))) > 0)
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(0),
            greatest(col("__graft_len") - 1 - overlap, lit(0)), lit(step)),
          start => slice(col("__graft_ws"), start + 1, lit(chunkSize)))))
      .withColumnRenamed("pos", "chunk_id")
    chunks.select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
      size(col("col")).cast("long").as("n_chunk_tokens"),
      array_join(col("col"), " ").as("chunk_text"))
  }

  /** The ARTIFACT half of packing: assemble each pack's member texts
    * into the concatenated training example a trainer actually
    * consumes — [[packByTokenBudget]] assigns documents to packs
    * (docs start in the pack where their cumulative offset lands; a
    * straddling doc spills into the next window, the standard
    * greedy-concat shape), and this groups members per pack in
    * `orderCol` order and joins their texts with single spaces.
    * Output: pack_id, n_docs, n_tokens (sum of the members' counts),
    * pack_text. One doc-keyed aggregation over the already-assigned
    * frame; the per-pack collect is bounded by budget/min-doc-tokens
    * members. Deterministic strings → exact oracle. */
  def assemblePacks(df: DataFrame, orderCol: String, tokensCol: String,
      textCol: String, budget: Long): DataFrame =
    assembleAssigned(packByTokenBudget(df, Seq(orderCol), tokensCol, budget),
      orderCol, tokensCol, textCol)

  /** The grouping half of [[assemblePacks]] over a frame that ALREADY
    * carries `pack_id` (from [[packByTokenBudget]]) — exposed so a
    * caller that also needs the per-member assignment (e.g.
    * [[TrainerExport.shardManifestWithCard]]'s per-shard language mix)
    * assigns once instead of re-running the prefix-sum window. */
  def assembleAssigned(assigned: DataFrame, orderCol: String,
      tokensCol: String, textCol: String): DataFrame =
    assigned
      .groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).cast("long").as("n_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col(orderCol), col(textCol)))),
          s => s.getField(textCol)), " ").as("pack_text"))

  /** Pack documents into `budget`-token bins in `orderCols` order:
    * output = input ++ (`cum_before`, `pack_id`). */
  def packByTokenBudget(df: DataFrame, orderCols: Seq[String],
      tokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    require(!df.columns.contains("pack_id"),
      "input already has a pack_id column — drop or rename it first")
    cumSumBefore(df, orderCols, tokensCol)
      .withColumn("pack_id", floor(col("cum_before") / budget))
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Exact distributed quantiles via order statistics — the 100 TB shape
  * for interpolated percentiles.
  *
  * Spark's built-in exact `percentile` buffers EVERY value in the
  * aggregation buffer (partial agg = a counts-map of the whole group),
  * which is fine at 10⁵ rows and fatal at 10¹¹. This operator never
  * buffers: it range-repartitions on (key, value) — a parallel sort —
  * then turns per-partition row positions into global per-key ranks
  * with driver-side prefix sums (width × |keys| integers, the
  * [[graft.sources.Bronze.denseIds]] trick), and fetches only the
  * O(|keys|·|ps|) boundary order statistics needed for interpolation.
  * Cost: one range shuffle + one tiny counts job + a filter join, all
  * streaming.
  *
  * Interpolation matches `percentile`/DuckDB `quantile_cont` BIT-exactly:
  * `pos = p·(n−1); (⌈pos⌉−pos)·lower + (pos−⌊pos⌋)·upper` on doubles —
  * the two-sided lerp both engines use. The one-sided
  * `lower + (upper−lower)·frac` form is algebraically equal but rounds
  * differently (observed 1-ulp divergence on real data), so the exact
  * weight form matters.
  *
  * Intended for low-cardinality keys (the counts collect is
  * width × |keys| rows); for high-cardinality keys the built-in
  * partial-agg percentile is the right tool instead.
  *
  * Output: keyCols…, `p` (double), `q` (double), `n` (long non-null
  * count). NULL values are ignored, like the built-in. Keys with no
  * non-null values produce no rows.
  */
object Quantiles {

  def exactQuantiles(df: DataFrame, keyCols: Seq[String], valCol: String,
      ps: Seq[Double], width: Int = 0): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantile fractions must lie in [0, 1], got $ps")
    // the output appends these names to the key columns — a key named
    // p/q/n would make the final projection ambiguous
    Seq("p", "q", "n").foreach(r => require(!keyCols.contains(r),
      s"key column '$r' collides with the $r output column — alias it first"))
    graft.Reserved.requireNone(df, "Quantiles.exactQuantiles")
    val spark = df.sparkSession
    val w = if (width > 0) width else spark.sparkContext.defaultParallelism
    val mask = (1L << 33) - 1
    val sortCols = keyCols.map(col) :+ col("__graft_v")

    // parallel sort by (key, value); local row index from the documented
    // monotonically_increasing_id layout (partition id << 33 | row#)
    val ranged = df
      .select(keyCols.map(col) :+ col(valCol).cast("double").as("__graft_v"): _*)
      .where(col("__graft_v").isNotNull)
      .repartitionByRange(w, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__graft_mid", monotonically_increasing_id())
      .withColumn("__graft_pid", shiftright(col("__graft_mid"), 33).cast("int"))
      .withColumn("__graft_lrn", col("__graft_mid").bitwiseAND(mask))
    val cached = graft.ManagedCache.swap("Quantiles.exactQuantiles", ranged)

    // ONE tiny job: per-(partition, key) row count + run start; the
    // range partitioner keeps each partition's key-runs contiguous, so
    // min(__graft_lrn) is where the key's run begins in that partition
    val keyIdx = keyCols.indices
    val counts = cached.groupBy(col("__graft_pid") +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("__graft_cnt"), min(col("__graft_lrn")).as("__graft_runstart"))
      .collect()

    // driver-side prefix sums: global rank offset of each (pid, key) run
    case class RunInfo(pid: Int, key: Seq[Any], cnt: Long, runStart: Long)
    val runs = counts.map(r => RunInfo(r.getInt(0),
      keyIdx.map(i => r.get(1 + i)), r.getLong(1 + keyCols.length),
      r.getLong(2 + keyCols.length)))
    val byKey = runs.groupBy(_.key).view
      .mapValues { rs =>
        val sorted = rs.sortBy(_.pid)
        val offs = sorted.scanLeft(0L)(_ + _.cnt)
        (sorted, offs) // run i holds global key-ranks [offs(i), offs(i+1))
      }.toMap

    // the driver knows which (partition, local row) each boundary order
    // statistic lives at, so the scan needs ONE broadcast equi-join on
    // (__graft_pid, __graft_lrn) — no per-row global-rank arithmetic at all
    def locate(key: Seq[Any], rank: Long): (Int, Long) = {
      val (sorted, offs) = byKey(key)
      var i = offs.length - 2
      while (i > 0 && offs(i) > rank) i -= 1
      (sorted(i).pid, rank - offs(i) + sorted(i).runStart)
    }
    val keyFields = keyCols.map(k => df.schema(k))
    val bSchema = StructType(StructField("__graft_pid", IntegerType)
      +: StructField("__graft_lrn", LongType) +: keyFields
      :+ StructField("p", DoubleType) :+ StructField("__graft_wlo", DoubleType)
      :+ StructField("__graft_whi", DoubleType)
      :+ StructField("__graft_which", StringType) :+ StructField("n", LongType))
    val bRows = byKey.keys.toSeq.flatMap { key =>
      val n = byKey(key)._1.map(_.cnt).sum
      ps.flatMap { p =>
        val pos = p * (n - 1)
        val lo = math.floor(pos).toLong
        val hi = math.ceil(pos).toLong
        // two-sided weights, computed exactly as the engines do
        // (Long − Double promotion); wlo + whi need not equal 1.0 in
        // floating point, which is precisely why both are carried
        val wlo = hi - pos
        val whi = pos - lo
        val (loPid, loLrn) = locate(key, lo)
        val (hiPid, hiLrn) = locate(key, hi)
        Seq(Row.fromSeq(loPid +: loLrn +: key :+ p :+ wlo :+ whi :+ "lo" :+ n),
          Row.fromSeq(hiPid +: hiLrn +: key :+ p :+ wlo :+ whi :+ "hi" :+ n))
      }
    }
    val bDf = spark.createDataFrame(java.util.Arrays.asList(bRows: _*), bSchema)

    // the join IS the filter: |bounds| rows survive out of the scan
    val joinCond = cached("__graft_pid") === bDf("__graft_pid") &&
      cached("__graft_lrn") === bDf("__graft_lrn")
    val matched = cached.join(broadcast(bDf), joinCond)
      .select(keyCols.map(bDf(_)) ++ Seq(bDf("p"), bDf("__graft_wlo"), bDf("__graft_whi"),
        bDf("n"), col("__graft_which"), col("__graft_v")): _*)

    // lo == hi (integral pos) makes both weights 0 — return lower, like
    // the built-in's equal-index short-circuit
    matched.groupBy(keyCols.map(col) :+ col("p"): _*)
      .agg(first(col("__graft_wlo")).as("__graft_wlo"), first(col("__graft_whi")).as("__graft_whi"),
        first(col("n")).as("n"),
        min(when(col("__graft_which") === "lo", col("__graft_v"))).as("__graft_lower"),
        min(when(col("__graft_which") === "hi", col("__graft_v"))).as("__graft_upper"))
      .select(keyCols.map(col) ++ Seq(col("p"),
        when(col("__graft_whi") === 0.0, col("__graft_lower"))
          .otherwise(col("__graft_wlo") * col("__graft_lower") + col("__graft_whi") * col("__graft_upper"))
          .as("q"), col("n")): _*)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Parallelism guard shared by the scoring operators.
  *
  * AQE sizes post-shuffle partitions by BYTES, so a byte-small frame
  * (distinct titles, doc shingle sets, an embedding table) that feeds an
  * n²/per-pair scoring loop gets coalesced onto one or two cores —
  * measured single-task stages of 0.5–1.7 s at sf0.1 across the ANN,
  * dedup, and similarity-join operators. An EXPLICIT-width repartition
  * (REPARTITION_BY_NUM) is the one shuffle AQE must respect. */
object Par {
  /** Hash-repartition at explicit width (`defaultParallelism`). */
  def spread(df: DataFrame, cs: Column*): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, cs: _*)
}

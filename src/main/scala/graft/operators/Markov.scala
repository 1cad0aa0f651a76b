package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** First-order Markov transition statistics over per-user event
  * sequences — the "what happens after X" model behavioral pipelines
  * fit (next-event prediction features, journey analysis, session
  * simulators). [[Funnel]] asks about one FIXED ordered chain;
  * this estimates the full empirical transition matrix.
  *
  * Semantics: order each user's events by (ts, id) — the id tie-break
  * pins simultaneous events, the s3/x5 discipline — pair each event
  * with its successor (`lead` within the user), count (cur, next)
  * pairs, and emit P(next|cur) = n / Σ_next n rounded to 6 decimals
  * (one integer division per row → engine-exact).
  *
  * Scale shape: ONE window pass per user (shuffle on the user key,
  * in-partition sort — no per-user collect; a power user costs a
  * longer sorted run, not a driver buffer), then an output-sized
  * (|states|²) aggregation. The probability normalization is a window
  * over the transition matrix itself — |states|² rows, negligible. */
object Markov {

  /** Transition matrix → (cur, next, n_trans, p) over `stateCol`
    * sequences per `keyCol`, ordered by (`tsCol`, `idCol`). Null
    * keys/states/timestamps drop; single-event users contribute no
    * transition. */
  def transitions(df: DataFrame, keyCol: String, stateCol: String,
      tsCol: String, idCol: String): DataFrame = {
    val seqW = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
    val pairs = df
      .where(col(keyCol).isNotNull && col(stateCol).isNotNull &&
        col(tsCol).isNotNull)
      .select(col(keyCol), col(stateCol).as("cur"),
        col(tsCol), col(idCol))
      .withColumn("next", lead(col("cur"), 1).over(seqW))
      .where(col("next").isNotNull)
    val counts = pairs.groupBy("cur", "next")
      .agg(count(lit(1)).as("n_trans"))
    val normW = Window.partitionBy("cur")
    counts.withColumn("p",
        round(col("n_trans").cast("double") /
          sum(col("n_trans")).over(normW), 6))
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** CDC MERGE apply — produce the next snapshot of a keyed table from a
  * change log of inserts/updates/deletes (the Delta-style MERGE
  * semantic, public methodology). The reference re-ingests FULL weekly
  * snapshots (src/data_pull.py fetches whole tables); at 100 TB the
  * feed is a change log and the snapshot is maintained, never
  * re-fetched: per key, the LAST change wins (ordered by the change
  * timestamp with the (op, attrs) tie-break making equal-ts arrivals
  * deterministic — the Scd2 discipline); a last-op DELETE removes the
  * key, anything else upserts the change's attributes; keys without
  * changes pass through from the base untouched.
  *
  * Shuffles: one key-partitioned window over the CHANGE LOG (batch-
  * sized, not base-sized) to pick each key's last change, one
  * anti-join of the base against the changed keys (unhinted — AQE
  * broadcasts a batch-sized key set), one union. The base is never
  * shuffled, only anti-join-probed: cost follows the change log.
  *
  * `opCol` values: "I"/"U" both upsert (idempotent MERGE-style: an
  * insert for an existing key behaves as an update — at-least-once
  * feeds re-deliver, so strict insert-vs-update is not enforceable),
  * "D" deletes; anything else raises at runtime. */
object Cdc {

  def applyChanges(base: DataFrame, changes: DataFrame, keyCol: String,
      opCol: String, tsCol: String, attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "CDC apply needs at least one attribute column")
    val opOk = upper(col(opCol)).isin("I", "U", "D")
    // the window runs over the projected frame, so it must order by the
    // PROJECTED __op — opCol itself is renamed away by the select
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy((col(tsCol).desc +: col("__op").desc +:
        attrCols.map(col(_).desc)): _*)
    val last = changes
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol) +: col(tsCol) +:
        when(opOk, upper(col(opCol)))
          .otherwise(raise_error(concat(lit("Cdc.applyChanges: bad op '"),
            col(opCol).cast("string"), lit("' (want I/U/D)")))).as("__op") +:
        attrCols.map(col): _*)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
    val upserts = last.where(col("__op") =!= "D")
      .select(col(keyCol) +: attrCols.map(col): _*)
    base.select(col(keyCol) +: attrCols.map(col): _*)
      .join(last.select(col(keyCol)), Seq(keyCol), "left_anti")
      .unionByName(upserts)
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Release-to-release SNAPSHOT DIFF — the audit a versioned data
  * platform runs between two corpus releases: which keys were added,
  * which removed, which rows changed content. The reference publishes
  * weekly gold tables with no record of what moved between Sundays;
  * the diff IS the changelog a downstream consumer (or a data card's
  * "changes since v1" section) needs.
  *
  * Content comparison is by md5 over the null-tagged concatenation of
  * `valueCols` (the c15 manifest discipline: a digest, not a
  * column-by-column struct compare, so the diff row stays fixed-width
  * however wide the table is; the US unit-separator (u001f) keeps
  * ("ab","c") and ("a","bc") from colliding, and NULL digests as the
  * explicit `<null>` tag so null-vs-null compares equal. Known limit,
  * pinned in the spec: a literal value equal to the tag is
  * indistinguishable from NULL — fine for a changelog, do not
  * repurpose the digest as a uniqueness proof.
  * Output: one row per differing key — (key, status ∈
  * added|removed|changed, hash_a, hash_b); identical rows emit
  * nothing, so the result is delta-sized.
  *
  * Scale: ONE full-outer join on the key (both sides shuffle once on
  * the join key — unavoidable for a whole-snapshot compare; with both
  * releases bucket-laid-out on the key it degrades to per-bucket local
  * merges, the Bucketing discipline), digests computed map-side. */
object SnapshotDiff {

  private def digest(valueCols: Seq[String]) =
    md5(concat_ws("\u001f",
      valueCols.map(c => coalesce(col(c).cast("string"), lit("<null>"))): _*))

  def diff(a: DataFrame, b: DataFrame, keyCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "snapshot diff needs at least one value column")
    val left = a.where(col(keyCol).isNotNull)
      .select(col(keyCol).as("key"), digest(valueCols).as("hash_a"))
    val right = b.where(col(keyCol).isNotNull)
      .select(col(keyCol).as("key"), digest(valueCols).as("hash_b"))
    left.join(right, Seq("key"), "full_outer")
      .where(!(col("hash_a") <=> col("hash_b")))
      .select(col("key"),
        when(col("hash_a").isNull, lit("added"))
          .when(col("hash_b").isNull, lit("removed"))
          .otherwise(lit("changed")).as("status"),
        col("hash_a"), col("hash_b"))
  }
}

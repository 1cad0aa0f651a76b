package graft

import org.apache.spark.sql.DataFrame

/** The `__graft_` column-name prefix is reserved for operators' internal
  * scratch columns (partition ids, local row numbers, offsets). Operators
  * that add such columns call [[requireNone]] up front so a caller's
  * column with a colliding name fails loudly instead of being silently
  * overwritten and dropped from the output.
  */
private[graft] object Reserved {
  val Prefix = "__graft_"

  def requireNone(df: DataFrame, op: String): Unit = {
    val clash = df.columns.filter(_.startsWith(Prefix))
    require(clash.isEmpty,
      s"$op reserves the '$Prefix' column-name prefix for internal " +
        s"scratch columns; rename input column(s): ${clash.mkString(", ")}")
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Testdata table access (TESTDATA.md): one parquet per table under the
  * scale-factor dir. */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}

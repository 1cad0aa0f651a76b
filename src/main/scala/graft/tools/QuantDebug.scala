package graft.tools

import org.apache.spark.sql.functions._

/** Scratch parity check: Quantiles.exactQuantiles vs the built-in exact
  * percentile, bit-compared on the sf0.01 lineitem. Not driver contract. */
object QuantDebug {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("qdbg", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val mine = graft.operators.Quantiles.exactQuantiles(
      li, Seq("l_returnflag"), "l_extendedprice", Seq(0.25, 0.5, 0.75))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val builtin = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.25)").as("p25"),
        expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.75)").as("p75"))
      .collect()
    var bad = 0
    builtin.foreach { r =>
      val k = r.getString(0)
      Seq(0.25 -> r.getDouble(1), 0.5 -> r.getDouble(2), 0.75 -> r.getDouble(3)).foreach {
        case (p, b) =>
          val m = mine((k, p))
          if (java.lang.Double.doubleToLongBits(b) != java.lang.Double.doubleToLongBits(m)) {
            println(f"DIFF $k p=$p builtin=$b%.17g mine=$m%.17g"); bad += 1
          } else println(s"same $k p=$p $b")
      }
    }
    println(if (bad == 0) "PARITY OK" else s"PARITY FAILED: $bad")
    spark.stop()
  }
}

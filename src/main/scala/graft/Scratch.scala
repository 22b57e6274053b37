package graft

import org.apache.spark.sql.SparkSession
import graft.sources.Tables
import graft.operators.Relational

// temporary profiling harness — not part of the library
object Scratch {
  def time(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    spark.range(2).selectExpr(
      "from_json(to_json(named_struct('uid', CAST(id AS STRING))), 'uid STRING').uid AS u")
      .groupBy("u").count().count()
    def li = Tables.lineitem(spark, d)
    def liPar = li.repartition(32)
    time("warm_scan")(li.count())
    for (i <- 1 to 2) time(s"pricing_single_$i")(Relational.pricingSummary(li).count())
    for (i <- 1 to 2) time(s"pricing_par_$i")(Relational.pricingSummary(liPar).count())
    for (i <- 1 to 2) time(s"top_orders_$i")(Relational.topOrdersByRevenue(Tables.customer(spark, d), Tables.orders(spark, d), li).count())
    for (i <- 1 to 2) time(s"top_orders_par_$i")(Relational.topOrdersByRevenue(Tables.customer(spark, d), Tables.orders(spark, d), liPar).count())
    for (i <- 1 to 2) time(s"revenue_nation_$i")(Relational.revenueByNation(spark, d).count())
    for (i <- 1 to 2) time(s"running_window_$i")(Relational.lineitemRunningWindow(li).count())
    spark.stop()
  }
}

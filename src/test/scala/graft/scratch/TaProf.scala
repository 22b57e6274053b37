package graft.scratch

import org.apache.spark.sql.SparkSession

object TaProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
      .repartition(32)
    docs.count() // warm scan
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val out = graft.operators.Corpus.threadAssembly(docs)
      val t1 = System.nanoTime()
      println(s"RUN$i CONSTRUCT ${(t1 - t0) / 1e9}")
      out.count()
      val t2 = System.nanoTime()
      println(s"RUN$i ACTION ${(t2 - t1) / 1e9}")
    }
    spark.stop()
  }
}

package graft.scratch
import org.apache.spark.sql.SparkSession
object TaCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, "/tmp/scale10")
    println("INPUT " + docs.count())
    val out = graft.operators.Corpus.threadAssembly(docs)
    println("OUTPUT " + out.count())
    spark.stop()
  }
}

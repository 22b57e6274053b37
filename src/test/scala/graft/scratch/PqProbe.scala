package graft.scratch
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    import graft.operators.Similarity
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = graft.sources.Tables.embeddings(spark, sf)
      val tr = Similarity.knnPqRecall(emb).collect()(0)
      println(s"PQ $sf trained=${tr.getAs[Double]("recall_at_k")}")
    }
    spark.stop()
  }
}

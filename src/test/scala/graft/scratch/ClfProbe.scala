package graft.scratch

import org.apache.spark.sql.functions._
import graft.operators.Classifier

object ClfProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val dim = 4096
    val feats = Classifier.hashedFeatures(docs, dim,
      Classifier.meanTokenLenLabel()).persist()
    println("n=" + feats.count() +
      " pos=" + feats.select(avg("label")).head.getDouble(0))
    for (lr <- Seq(0.2, 0.5, 1.0, 2.0); iters <- Seq(10, 20, 40)) {
      val (w, losses) = Classifier.trainLogReg(feats, dim, iters, lr,
        trackLoss = true)
      val acc = Classifier.score(docs, w, dim, Classifier.meanTokenLenLabel())
        .select(avg((col("predicted") === col("label")).cast("double")))
        .head.getDouble(0)
      println(f"lr=$lr%6.1f iters=$iters%3d acc=$acc%.3f " +
        f"loss0=${losses.head}%.4f lossN=${losses.last}%.4f")
    }
    spark.stop()
  }
}

package graft

import graft.operators.Similarity
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Tuning tool (test scope): prints the IVFPQ recall/cost surface over
  * (nProbe, rerank) so the production-path floor in ContractSpec sits
  * at a measured knee, not a guess. Run:
  * `sbt "Test/runMain graft.RecallProbe [sfDir]"`. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = TestSpark.spark
    val emb = Tables.embeddings(spark, sfDir)
    val exact = Similarity.knnBruteForce(emb).localCheckpoint()
    val books = Similarity.pqFit(emb)
    val cents = Similarity.kmeansFit(
      emb.select(col("vec_id"), col("embedding")))
    for (nProbe <- Seq(4, 6, 8, 10); rerank <- Seq(8, 16)) {
      val t0 = System.nanoTime()
      val r = Similarity.annRecall(exact,
        Similarity.knnIvfPq(emb, nProbe = nProbe, rerank = rerank,
          codebooks = Some(books), coarseCents = Some(cents)),
        s"ivfpq_p${nProbe}_r$rerank").collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROBE nProbe=$nProbe%2d rerank=$rerank%2d " +
        f"recall=${r.getAs[Double]("recall_at_k")}%.3f sec=$sec%.2f")
    }
    spark.stop()
  }
}

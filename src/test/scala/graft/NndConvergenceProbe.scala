package graft

import graft.operators.Similarity
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Measurement tool (test scope): the NN-descent convergence table
  * behind the churn-exit flag — per-round edge churn (fraction of the
  * top-k graph that changed), recall@10 against the exact baseline,
  * and wall seconds at each fixed rounds budget, then the churn-exit
  * run itself (rounds actually descended, recall, seconds). Churn is
  * computed EXTERNALLY (except() between consecutive fixed-rounds
  * graphs — the build is deterministic, so independent runs compose),
  * keeping the probe off the operator's private internals. Run:
  * `sbt "Test/runMain graft.NndConvergenceProbe [sfDir] [maxRounds] [eps]"`. */
object NndConvergenceProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val maxRounds = args.lift(1).map(_.toInt).getOrElse(6)
    val eps = args.lift(2).map(_.toDouble).getOrElse(0.05)
    val spark = TestSpark.spark
    val emb = Tables.embeddings(spark, sfDir).localCheckpoint()
    val exact = Similarity.knnBruteForce(emb).localCheckpoint()
    def recallOf(graph: org.apache.spark.sql.DataFrame): Double =
      Similarity.annRecall(exact,
        graph.where(pmod(col("node_id"), lit(100)) === 0)
          .select(col("node_id").as("query_id"), col("neighbor_id")),
        "probe").collect()(0).getAs[Double]("recall_at_k")
    var prev: Option[org.apache.spark.sql.DataFrame] = None
    for (r <- 1 to maxRounds) {
      val t0 = System.nanoTime()
      val g = Similarity.nnDescentGraph(emb, k = 10, rounds = r)
        .select(col("node_id"), col("neighbor_id")).localCheckpoint()
      val sec = (System.nanoTime() - t0) / 1e9
      val total = g.count()
      val churn = prev.map(p =>
        g.except(p).count().toDouble / total.toDouble)
      println(f"NND-ROUNDS r=$r%d sec=$sec%.2f edges=$total%d " +
        f"churn=${churn.map(c => f"$c%.4f").getOrElse("n/a")}%s " +
        f"recall=${recallOf(g)}%.3f")
      prev.foreach(_.unpersist())
      prev = Some(g)
    }
    val t0 = System.nanoTime()
    val rec = Similarity
      .nnDescentRecall(emb, rounds = maxRounds, churnExit = eps)
      .collect()(0).getAs[Double]("recall_at_k")
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"NND-EXIT eps=$eps%.3f budget=$maxRounds%d " +
      f"rounds=${Similarity.lastDescentRounds.get()}%d " +
      f"sec=$sec%.2f recall=$rec%.3f")
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    // args override the default audit set: `runMain graft.Explain q1 q2`
    val defaults = Seq("pricing_summary", "revenue_by_nation", "visits_per_minute",
      "dedup_ngram_jaccard", "knn_bruteforce", "visits_sliding",
      "sequence_packing", "pii_redaction", "user_peak_burst",
      "pricing_grouping_sets", "snapshot_upsert",
      "snapshot_diff", "dedup_incremental", "cosine_sim_histogram",
      "collocations", "visits_incremental")
    for (q <- if (args.nonEmpty) args.toSeq else defaults) {
      println(s"===== $q =====")
      SparkEntry.queries(q)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}

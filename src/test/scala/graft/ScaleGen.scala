package graft

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Scaling-curve fixture blow-up (test scope): replicate the sf0.1
  * `documents` / `embeddings` / `events` tables `factor`× with
  * deterministic per-replica perturbation, so the heaviest queries can
  * be benched at two sizes and their time-vs-rows exponents recorded
  * in SCALE.md. Perturbation matters: byte-identical replicas would
  * inflate every dup group 10× and turn near-dup pair work quadratic
  * in the factor — each replica instead gets a distinct id range, a
  * per-replica text suffix, and a tiny embedding shift, preserving the
  * original duplicate/similarity structure at 10× the rows.
  *
  * Run: `sbt "Test/runMain graft.ScaleGen <outDir> [factor] [srcDir]"`.
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/scale10")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val srcDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val spark = TestSpark.spark
    val shift = 10000000L

    def replicate(build: Int => DataFrame): DataFrame =
      (0 until factor).map(build).reduce(_ unionAll _)

    val docs = Tables.documents(spark, srcDir)
    replicate(i => docs.select(
      (col("doc_id") + lit(i * shift)).as("doc_id"),
      (if (i == 0) col("text")
       else concat(col("text"), lit(s" r$i"))).as("text"),
      col("lang"), col("source"),
      (if (i == 0) col("n_chars")
       else col("n_chars") + lit(s" r$i".length.toLong)).as("n_chars")))
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/documents.parquet")

    val emb = Tables.embeddings(spark, srcDir)
    replicate(i => emb.select(
      (col("vec_id") + lit(i * shift)).as("vec_id"),
      (if (i == 0) col("embedding")
       // 2^-10 steps: exact in float, small vs unit-scale coordinates
       else expr(s"transform(embedding, x -> x + CAST($i * 0.0009765625 AS FLOAT))"))
        .as("embedding"),
      col("label")))
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/embeddings.parquet")

    val ev = Tables.events(spark, srcDir)
    replicate(i => ev.select(
      (col("event_id") + lit(i * shift)).as("event_id"),
      col("ts"),
      (col("user_id") + lit(i * shift)).as("user_id"),
      col("event_type"), col("value"), col("props")))
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/events.parquet")

    // row-identical passthrough for the relational tables so every
    // catalog query still resolves against the blown-up dir
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem").foreach { t =>
      spark.read.parquet(s"$srcDir/$t.parquet")
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/$t.parquet")
    }
    println(s"SCALEGEN wrote $outDir at ${factor}x")
    spark.stop()
  }
}

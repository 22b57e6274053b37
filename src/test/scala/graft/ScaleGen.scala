package graft

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Scaling-curve fixture blow-up (test scope): replicate the sf0.1
  * `documents` / `embeddings` / `events` tables `factor`× with
  * deterministic per-replica perturbation, so the heaviest queries can
  * be benched at several sizes and their time-vs-rows exponents
  * recorded in SCALE.md. Perturbation matters TWICE over:
  * byte-identical replicas would inflate every dup group `factor`× —
  * but so, it turned out, does a perturbation that is too gentle. The
  * original design appended a per-replica SUFFIX to each text, which
  * left every replica sharing ~98% of its shingles with every other
  * replica of the same doc: each document became a TRUE near-dup of
  * its `factor−1` twins, and the genuine pair set grew quadratically
  * in the factor (measured: 256 / 250,600 / 2,405,400 n-gram-Jaccard
  * pairs at 1/10/30×) — the dedup scaling curve was measuring that
  * pair blow-up, not per-row operator cost. Text replicas now carry a
  * per-TOKEN tag (`tok~rI`), making each replica's token/shingle space
  * DISJOINT from every other's: the fixture is exactly "factor
  * independent shards, each with the original's internal duplicate
  * structure", which is what `factor`× more real data looks like.
  * Embeddings keep the tiny-shift scheme (2⁻¹⁰ steps — NOTE: replicas
  * remain cosine-near-dups of each other, so embedding near-dup
  * queries scaled on this fixture measure pair growth, not row cost);
  * ids get distinct ranges per replica.
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
    replicate(i => docs
      .withColumn("doc_id", col("doc_id") + lit(i * shift))
      .withColumn("text",
        if (i == 0) col("text")
        else expr(s"array_join(transform(split(text, ' '), " +
          s"t -> concat(t, '~r$i')), ' ')"))
      .withColumn("n_chars",
        if (i == 0) col("n_chars")
        else expr("CAST(length(text) AS BIGINT)"))
      .select("doc_id", "text", "lang", "source", "n_chars"))
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

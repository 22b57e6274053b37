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
  * Embedding replicas get the same treatment in vector space: each
  * replica i > 0 is mapped through a per-replica ORTHOGONAL transform
  * (cyclic coordinate shift by `17·i mod 64` composed with
  * deterministic pseudo-random sign flips). Orthogonality preserves
  * every norm and every within-replica cosine exactly in real
  * arithmetic — in IEEE terms, up to summation ORDER (the shift
  * permutes the coordinates `vec_dot` folds over, so dots drift by
  * ulps; threshold-adjacent pair counts may differ by a hair between
  * replicas, which is fine for scaling curves) — so
  * each replica keeps the original's internal near-dup/cluster
  * structure — while cross-replica cosines become sign-scrambled
  * noise (std ≈ 1/√64 ≈ 0.125, far below the 0.44 near-dup
  * threshold), exactly like `factor` independently-embedded shards.
  * The earlier tiny-shift scheme (2⁻¹⁰ steps) left every replica a
  * true cosine-near-dup of its twins — the embedding analogue of the
  * text-suffix bug. Ids get distinct ranges per replica.
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
    replicate { i =>
      // orthogonal per-replica transform: y_j = s(i,j) · x_{(j+sh) mod 64}
      // with s(i,j) = ±1 from the top bit of a Knuth multiplicative
      // hash of (i, j). Permutation + sign flips are exact in float.
      val sh = (i * 17) % 64
      emb.select(
        (col("vec_id") + lit(i * shift)).as("vec_id"),
        (if (i == 0) col("embedding")
         else expr(
           s"""transform(sequence(0, 63), j -> CAST(
              |  element_at(embedding, pmod(j + $sh, 64) + 1) *
              |  (CASE WHEN pmod((CAST(j AS BIGINT) + ${64L * i}) * 2654435761,
              |     4294967296) < 2147483648 THEN 1.0 ELSE -1.0 END)
              |AS FLOAT))""".stripMargin))
          .as("embedding"),
        col("label"))
    }.write.mode(SaveMode.Overwrite).parquet(s"$outDir/embeddings.parquet")

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

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Similarity search over the `embeddings` table (`embedding:
  * array<float>`, 64-dim).
  *
  * Two paths, as a production vector pipeline would have:
  *  - brute-force exact cosine top-k (the correctness baseline) — a
  *    broadcast of the (small) query set against the full collection,
  *    scored per-row by the codegen'd [[graft.functions.FloatVecDot]]
  *    kernel, ranked with a per-query window. Norms are computed once
  *    per vector, not once per pair. Linear in |collection|x|queries|.
  *  - multi-table random-hyperplane LSH buckets (the scale path) —
  *    deterministic ±1 hyperplanes as literal arrays, one `vec_dot`
  *    per (table, bit); candidates share a bucket in any table, then
  *    exact cosine re-ranks. At 100 TB, bucketing turns the cross
  *    product into a per-bucket join.
  *
  * Scores are double-precision sequential folds (matching the DuckDB
  * oracle's DOUBLE[] cosine); oracle-checked outputs expose only ids +
  * rank, never raw floats.
  */
object Similarity {

  /** (id, emb, norm) projection — norm computed once per vector. */
  private def withNorm(embeddings: DataFrame, idAs: String, embAs: String,
      normAs: String): DataFrame = {
    VectorFunctions.register(embeddings.sparkSession)
    embeddings.select(col("vec_id").as(idAs), col("embedding").as(embAs),
      expr("sqrt(vec_dot(embedding, embedding))").as(normAs))
  }

  /** Brute-force exact top-k: queries = vectors whose id % queryMod ==
    * 0 (a deterministic sample). Output (query_id, neighbor_id, rank).
    * The query side is tiny → broadcast; scoring streams the collection
    * once; ranking shuffles only |queries| x |collection| scored rows
    * reduced by the rank filter. */
  def knnBruteForce(embeddings: DataFrame, k: Int = 10,
      queryMod: Int = 100): DataFrame = {
    val queries = withNorm(embeddings, "query_id", "q_emb", "q_norm")
      .where(pmod(col("query_id"), lit(queryMod)) === 0)
    val scored = withNorm(embeddings, "neighbor_id", "n_emb", "n_norm")
      .join(broadcast(queries), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (expr("vec_dot(q_emb, n_emb)") / (col("q_norm") * col("n_norm")))
          .as("cos_sim"))
    scored
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("cos_sim").desc, col("neighbor_id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .orderBy("query_id", "rank")
  }

  def knnBruteForceSql(k: Int = 10, queryMod: Int = 100): String =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_emb
       |  FROM embeddings WHERE vec_id % $queryMod = 0)
       |SELECT query_id, neighbor_id, rank FROM (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY q.query_id
       |      ORDER BY list_cosine_similarity(q.q_emb,
       |        CAST(e.embedding AS DOUBLE[])) DESC, e.vec_id) AS rank
       |  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id)
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** Embedding-cosine near-dup pairs above `threshold` — id-only output
    * (no float in the hash-compared result). All-pairs here (collection
    * is small at test scale); [[lshKeys]] bucketing is the scale path
    * for the same predicate. The pair join carries precomputed norms so
    * the per-pair work is exactly one codegen'd dot product. */
  def embeddingNearDup(embeddings: DataFrame,
      threshold: Double = 0.44): DataFrame = {
    val a = withNorm(embeddings, "vec_id_a", "emb_a", "norm_a")
    val b = withNorm(embeddings, "vec_id_b", "emb_b", "norm_b")
    a.join(b, col("vec_id_a") < col("vec_id_b"))
      .where((expr("vec_dot(emb_a, emb_b)") / (col("norm_a") * col("norm_b")))
        >= threshold)
      .select("vec_id_a", "vec_id_b")
      .orderBy("vec_id_a", "vec_id_b")
  }

  def embeddingNearDupSql(threshold: Double = 0.44): String =
    s"""SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
       |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
       |  CAST(b.embedding AS DOUBLE[])) >= $threshold
       |ORDER BY 1, 2""".stripMargin

  /** Deterministic ±1 hyperplane (table t, bit j) via a splitmix64-style
    * mix — generated driver-side as a literal array so the projection is
    * a single codegen'd `vec_dot`. */
  private def hyperplane(t: Int, j: Int, dim: Int): Array[Float] =
    Array.tabulate(dim) { i =>
      var z = t.toLong * 0x9E3779B97F4A7C15L + j.toLong * 0xC2B2AE3D27D4EB4FL +
        i.toLong + 0x165667B19E3779F9L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^= z >>> 31
      if ((z & 1L) == 0L) -1f else 1f
    }

  /** Multi-table random-hyperplane LSH keys: `nTables` independent
    * signatures of `nBits` bits each; bit j of table t = sign of
    * <v, h_{t,j}>. A vector emits one (table_id, bucket) row per table;
    * vectors sharing any table's bucket are ANN candidates — multiple
    * tables trade compute for recall exactly like a production IVF/LSH
    * index. */
  def lshKeys(embeddings: DataFrame, nBits: Int = 6, nTables: Int = 4,
      dim: Int = 64): DataFrame = {
    VectorFunctions.register(embeddings.sparkSession)
    val tableCols = (0 until nTables).map { t =>
      val bits: Column = (0 until nBits).map { j =>
        val h = typedLit(hyperplane(t, j, dim))
        when(call_function("vec_dot", col("embedding"), h) >= 0,
          lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(t).as("table_id"), bits.as("bucket"))
    }
    embeddings.select(col("vec_id"), col("embedding"),
      explode(array(tableCols: _*)).as("tb"))
      .select(col("vec_id"), col("embedding"),
        col("tb.table_id").as("table_id"), col("tb.bucket").as("bucket"))
  }

  /** ANN top-k via multi-table LSH bucketing + exact re-rank of the
    * candidate union. Approximate: a neighbor missed by every table is
    * lost — rows-only query, recall measured against [[knnBruteForce]]
    * in tests. */
  def knnLsh(embeddings: DataFrame, k: Int = 10, queryMod: Int = 100,
      nBits: Int = 6, nTables: Int = 4): DataFrame = {
    // both the query side and the candidate side consume the keyed
    // frame — persist the 32-projection hashing pass
    val keyed = lshKeys(embeddings, nBits, nTables)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val queries = keyed
      .where(pmod(col("vec_id"), lit(queryMod)) === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("table_id").as("q_table"), col("bucket").as("q_bucket"))
    val candidates = keyed
      .join(broadcast(queries),
        col("table_id") === col("q_table") &&
          col("bucket") === col("q_bucket") &&
          col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("q_emb"),
        col("vec_id").as("neighbor_id"), col("embedding"))
      .distinct()
    val scored = candidates
      .select(col("query_id"), col("neighbor_id"),
        (expr("vec_dot(q_emb, embedding)") /
          (expr("sqrt(vec_dot(q_emb, q_emb))") *
            expr("sqrt(vec_dot(embedding, embedding))"))).as("cos_sim"))
    scored
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("cos_sim").desc, col("neighbor_id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .orderBy("query_id", "rank")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`embedding:
  * array<float>`, 64-dim).
  *
  * Two paths, as a production vector pipeline would have:
  *  - brute-force exact cosine top-k (the correctness baseline) — a
  *    broadcast of the (small) query set against the full collection,
  *    scored per-row inside codegen via `zip_with`/`aggregate`, ranked
  *    with a per-query window. Linear in |collection| x |queries|.
  *  - random-hyperplane LSH buckets (the scale path) — each vector
  *    hashed to a `nBits`-bit signature by deterministic pseudo-random
  *    hyperplanes; candidates share a bucket, then exact cosine
  *    re-ranks. At 100 TB, bucketing turns the cross product into a
  *    per-bucket join.
  *
  * Scores are computed in double precision left-to-right (both here and
  * in the DuckDB oracle, which casts to DOUBLE[] first); oracle-checked
  * outputs expose only ids + rank, never raw floats.
  */
object Similarity {

  /** Exact cosine similarity of two float-array columns, accumulated in
    * double, sequential left fold — codegen'd, no UDF. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: String, y: String) =
      s"aggregate(zip_with($x, $y, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), " +
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    expr(s"${dot(a.toString, b.toString)} / " +
      s"(sqrt(${dot(a.toString, a.toString)}) * sqrt(${dot(b.toString, b.toString)}))")
  }

  /** Brute-force exact top-k: queries = vectors whose id % queryMod ==
    * 0 (a deterministic sample). Output (query_id, neighbor_id, rank).
    * The query side is tiny → broadcast; scoring streams the collection
    * once; ranking shuffles only |queries| x |collection| scored rows
    * reduced by the rank filter. */
  def knnBruteForce(embeddings: DataFrame, k: Int = 10,
      queryMod: Int = 100): DataFrame = {
    val queries = embeddings
      .where(pmod(col("vec_id"), lit(queryMod)) === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = embeddings
      .join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("q_emb"), col("embedding")).as("cos_sim"))
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
    * (no float in the hash-compared result). Brute force all-pairs here
    * (collection is small at test scale); [[lshBuckets]] is the scale
    * path for the same predicate. */
  def embeddingNearDup(embeddings: DataFrame,
      threshold: Double = 0.44): DataFrame = {
    val a = embeddings.select(col("vec_id").as("vec_id_a"),
      col("embedding").as("emb_a"))
    val b = embeddings.select(col("vec_id").as("vec_id_b"),
      col("embedding").as("emb_b"))
    a.join(b, col("vec_id_a") < col("vec_id_b"))
      .select(col("vec_id_a"), col("vec_id_b"),
        cosine(col("emb_a"), col("emb_b")).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
      .select("vec_id_a", "vec_id_b")
      .orderBy("vec_id_a", "vec_id_b")
  }

  def embeddingNearDupSql(threshold: Double = 0.44): String =
    s"""SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
       |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
       |  CAST(b.embedding AS DOUBLE[])) >= $threshold
       |ORDER BY 1, 2""".stripMargin

  /** Multi-table random-hyperplane LSH keys: `nTables` independent
    * signatures of `nBits` bits each; bit j of table t = sign of
    * <v, h_{t,j}> where hyperplane component i is a deterministic ±1
    * derived from xxhash64(t, j, i). A vector emits one (table_id,
    * bucket) row per table; vectors sharing any table's bucket are ANN
    * candidates — multiple tables trade compute for recall exactly like
    * a production IVF/LSH index. */
  def lshKeys(embeddings: DataFrame, nBits: Int = 8,
      nTables: Int = 4): DataFrame = {
    val tableCols = (0 until nTables).map { t =>
      val bitCols = (0 until nBits).map { j =>
        // sum_i emb[i] * (hash(t,j,i) -> ±1), sequential double fold
        val proj = s"aggregate(zip_with(embedding, sequence(0, size(embedding) - 1), " +
          s"(x, i) -> CAST(x AS DOUBLE) * (CAST(pmod(xxhash64(concat('${t}_${j}_', i)), 2) AS DOUBLE) * 2.0 - 1.0)), " +
          "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        when(expr(proj) >= 0, lit(1L << j)).otherwise(0L)
      }
      struct(lit(t).as("table_id"), bitCols.reduce(_ + _).as("bucket"))
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
      nBits: Int = 8, nTables: Int = 4): DataFrame = {
    val keyed = lshKeys(embeddings, nBits, nTables)
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
        cosine(col("q_emb"), col("embedding")).as("cos_sim"))
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

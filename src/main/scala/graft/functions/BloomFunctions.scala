package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** `bloom_agg(xxhash64(key), n_items, n_bits)` / `bloom_probe(bloom,
  * xxhash64(key))` — the engine's Bloom-filter surface, re-exposing
  * Spark's OWN runtime-filter machinery
  * (`BloomFilterAggregate` / `BloomFilterMightContain`, the codegen'd
  * expressions Catalyst injects for runtime join pruning) as explicit
  * SQL functions a pipeline can drive deliberately.
  *
  * Why explicit when Catalyst already injects them: runtime bloom
  * filters live and die inside ONE query. An incremental dedup gate
  * wants the opposite lifecycle — build the filter over the corpus
  * ONCE (a map-side-combined aggregate producing a single binary blob,
  * megabytes for millions of keys), persist/broadcast it, and probe
  * every future batch scan-side with zero corpus I/O. The blob is the
  * standard `org.apache.spark.util.sketch.BloomFilter` serialization,
  * so it round-trips through parquet/files across jobs.
  *
  * Both sides hash with `xxhash64` (LongType in, as the aggregate
  * requires); `bloom_probe`'s filter argument must be foldable (a
  * literal/broadcast blob), matching the upstream expression contract.
  */
object BloomFunctions {

  val aggBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 3,
      s"bloom_agg(key, n_items, n_bits) takes 3 arguments, got ${exprs.length}")
    new BloomFilterAggregate(exprs(0), exprs(1), exprs(2), 0, 0)
  }

  val probeBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2,
      s"bloom_probe(bloom, key) takes 2 arguments, got ${exprs.length}")
    new BloomFilterMightContain(exprs(0), exprs(1))
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_agg", aggBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_probe", probeBuilder, "built-in")
  }
}

package graft.functions

import org.apache.spark.sql.SparkSession

/** Memoized once-per-session registration of every graft function.
  *
  * Operators guard their SQL-facing expressions with
  * `Registry.ensure(df.sparkSession)` instead of calling the
  * individual `X.register` helpers: the first call in a session
  * registers the full surface, every later call is a lock-free set
  * probe. This keeps registration work (and the
  * `SimpleFunctionRegistry ... replaced a previously registered
  * function` WARN it emits on re-registration) out of hot paths and
  * timed bench regions.
  *
  * Cluster deployments that set
  * `spark.sql.extensions=graft.GraftExtensions` get the same surface
  * injected at session build; `ensure` then re-registers once per
  * session with identical builders, so both routes stay equivalent.
  */
object Registry {
  /** Sessions already registered, weakly held so stopped sessions
    * GC normally; the map is tiny (sessions per JVM) and accesses are
    * cheap enough for hot paths under the synchronized guard. */
  private val done = new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()

  def ensure(spark: SparkSession): Unit =
    if (done.synchronized { done.put(spark, java.lang.Boolean.TRUE) == null }) {
      VectorFunctions.register(spark)
      VecSumAgg.register(spark)
      GramAgg.register(spark)
      MinHashFunctions.register(spark)
      SimHashFunctions.register(spark)
      WinnowFingerprints.register(spark)
      PolyHash62.register(spark)
      TopKSketchFunctions.register(spark)
      NgramStats.register(spark)
      BoundedCollectFunctions.register(spark)
      ZValue.register(spark)
      CharNgrams.register(spark)
      BloomFunctions.register(spark)
    }
}

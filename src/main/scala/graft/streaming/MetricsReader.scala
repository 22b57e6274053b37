package graft.streaming

/** The dashboard's READ face — the five query shapes the reference's
  * controller issues against Redis (MGET / PFCOUNT / SCARD /
  * SINTERSTORE+SCARD, dashboard/.../TimeseriesMetricsController.java:45-136),
  * as a trait so the serving layer points at EITHER the in-memory
  * [[MetricsStore]] or a live Redis via
  * [[graft.store.RedisMetricsSink]] — completing the reference
  * topology end-to-end: Spark writes the store, the dashboard reads it,
  * and neither side knows which store it is.
  */
trait MetricsReader {
  /** Counter read (Redis GET, nil→0). */
  def counter(key: String): Long
  /** Exact set cardinality (Redis SCARD). */
  def scard(key: String): Long
  /** Approx-distinct estimate (Redis PFCOUNT). In-memory stores serve
    * whatever their [[KeyValueMetricsSink.pfadd]] fake keeps; stores
    * fed a materialized estimate via `put` serve that. */
  def hllCount(key: String): Long
  /** Pairwise exact set intersection over a key family
    * (SINTERSTORE+SCARD per unordered pair, controller :109-136);
    * returned dimension names have `prefix` stripped. */
  def overlap(prefix: String): Seq[(String, String, Long)]
  /** The sketch twin of [[overlap]]: intersection ESTIMATES over
    * serialized theta sketches — the only serving shape whose state
    * stays KB-sized at 100 TB of distinct users. Default: none kept. */
  def overlapApprox(prefix: String): Seq[(String, String, Long)] = Nil

  /** Q1–Q3 read shape: last N closed minutes before `nowMinute`
    * (exclusive), zero-filled — derived entirely from [[counter]] /
    * [[scard]], so every store serves it
    * (TimeseriesMetricsController.java:144-152). */
  def timeseries(prefix: String, nowMinute: java.time.LocalDateTime,
      lastMinutes: Int, fromSets: Boolean = false): Seq[(String, Long)] = {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy_MM_dd'T'HH_mm")
    (lastMinutes to 1 by -1).map { back =>
      val m = nowMinute.minusMinutes(back).format(fmt)
      val key = s"${prefix}_$m"
      m -> (if (fromSets) scard(key) else counter(key))
    }
  }
}

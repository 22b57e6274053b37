package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Per-group token-count statistics produced by [[TokenStatsAggregator]]. */
case class TokenStats(n_docs: Long, total_tokens: Long,
    min_tokens: Long, max_tokens: Long)

/** The engine's public typed-UDAF face: an `Aggregator[IN, BUF, OUT]`
  * (the user-facing API for custom aggregation — the internal
  * `TypedImperativeAggregate`s elsewhere in this package are engine
  * extensions, not something a library user writes). Registered with
  * `functions.udaf(...)` it participates in partial aggregation like
  * any built-in: `reduce` runs map-side, `merge` combines partial
  * buffers after the shuffle — the same mergeable-state contract the
  * reference delegates to Redis commands.
  *
  * All-integer state makes it order-insensitive and therefore exactly
  * reproducible (a Double-summing aggregator would be partition-order
  * dependent and could never hash-match an oracle). */
object TokenStatsAggregator extends Aggregator[Long, TokenStats, TokenStats] {
  override def zero: TokenStats =
    TokenStats(0L, 0L, Long.MaxValue, Long.MinValue)
  override def reduce(b: TokenStats, tok: Long): TokenStats =
    TokenStats(b.n_docs + 1, b.total_tokens + tok,
      math.min(b.min_tokens, tok), math.max(b.max_tokens, tok))
  override def merge(x: TokenStats, y: TokenStats): TokenStats =
    TokenStats(x.n_docs + y.n_docs, x.total_tokens + y.total_tokens,
      math.min(x.min_tokens, y.min_tokens), math.max(x.max_tokens, y.max_tokens))
  override def finish(r: TokenStats): TokenStats = r
  override def bufferEncoder: Encoder[TokenStats] = Encoders.product[TokenStats]
  override def outputEncoder: Encoder[TokenStats] = Encoders.product[TokenStats]
}

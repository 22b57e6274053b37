package graft.sources

import scala.util.Random

/** Deterministic replica of the reference's load generator
  * (reference: loggen/message_generator.py) — same event model, with
  * the two nondeterminism sources pinned so tests and parity replays
  * are reproducible:
  *
  *  - WALL CLOCK → a simulated clock: event `i` is emitted at
  *    `startEpochSec + i/eventsPerSec` (the reference reads
  *    `time.time()` per event);
  *  - RNG → a seeded generator.
  *
  * Model replicated:
  *  - `build_user_id` (message_generator.py:58-76): uid drawn from the
  *    drifting overlapping range
  *    `[elapsed_tens_minutes + present_millis,
  *      (10 + elapsed_tens_minutes) * present_millis]` where
  *    `elapsed_tens_minutes` grows every 10 simulated minutes and
  *    `present_millis` is the emission instant's millisecond part
  *    (0 → a random 1..1000) — a slowly-drifting id population with
  *    heavy minute-over-minute overlap, which is what exercises the
  *    distinct/overlap metrics. When the range inverts (late-session
  *    small millis — the reference would raise), the lower bound wins.
  *  - `build_message` (message_generator.py:78-88): experiment_id
  *    uniform 1..100, variant uniform over
  *    `['default', '1', '2', '3']` (message_generator.py:46),
  *    timestamp rendered second-precision `%Y-%m-%dT%H:%M:%SZ`.
  *  - Wire format (message_generator.py:90-97): one JSON object per
  *    message, numeric uid/experiment_id, string variant/timestamp.
  */
object Loggen {

  /** _EXPERIMENT_VARIANTS (message_generator.py:46). */
  val Variants: IndexedSeq[String] = IndexedSeq("default", "1", "2", "3")

  private val WireFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")
    .withZone(java.time.ZoneOffset.UTC)

  /** `n` wire messages from the simulated run. */
  def wireMessages(n: Int, seed: Long = 42L,
      startEpochSec: Long = 1770000000L, eventsPerSec: Int = 50): Seq[String] = {
    val rng = new Random(seed)
    (0 until n).map { i =>
      val tMillis = startEpochSec * 1000L + i.toLong * 1000L / eventsPerSec
      val tSec = tMillis / 1000L
      // build_user_id: drifting overlapping range
      val elapsedTensMinutes = ((tSec - startEpochSec) / 600L).toInt + 1
      val presentMillis0 = (tMillis % 1000L).toInt
      val presentMillis =
        if (presentMillis0 == 0) 1 + rng.nextInt(1000) else presentMillis0
      val lo = elapsedTensMinutes + presentMillis
      val hi = (10 + elapsedTensMinutes) * presentMillis
      val uid = if (hi >= lo) lo + rng.nextInt(hi - lo + 1) else lo
      val expId = 1 + rng.nextInt(100)
      val variant = Variants(rng.nextInt(Variants.length))
      val ts = WireFmt.format(java.time.Instant.ofEpochSecond(tSec))
      s"""{"uid": $uid, "experiment_id": $expId, "variant": "$variant", "timestamp": "$ts"}"""
    }
  }
}

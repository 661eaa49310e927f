package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The failure-path half of the streaming sink's exactly-once claim
  * (the happy path runs under a real query in StreamingSpec): if a
  * query dies between the sink commit and Spark's commit-log write,
  * the engine REPLAYS the epoch with the same id on restart. The
  * registry is keyed by epoch id, so the replay must be a no-op.
  */
class CountingSinkReplaySpec extends AnyFunSuite {

  test("replayed epoch commit is a no-op (exactly-once across restarts)") {
    CountingSink.recordEpoch("replay-spec", 0L, 10L)
    CountingSink.recordEpoch("replay-spec", 1L, 5L)
    // Crash after the sink committed epoch 1 but before the offset log
    // recorded it — restart re-runs epoch 1 and commits it again.
    CountingSink.recordEpoch("replay-spec", 1L, 5L)
    assert(CountingSink.committedRows("replay-spec").contains(15L))
    assert(CountingSink.committedTasks("replay-spec").contains(2))
    assert(CountingSink.committedEpochs("replay-spec") == List(0L, 1L))
  }
}

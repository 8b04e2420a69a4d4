package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamOps

/** Child-JVM driver for the CROSS-PROCESS streaming restart proof
  * (RestartSpec): runs the three standing-index foreachBatch sinks —
  * dedup delta-log, incremental connected components, quality-quota
  * histogram — off a file-based readStream with a REAL
  * checkpointLocation, one input file per micro-batch
  * (maxFilesPerTrigger=1 under Trigger.AvailableNow).
  *
  * `crashAfterBatch >= 0` simulates the exact failure window the
  * batch-marker discipline exists for: the batch's states are fully
  * PUBLISHED (publishAtomic renamed them live, _GRAFT_BATCH marker
  * and all) but the JVM dies via Runtime.halt — no shutdown hooks, no
  * streaming commit-log entry — so Spark never ACKNOWLEDGED the
  * batch. A fresh JVM restarting from the same checkpoint replays
  * that batch id; the marker (additive states) / per-batch overwrite
  * (delta-log states) must make the replay a no-op, and every
  * still-unread input file must then flow through normally.
  *
  * Exit codes: 0 = ran to completion (source exhausted), 42 = the
  * deliberate post-publish halt. Anything else is a real failure.
  *
  * args: inputDir checkpointDir stateRoot crashAfterBatch(-1 = never)
  *       [dedupForm: plain (default) | tiered] [haltSegment|-]
  *
  * `tiered` swaps the dedup sink for
  * [[StreamOps.dedupIndexForeachBatchTiered]] at maxDeltas=2/fanout=2,
  * so compaction (and tier merges) fire around the crash boundary —
  * the replayed batch then re-creates its delta NEXT TO a segment
  * already holding the same hashes, the exact absorb case the tiered
  * form documents, now across real process death.
  *
  * `haltSegment` (e.g. `d=c1`) arms the compactor's crash-injection
  * point instead: the JVM halts(43) INSIDE the tiered compaction,
  * after that segment's publish rename but before its source deletes
  * — the round-15 ADVICE window where a replayed compaction used to
  * delete a published segment whose hashes its replayed sources no
  * longer carried.
  */
object RestartDriver {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4 && args.length <= 6,
      "usage: RestartDriver <inputDir> <checkpointDir> <stateRoot> " +
        "<crashAfterBatch|-1> [plain|tiered] [haltSegment|-]")
    val Seq(inputDir, checkpointDir, stateRoot, crashAtRaw) =
      args.take(4).toSeq
    val crashAfter = crashAtRaw.toLong
    val tiered = args.length >= 5 && args(4) == "tiered"
    if (args.length == 6 && args(5) != "-")
      sys.props("graft.test.haltAfterSegmentPublish") = args(5)
    val spark = graft.core.Sessions.build("graft-restart-driver", 8)

    val dedupSink =
      if (tiered) StreamOps.dedupIndexForeachBatchTiered(
        s"$stateRoot/index", s"$stateRoot/flags", "doc_id", "text",
        maxDeltas = 2, fanout = 2)
      else StreamOps.dedupIndexForeachBatch(
        s"$stateRoot/index", s"$stateRoot/flags", "doc_id", "text")
    val ccSink = StreamOps.componentsForeachBatch(
      s"$stateRoot/cc", "src", "dst")
    val quotaSink = StreamOps.quotaForeachBatch(
      s"$stateRoot/quota", "source", "doc_id", "text")

    val docs = spark.readStream
      .schema("doc_id LONG, source STRING, text STRING, " +
        "src LONG, dst LONG")
      .option("maxFilesPerTrigger", 1)
      .parquet(inputDir)

    val query = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        dedupSink(batch, batchId)
        ccSink(batch, batchId)
        quotaSink(batch, batchId)
        println(s"RESTARTDRIVER published batch=$batchId")
        if (crashAfter >= 0 && batchId == crashAfter) {
          println(s"RESTARTDRIVER halting post-publish batch=$batchId")
          Console.flush()
          // halt, not exit: shutdown hooks must NOT run, so the
          // streaming commit log for this batch is never written —
          // the published-but-unacknowledged window under test.
          Runtime.getRuntime.halt(42)
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    println("RESTARTDRIVER done")
    spark.stop()
    // local-mode Spark leaves non-daemon threads; exit explicitly
    sys.exit(0)
  }
}

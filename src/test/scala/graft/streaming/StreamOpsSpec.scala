package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Anomalies.AnomalyRule

case class Ev(ts: Timestamp, event_type: String, value: Double)

class StreamOpsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("batch cleaning + anomaly operators run unchanged on a stream " +
    "(MemoryStream -> transform -> memory sink)") {
    import s.implicits._
    implicit val sq = s.sqlContext
    val input = MemoryStream[Ev]
    val rules = Seq(AnomalyRule("big", col("value") > 100))
    val q = StreamOps.cleanAndFlag(input.toDF(), rules)
      .writeStream.format("memory").queryName("flagged")
      .outputMode("append").start()
    try {
      input.addData(
        Ev(Timestamp.valueOf("2024-01-01 00:00:01"), "click", 5.0),
        Ev(Timestamp.valueOf("2024-01-01 00:00:02"), "", 500.0))
      q.processAllAvailable()
      val out = s.sql("SELECT event_type, anomaly_type FROM flagged")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      // empty event_type cleaned to 'unknown'; value 500 flagged 'big'
      assert(out == Set(("click", "ok"), ("unknown", "big")))
    } finally q.stop()
  }

  test("windowed counts with watermark aggregate per minute") {
    import s.implicits._
    implicit val sq = s.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamOps.windowedTypeCounts(input.toDF(), "ts")
      .writeStream.format("memory").queryName("wincounts")
      .outputMode("complete").start()
    try {
      input.addData(
        Ev(Timestamp.valueOf("2024-01-01 00:00:10"), "click", 1.0),
        Ev(Timestamp.valueOf("2024-01-01 00:00:20"), "click", 2.0),
        Ev(Timestamp.valueOf("2024-01-01 00:01:10"), "click", 4.0))
      q.processAllAvailable()
      val out = s.sql("SELECT event_type, n, value_sum FROM wincounts")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(out == Set(("click", 2L, 3.0), ("click", 1L, 4.0)))
    } finally q.stop()
  }
}

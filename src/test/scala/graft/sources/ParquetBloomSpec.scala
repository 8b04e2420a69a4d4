package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ParquetBloomSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("writeParquetBloom embeds a real footer bloom filter that is " +
    "one-sided (members always hit, absent needles mostly miss), and " +
    "the data round-trips losslessly") {
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pq_bloom").toString + "/t"
    val rows = (0L until 5000L).map(i => (i, s"hash_$i"))
    Formats.writeParquetBloom(rows.toDF("id", "h").repartition(1),
      dir, Seq("h"), expectedNdv = 5000L)

    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      new Path(file.getAbsolutePath),
      s.sparkContext.hadoopConfiguration))
    try {
      val rg = reader.getRowGroups.get(0)
      val col = rg.getColumns.asScala
        .find(_.getPath.toDotString == "h").get
      assert(col.getBloomFilterOffset > 0,
        "no bloom filter offset recorded in the footer")
      val bf = reader.getBloomFilterDataReader(rg).readBloomFilter(col)
      assert(bf != null, "footer bloom filter unreadable")
      // no false negatives, ever
      (0L until 5000L).foreach { i =>
        assert(bf.findHash(bf.hash(
          Binary.fromString(s"hash_$i"))), s"member hash_$i missed")
      }
      // absent needles: overwhelmingly rejected (fpp ~1% default)
      val fps = (0 until 2000)
        .count(i => bf.findHash(bf.hash(Binary.fromString(s"nope_$i"))))
      assert(fps < 2000 * 0.05, s"false-positive count $fps too high")
    } finally reader.close()

    val back = s.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == rows.toSet, "bloom-written file must round-trip")
    // a pushed-down point lookup stays correct through the bloom path
    assert(s.read.parquet(dir).filter(col("h") === "hash_42")
      .collect().map(_.getLong(0)).toSeq == Seq(42L))
    assert(s.read.parquet(dir).filter(col("h") === "absent")
      .count() == 0L)
  }
}

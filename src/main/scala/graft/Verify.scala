package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated name prefixes — dump (and list in
    // oracle_sql.json) only matching queries, for fast local iteration;
    // the driver always calls with exactly two args = full registry
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, Array.empty[String])
      case Array(s, o, f) => (s, o, f.split(','))
      case _ => sys.error(
        "usage: graft.Verify <sfDir> <outDir> [prefix1,prefix2,...] — " +
          "prefixes are ONE comma-separated arg, not separate args")
    }
    def keep(name: String) =
      only.isEmpty || only.exists(name.startsWith)
    val spark = graft.core.Sessions.build("graft-verify",
      graft.core.Sessions.cpusFromEnv(4))
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (keep(name))
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

package graft.core

import org.apache.spark.sql.SparkSession

/** Single place where every entry point (Verify, Bench, tests, ad-hoc mains)
  * builds its SparkSession, so the semantic-critical confs cannot drift.
  *
  * Confs that change query *results* (and therefore must match the DuckDB
  * oracle the driver compares against):
  *  - session time zone UTC: timestamp<->date casts are zone-sensitive, and
  *    [[Tables.eventTsUs]]'s NTZ->TIMESTAMP cast only matches DuckDB's
  *    epoch_us under UTC.
  *  - nanosAsLong: inert for the current TIMESTAMP(MICROS) testdata, kept so
  *    a TIMESTAMP(NANOS) events regeneration (seen in earlier testdata drops,
  *    which Spark has no type for) reads as epoch-nano BIGINT instead of
  *    failing the scan.
  */
object Sessions {

  /** JDK-17 module opens Spark 4 needs outside spark-submit — the
    * build.sbt fork list; executor JVMs launched by a local-cluster
    * Worker need them injected explicitly. */
  private val jdk17AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")

  def build(appName: String, cores: Int): SparkSession = {
    // SPARK_GRAFT_MASTER overrides the master for the multi-JVM
    // execution proof: `local-cluster[2,16,4096]` runs REAL separate
    // executor JVMs (a true serialization boundary — closure capture,
    // executor-side lazy init, broadcast lifecycle all real), which
    // local[n]'s single JVM cannot test. Executors are fresh JVMs
    // launched from SPARK_HOME, so they need this build's classes
    // (the driver's own classpath) and the JDK-17 opens on their
    // command line.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cores]")
    if (master.startsWith("local-cluster")) {
      // The Worker launches executors through the launcher library,
      // which infers the Scala suffix from SPARK_HOME's build dirs — a
      // layout a jars-only install doesn't have. Without the env the
      // executors die at launch with "Cannot find any build
      // directories." before the app sees a single task.
      require(sys.env.contains("SPARK_SCALA_VERSION"),
        "local-cluster mode needs SPARK_SCALA_VERSION=2.13 (and " +
          "SPARK_HOME) exported so the in-process Worker can build " +
          "executor launch commands from a jars-only Spark install")
    }
    val builder0 = SparkSession.builder()
      .master(master)
      .appName(appName)
      .withExtensions(new graft.plans.GraftExtensions)
    val builder =
      if (!master.startsWith("local-cluster")) builder0
      else builder0
        .config("spark.executor.memory",
          sys.env.getOrElse("SPARK_GRAFT_EXECUTOR_MEM", "4g"))
        .config("spark.executor.extraClassPath",
          System.getProperty("java.class.path"))
        .config("spark.executor.extraJavaOptions", jdk17AddOpens)
    val s = builder
      // One shuffle partition per core: at local[32] the driver contract asks
      // for 32, not the 200 default sized for real clusters. AQE coalesces
      // further when partitions come out small.
      .config("spark.sql.shuffle.partitions", cores.toString)
      // AQE SMJ->shuffled-hash conversion: OFF (Spark default),
      // REVERTING round 16's 64m threshold on round-17 measurements.
      // (a) Gate-SF effect is noise: a within-JVM ALTERNATING A/B
      // (ProbeR17 shjab — both arms share JIT warmup, unlike round
      // 16's ordered A/B) reads every converted query inside +/-6% at
      // sf0.1 (l61 0.96x, l2b 0.98x, l49 0.99x, l54h 1.14x...).
      // (b) At 50x corpus scale (250k docs) the conversion is a CRASH:
      // l61's candidate join dies with SparkOutOfMemoryError "not
      // enough memory to build hash map", reproducibly — a 64 MB
      // compressed-shuffle-bytes partition expands several-fold as an
      // in-memory hash map, and 32 concurrent build tasks share
      // ~0.6*heap of execution memory, so the per-partition gate does
      // not bound peak usage (guide §3.1's stated SHJ risk). With the
      // conversion off the same join sort-merge-spills and completes
      // (94.5 s cold / 53.3 s warm, same box). A deployment with real
      // per-core memory headroom can opt in via the env.
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHJ_LOCALMAP", "0"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // Performance-only, result-inert: keep bucketed scans BUCKETED
      // even in plans the heuristic thinks don't benefit. The heuristic
      // breaks the iterative-graph cold start: a cache()d edge frame's
      // InMemoryRelation plan is compiled STANDALONE at registration
      // time, sees no join, silently drops the bucket layout — and
      // every iteration then re-exchanges the edge list the table was
      // bucketed to avoid (GraphRank.pageRankFromBucketed/
      // componentsFromBucketed, GraphRankSpec pins the partitioning).
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled",
        "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def cpusFromEnv(default: Int): Int =
    sys.env.get("SPARK_GRAFT_CPUS").flatMap(_.toIntOption).getOrElse(default)
}

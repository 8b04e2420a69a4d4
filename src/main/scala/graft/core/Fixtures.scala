package graft.core

/** Deterministic local test fixtures under `java.io.tmpdir`, built
  * ATOMICALLY: the builder fills a process-unique staging sibling and
  * a single directory RENAME publishes it, so the published path only
  * ever holds a COMPLETE fixture — no marker files, no wipe-then-
  * rebuild window in which a concurrent JVM (a bench next to a verify
  * sharing /tmp) could observe, scan, or delete a half-built tree. A
  * publish race has exactly one winner (rename fails if the target
  * exists); the loser discards its own staging copy and reads the
  * winner's.
  *
  * LOCAL-MODE-ONLY by design: builders may write from executor tasks
  * (`foreachPartition`), which on a real cluster lands on EXECUTOR-
  * local disks where the driver-side read-back would find nothing.
  * These fixtures exist to feed the local[n] verify/bench gates; a
  * cluster deployment would stage equivalent fixtures to shared
  * storage out of band.
  */
object Fixtures {

  /** The published fixture dir for `name`, building it first if no
    * complete copy exists. `build` receives the STAGING dir and must
    * fully populate it; publication and cleanup are handled here.
    */
  def ensure(name: String)(build: java.io.File => Unit): java.io.File = {
    val base = new java.io.File(
      System.getProperty("java.io.tmpdir"), name)
    if (!base.exists()) {
      val staging = new java.io.File(base.getParentFile,
        name + "__build_" + java.util.UUID.randomUUID().toString)
      staging.mkdirs()
      build(staging)
      if (staging.renameTo(base)) {
        Runtime.getRuntime.addShutdownHook(
          new Thread(() => wipe(base)))
      } else {
        // another JVM published first — its copy is complete (the
        // rename discipline guarantees it); drop ours
        wipe(staging)
      }
    }
    base
  }

  def wipe(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(wipe)
    f.delete(); ()
  }
}

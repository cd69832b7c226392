package graft.io

/** Process-scoped scratch root for the temp tables, sinks and streaming
  * checkpoints the declared queries write and re-read (guide §6: scratch
  * I/O belongs on the fastest local storage available — on a production
  * executor its local SSDs; on this single box /dev/shm, the same choice
  * `Bench.session` makes for shuffle blocks, because the one shared
  * spinning disk is measurement environment, not job property).
  *
  * Parameterised for other deployments: `SPARK_GRAFT_SCRATCH_DIR`
  * overrides the root; when /dev/shm is absent (or the override unset on
  * a tmpfs-less host) it falls back to `java.io.tmpdir`, so behaviour is
  * identical to the plain `Files.createTempDirectory` it replaces.
  *
  * Every directory lives under one per-process root that a JVM shutdown
  * hook removes recursively — bounded residency, nothing keyed on the
  * input data survives the process (no cross-run reuse is possible).
  */
object Scratch {
  private lazy val root: java.nio.file.Path = {
    val base = sys.env.get("SPARK_GRAFT_SCRATCH_DIR")
      .map(java.nio.file.Paths.get(_))
      .orElse {
        val shm = java.nio.file.Paths.get("/dev/shm")
        if (java.nio.file.Files.isDirectory(shm) &&
            java.nio.file.Files.isWritable(shm)) Some(shm.resolve("graft-scratch"))
        else None
      }
      .getOrElse(java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")))
    val p = base.resolve(s"pid-${ProcessHandle.current().pid()}")
    java.nio.file.Files.createDirectories(p)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(p.toFile)))
    p
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
    ()
  }

  /** A fresh scratch directory (drop-in for
    * `java.nio.file.Files.createTempDirectory(prefix)`). */
  def dir(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(root, prefix)
}

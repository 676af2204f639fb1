package graft.streaming

/** Scratch roots for declared queries that build a REAL maintained index
  * per invocation (x79, x80): a fresh temp directory per call, registered
  * for deletion at JVM exit (the returned DataFrames read the scratch
  * index lazily, so the root cannot be deleted eagerly), with a sweep of
  * same-prefix siblings older than an hour — killed-JVM leftovers must
  * not accrete data-sized temp dirs across repeated bench/verify runs
  * (the Bench deleteTree rationale). */
private[streaming] object ScratchRoots {

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }

  /** Create a scratch root under the system temp dir with `prefix`,
    * register its exit-time deletion, and sweep stale siblings. */
  def create(prefix: String): String = {
    val root = java.nio.file.Files.createTempDirectory(prefix).toString
    val f = new java.io.File(root)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(f)))
    Option(f.getParentFile.listFiles()).foreach(_.foreach { sib =>
      if (sib.getName.startsWith(prefix) && sib.getPath != root &&
          System.currentTimeMillis() - sib.lastModified() > 3600000L)
        deleteRecursively(sib)
    })
    root
  }
}

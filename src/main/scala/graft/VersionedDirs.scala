package graft

/** Restart-safe version discovery for `<prefix><N>`-style versioned
  * artifact directories — the shared convention of the maintained dedup
  * indexes (`index_v<N>`, `sig_v<N>`/`tg_v<N>`, delta tiers,
  * [[graft.streaming.Pipelines.MaintainedDedupIndex]]) and the stored
  * DSIR models (`v=<N>`, [[graft.functions.Sampling.saveDsirModel]]):
  * the latest complete version is whatever the directory listing says,
  * never an in-memory pointer, so a restarted process resumes where the
  * last writer left off.
  *
  * "Complete" means COMMITTED, not merely present: a crash mid-write
  * leaves a torn directory holding only `_temporary/` (no readable
  * parquet footer), and counting it as a version would wedge every
  * subsequent read until an operator hand-deletes it. Discovery
  * therefore requires at least one committed data file — the same
  * predicate the staging reader uses. Torn directories are invisible to
  * readers and healed by the next overwrite-mode write (or retired by
  * GC). */
object VersionedDirs {
  /** True when `dir` holds at least one committed data file (non-hidden,
    * nonzero length — a committed zero-ROW parquet part still has footer
    * bytes). A `_temporary`-only crash remnant fails this. */
  def hasCommittedData(fs: org.apache.hadoop.fs.FileSystem, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    fs.exists(p) && fs.listStatus(p).exists(st =>
      !st.isDirectory && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith(".") && st.getLen > 0)
  }

  /** Every COMMITTED `<prefix><N>` version under `root`, ascending.
    * Non-directory entries, non-numeric suffixes, and torn (uncommitted)
    * directories are ignored. */
  def all(fs: org.apache.hadoop.fs.FileSystem, root: String,
          prefix: String): Seq[Int] = {
    val p = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith(prefix)).flatMap(_.drop(prefix.length).toIntOption)
      .filter(v => hasCommittedData(fs, s"$root/$prefix$v"))
      .sorted
  }

  /** Latest committed `<prefix><N>` version under `root`; None when the
    * root is absent or holds no committed versioned dirs. */
  def latest(fs: org.apache.hadoop.fs.FileSystem, root: String,
             prefix: String): Option[Int] = all(fs, root, prefix).lastOption
}

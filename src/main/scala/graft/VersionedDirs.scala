package graft

/** Restart-safe version discovery for `<prefix><N>`-style versioned
  * artifact directories — the shared convention of the maintained dedup
  * indexes (`index_v<N>`, `sig_v<N>`/`tg_v<N>`,
  * [[graft.streaming.Pipelines.MaintainedDedupIndex]]) and the stored
  * DSIR models (`v=<N>`, [[graft.functions.Sampling.saveDsirModel]]):
  * the latest complete version is whatever the directory listing says,
  * never an in-memory pointer, so a restarted process resumes where the
  * last writer left off. */
object VersionedDirs {
  /** Latest `<prefix><N>` directory version under `root`, from a
    * listing; None when the root is absent or holds no versioned dirs.
    * Non-directory entries and non-numeric suffixes are ignored. */
  def latest(fs: org.apache.hadoop.fs.FileSystem, root: String,
             prefix: String): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(p)) None
    else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith(prefix)).flatMap(_.drop(prefix.length).toIntOption).maxOption
  }
}

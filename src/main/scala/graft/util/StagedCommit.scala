package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}

/** THE stage-then-commit filesystem discipline for mutable served
  * layouts (BM25 postings, IVF cell partitions), in one place: every
  * Spark job writes under a `.staged-<uuid>` sibling, then a
  * metadata-only commit renames results into the live tree. ONE
  * definition so the crash-window semantics (destructive step last,
  * trash-sibling restore, idempotent re-moves) can't drift between the
  * index families that share them. Not atomic as a group — a crash
  * inside the rename window can leave partial commits, but the staged
  * tree survives for recovery and file names are unique, so re-applying
  * the remaining moves is safe; full atomicity needs a table-format
  * manifest (Delta/Iceberg territory), out of scope for layout ops. */
object StagedCommit {

  /** Move staged parquet part-files into the live tree
    * (`key=value` partition subdirs when `partitioned`) — UUID file
    * names make collisions impossible and re-moves idempotent. Never
    * destroys live data (append-shaped commits). */
  def moveDataFiles(fs: FileSystem, from: String, to: String,
      partitioned: Boolean): Unit = {
    def moveFiles(src: Path, dst: Path): Unit = {
      fs.mkdirs(dst)
      fs.listStatus(src).filter(_.isFile)
        .filter(_.getPath.getName.endsWith(".parquet"))
        .foreach { f =>
          require(fs.rename(f.getPath, new Path(dst, f.getPath.getName)),
            s"rename ${f.getPath} -> $dst failed")
        }
    }
    val srcRoot = new Path(from)
    if (partitioned)
      fs.listStatus(srcRoot)
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
        .foreach(d => moveFiles(d.getPath,
          new Path(to, d.getPath.getName)))
    else moveFiles(srcRoot, new Path(to))
  }

  /** Replace `dir` with the fully-staged `staged` — never write into a
    * dir a lazy read may still be scanning. */
  def swapDir(fs: FileSystem, staged: String, dir: String): Unit =
    replaceDir(fs, new Path(staged), new Path(dir))

  /** Replace `live` with `staged` with the DESTRUCTIVE step last: live
    * first renames to a dot-prefixed trash sibling (invisible to
    * Spark's file discovery, so a crashed commit never corrupts reads),
    * staged renames into place, and only then the trash is deleted. A
    * delete-then-rename order would lose the live copy with nothing in
    * its place if the process died between the two — unlike
    * [[moveDataFiles]], which never destroys live data. A missing
    * staged dir means "this dir must end up absent" (a fully-deleted
    * partition); a failed staged rename restores live from trash before
    * raising. */
  def replaceDir(fs: FileSystem, staged: Path, live: Path): Unit = {
    val trash = new Path(live.getParent,
      s".trash-${java.util.UUID.randomUUID()}")
    val hadLive = fs.exists(live)
    if (hadLive)
      require(fs.rename(live, trash), s"rename $live -> $trash failed")
    if (fs.exists(staged) && !fs.rename(staged, live)) {
      if (hadLive) fs.rename(trash, live) // best-effort restore
      throw new IllegalStateException(
        s"rename $staged -> $live failed; live copy restored from trash")
    }
    if (hadLive) fs.delete(trash, true)
  }
}

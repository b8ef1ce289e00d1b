package graft.util

/** Fresh on-disk home for a materialized per-(session, dataset) index
  * build. Every BUILD gets its own UUID directory: index caches are
  * session-keyed, so two live sessions in one JVM must not build at the
  * same path (the second's mode-overwrite would delete files the first's
  * cached frame is still reading) — and identityHashCode carries no
  * uniqueness guarantee even for live objects. A UUID per cache-entry
  * build makes collision impossible by construction; the PID segment
  * keeps concurrent processes apart, and the tree dies with the tmp dir
  * like every other per-run artifact. */
object IndexPaths {

  def fresh(dataset: String, kind: String): String =
    sys.props("java.io.tmpdir") + "/graft-index/" +
      ProcessHandle.current().pid() + "/" +
      dataset.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      java.util.UUID.randomUUID().toString + "/" + kind
}

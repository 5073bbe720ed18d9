package thrivespark

/** Ephemeral scratch dirs (streaming checkpoints, per-run sinks, bookmark
  * bases) nest under ONE parent, `/tmp/graft_eph`, instead of littering the
  * /tmp root: repeated runs used to leave hundreds of `graft_cp_*` entries
  * whose sheer count inflated directory operations for every later run
  * (measured ~15% on the bench total at r5). The /tmp root now holds only
  * the content-addressed durable stages plus this single parent; graft.Bench
  * age-sweeps inside it (entries idle >10 min) so concurrent live runs keep
  * their state while completed runs' litter is reclaimed. */
object Scratch {
  private val Root = java.nio.file.Paths.get("/tmp/graft_eph")

  /** A fresh unique dir under the ephemeral parent, e.g. dir("cp_wm"). */
  def dir(prefix: String): String = {
    java.nio.file.Files.createDirectories(Root)
    java.nio.file.Files.createTempDirectory(Root, prefix + "_").toString
  }
}

package graft

import java.nio.file.{Files, Path, Paths}

/** RAM-backed scratch directory for harness runs (Bench/Verify): created
  * under /dev/shm when present+writable, removed on JVM exit. Used for
  * streaming checkpoint bases — the offset/commit logs and state-store
  * snapshots are many small fsync-ed files whose on-disk cost is a fixed
  * per-query toll that has nothing to do with the operators under test.
  * Falls back to None (Spark's default temp locations) anywhere /dev/shm
  * is unavailable, so the harness never depends on it.
  */
object Scratch {

  private lazy val created: Option[Path] =
    try {
      val base = Paths.get("/dev/shm")
      if (Files.isDirectory(base) && Files.isWritable(base)) {
        val p = Files.createTempDirectory(base, "graft_scratch_")
        sys.addShutdownHook(deleteRecursively(p))
        Some(p)
      } else None
    } catch { case _: Throwable => None }

  def dir(): Option[String] = created.map(_.toString)

  private def deleteRecursively(p: Path): Unit = {
    try {
      if (Files.isDirectory(p))
        Files.list(p).forEach(deleteRecursively)
      Files.deleteIfExists(p)
    } catch { case _: Throwable => () }
  }
}

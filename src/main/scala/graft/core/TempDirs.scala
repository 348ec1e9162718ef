package graft.core

import java.util.concurrent.ConcurrentHashMap

/** Bounded scratch-directory residue for queries that must materialize
  * throwaway state (q80's nightly-loop store): each named slot holds at
  * most ONE directory PER JVM — claiming a new one deletes the
  * previous occupant, whose contents are guaranteed consumed by then
  * (the prior invocation's output was fully materialized before the
  * current invocation started). Repeated bench/verify runs therefore
  * leave one store on disk instead of one per run (~120 MB each at the
  * 100× dir).
  *
  * Multi-JVM safety: slot directories are pid-stamped
  * (`<slot>-p<pid>-<random>`), so two concurrent suites (e.g. the
  * driver's bench and a builder's probe) can never delete each other's
  * live scratch — a claim only ever removes (a) this JVM's own
  * previous occupant and (b) directories whose owning pid is DEAD
  * (stale reclaim, so a crashed or exited suite's residue is bounded
  * by the next claim instead of accumulating forever).
  */
object TempDirs {

  private val slots = new ConcurrentHashMap[String, String]()
  private val pid = ProcessHandle.current().pid()

  def deleteRecursively(path: String): Unit = {
    def rm(f: java.io.File): Unit = if (f.exists()) {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(new java.io.File(path))
  }

  /** Owning pid of a slot directory name, if it parses. */
  private def ownerPid(slot: String, name: String): Option[Long] = {
    val prefix = s"$slot-p"
    if (!name.startsWith(prefix)) None
    else name.drop(prefix.length).takeWhile(_.isDigit) match {
      case "" => None
      case digits => Some(digits.toLong)
    }
  }

  private def isAlive(p: Long): Boolean = {
    val h = ProcessHandle.of(p)
    h.isPresent && h.get().isAlive
  }

  /** Create a fresh temp directory under `slot`, deleting this JVM's
    * previous directory for the slot (if any) and reclaiming any
    * same-slot directories whose owning JVM has exited.
    */
  def claim(slot: String): String = {
    val freshPath = java.nio.file.Files
      .createTempDirectory(s"$slot-p$pid-")
    val fresh = freshPath.toString
    Option(slots.put(slot, fresh)).foreach(deleteRecursively)
    // stale-pid reclaim: sweep dead suites' residue for this slot.
    // Directories of LIVE foreign pids are left strictly alone; a
    // reused pid that happens to name an unrelated live process keeps
    // a stale dir alive until a later claim — residue, never data loss.
    val parent = freshPath.getParent.toFile
    Option(parent.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (f.isDirectory && f.getPath != fresh)
        ownerPid(slot, f.getName).foreach { p =>
          if (p != pid && !isAlive(p)) deleteRecursively(f.getPath)
        }
    }
    fresh
  }
}

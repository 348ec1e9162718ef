package graft.core

import java.util.concurrent.ConcurrentHashMap

/** Bounded scratch-directory residue for queries that must materialize
  * throwaway state (q80's nightly-loop store): each named slot holds at
  * most ONE directory — claiming a new one deletes the previous
  * occupant, whose contents are guaranteed consumed by then (the prior
  * invocation's output was fully materialized before the current
  * invocation started). Repeated bench/verify runs therefore leave one
  * store on disk instead of one per run (~120 MB each at the 100× dir).
  */
object TempDirs {

  private val slots = new ConcurrentHashMap[String, String]()

  def deleteRecursively(path: String): Unit = {
    def rm(f: java.io.File): Unit = if (f.exists()) {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(new java.io.File(path))
  }

  /** Create a fresh temp directory under `slot`, deleting the slot's
    * previous directory (if any) first.
    */
  def claim(slot: String): String = {
    val fresh = java.nio.file.Files.createTempDirectory(slot).toString
    Option(slots.put(slot, fresh)).foreach(deleteRecursively)
    fresh
  }
}

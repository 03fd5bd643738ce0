package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class BoundedMemoSpec extends AnyFunSuite {

  test("memoizes: build runs once per key") {
    val memo = new BoundedMemo[Int, String](capacity = 4)
    var builds = 0
    def build(k: Int): String = { builds += 1; s"v$k" }
    assert(memo.getOrElseUpdate(1)(build(1)) == "v1")
    assert(memo.getOrElseUpdate(1)(build(1)) == "v1")
    assert(builds == 1)
  }

  test("a repeat hit at capacity does NOT flush the memo") {
    val memo = new BoundedMemo[Int, String](capacity = 2)
    memo.getOrElseUpdate(1)("a")
    memo.getOrElseUpdate(2)("b")
    assert(memo.size == 2)
    // the round-6 bug class: at capacity, hitting an EXISTING key
    // must not evict anything
    memo.getOrElseUpdate(1)(fail("must not rebuild a cached key"))
    memo.getOrElseUpdate(2)(fail("must not rebuild a cached key"))
    assert(memo.size == 2)
  }

  test("a NEW key at capacity evicts all and disposes via onOverflow") {
    var disposed = List.empty[String]
    val memo = new BoundedMemo[Int, String](capacity = 2,
      onOverflow = v => disposed ::= v)
    memo.getOrElseUpdate(1)("a")
    memo.getOrElseUpdate(2)("b")
    assert(memo.getOrElseUpdate(3)("c") == "c")
    assert(disposed.toSet == Set("a", "b"))
    assert(memo.size == 1)
    assert(memo.get(3).contains("c"))
    assert(memo.get(1).isEmpty)
  }

  test("explicit clear takes its own disposal, defaulting to onOverflow") {
    var overflowDisposed = 0
    var explicitDisposed = 0
    val memo = new BoundedMemo[Int, String](capacity = 4,
      onOverflow = _ => overflowDisposed += 1)
    memo.getOrElseUpdate(1)("a")
    memo.getOrElseUpdate(2)("b")
    memo.clear(_ => explicitDisposed += 1)
    assert(explicitDisposed == 2 && overflowDisposed == 0 && memo.size == 0)
    memo.getOrElseUpdate(1)("a")
    memo.clear()
    assert(overflowDisposed == 1)
  }
}

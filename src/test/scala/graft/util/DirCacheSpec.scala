package graft.util

import org.scalatest.funsuite.AnyFunSuite

class DirCacheSpec extends AnyFunSuite {

  test("builds once per key, evicts LRU and releases the evicted value") {
    var built = 0
    var released = List.empty[String]
    val cache = new DirCache[String](2, v => released ::= v)
    def get(k: String): String =
      cache.getOrElseUpdate(k, { built += 1; s"v_$k" })
    assert(get("a") === "v_a" && get("a") === "v_a" && built === 1)
    assert(get("b") === "v_b" && built === 2 && cache.size === 2)
    // touch a so b is the LRU entry, then insert c → b evicted + released
    get("a")
    assert(get("c") === "v_c")
    assert(cache.size === 2)
    assert(released === List("v_b"))
    // b rebuilds after eviction
    assert(get("b") === "v_b" && built === 4)
    assert(released === List("v_a", "v_b")) // a was LRU when b came back
  }
}

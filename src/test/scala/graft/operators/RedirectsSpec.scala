package graft.operators

import graft.SparkTestBase

class RedirectsSpec extends SparkTestBase {
  import spark.implicits._

  test("collapse: multi-hop chains resolve, loops flag unresolved at " +
      "the bound, dangling targets resolve, hop counts exact") {
    val edges = Seq(
      ("a", "b"), ("b", "c"), // 2-hop chain -> c (no outgoing)
      ("x", "y"), ("y", "x"), // 2-cycle loop
      ("d", "gone") // dangling target (uncrawled) -> resolved
    ).toDF("url", "target")
    val got = Redirects.collapse(edges, "url", "target", maxHops = 5)
      .as[(String, String, Int, Boolean)].collect()
      .map { case (u, f, h, r) => u -> ((f, h, r)) }.toMap
    assert(got("a") === (("c", 2, true)), s"got ${got("a")}")
    assert(got("b") === (("c", 1, true)))
    assert(got("d") === (("gone", 1, true)))
    // loop: 5 hops consumed, final still has an outgoing edge
    assert(got("x")._2 === 5 && !got("x")._3, s"got ${got("x")}")
    assert(!got("y")._3)
    // maxHops=1 degenerates to the raw edge + the outgoing lookup
    val one = Redirects.collapse(edges, "url", "target", maxHops = 1)
      .as[(String, String, Int, Boolean)].collect()
      .map { case (u, f, h, r) => u -> ((f, h, r)) }.toMap
    assert(one("a") === (("b", 1, false)) && one("b") === (("c", 1, true)))
  }
}

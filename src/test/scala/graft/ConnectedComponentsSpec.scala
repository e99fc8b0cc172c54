package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ConnectedComponents

/** Min-label connected components: correctness on known graphs and
  * the convergence/caps behavior the iterative loop promises. */
class ConnectedComponentsSpec extends AnyFunSuite with SparkTestSession {

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)],
                  maxIter: Int = 25, strict: Boolean = true): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.minLabel(
        nodes.toDF("id"), "id",
        edges.toDF("s", "d"), "s", "d", maxIter, strict)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two components and a singleton get min-id labels") {
    val got = run(
      nodes = Seq(1L, 2L, 3L, 10L, 11L, 99L),
      edges = Seq((2L, 1L), (2L, 3L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("a chain converges to one component (label travels one hop per round)") {
    // path 12-11-...-1: needs 11 propagation rounds + 1 fixpoint check
    val n = 12L
    val got = run((1L to n), (2L to n).map(i => (i, i - 1)), maxIter = 15)
    assert(got.values.toSet == Set(1L))
  }

  test("maxIter cap: strict throws, non-strict returns partial min-so-far labels") {
    val nodes = (1L to 50L)
    val chain = (2L to 50L).map(i => (i, i - 1))
    assertThrows[IllegalStateException] { run(nodes, chain, maxIter = 2) }
    val got = run(nodes, chain, maxIter = 2, strict = false)
    assert(got(1L) == 1L)
    assert(got.values.min == 1L)
  }

  test("duplicate and self edges are harmless") {
    val got = run(Seq(1L, 2L), Seq((1L, 2L), (2L, 1L), (1L, 1L), (1L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }
}

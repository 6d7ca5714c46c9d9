package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.GraphQ4.lpa

/** Pins for the declared LPA semantics on planted graphs (the fixture
  * trade graph is near-complete and collapses to one community, so the
  * interesting behavior lives here). `sym` edges are the symmetrized
  * list exactly as the query builds it — both directions present.
  */
class GraphQ4Spec extends AnyFunSuite {

  private def und(es: (Int, Int, Long)*): Seq[(Int, Int, Long)] =
    es.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }

  test("barbell graph splits into its two dense sides") {
    // triangles {0,1,2} and {3,4,5} at weight 10, bridge 2-3 at weight 1
    val g = und((0, 1, 10L), (0, 2, 10L), (1, 2, 10L),
      (3, 4, 10L), (3, 5, 10L), (4, 5, 10L), (2, 3, 1L))
    val lab = lpa(0 to 5, g, 4)
    assert(lab(0) == lab(1) && lab(1) == lab(2), s"left side one community: $lab")
    assert(lab(3) == lab(4) && lab(4) == lab(5), s"right side one community: $lab")
    assert(lab(0) != lab(3), s"bridge must not merge the sides: $lab")
  }

  test("equal-support tie breaks to the SMALLEST label key") {
    // node 2 sees label 0 and label 1 at identical weight; its own
    // label's support is 0 — the argmax tie must resolve to 0
    val g = und((0, 2, 5L), (1, 2, 5L))
    assert(lpa(Seq(0, 1, 2), g, 1)(2) == 0)
  }

  test("isolated node survives as a singleton community") {
    val g = und((0, 1, 3L))
    val lab = lpa(Seq(0, 1, 9), g, 4)
    assert(lab(9) == 9, s"no neighbors -> keeps own label: $lab")
  }

  test("weight beats degree: one heavy neighbor outvotes two light ones") {
    // node 3: neighbors 0 (w=10) vs 1,2 (w=3 each, same label after 0
    // iterations? labels distinct) — candidates are labels 0(10), 1(3),
    // 2(3): heavy single edge wins even though two light edges exist
    val g = und((0, 3, 10L), (1, 3, 3L), (2, 3, 3L))
    assert(lpa(Seq(0, 1, 2, 3), g, 1)(3) == 0)
  }

  test("zero-weight self-loop does NOT bias: neighbor support of 1 beats own 0") {
    val g = und((0, 1, 1L))
    val one = lpa(Seq(0, 1), g, 1)
    // synchronous update: the pair swaps labels (classic sync-LPA
    // oscillation) — each node's only positive-support candidate is the
    // other's label
    assert(one == Map(0 -> 1, 1 -> 0), s"$one")
  }
}

package graft

import graft.operators.Successor
import org.scalatest.funsuite.AnyFunSuite

/** Pointer-doubling invariants on a hand-built rho forest. */
class SuccessorSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // Three components: 3-cycle {0,1,2} with tail 3→1; 2-cycle {4,5};
  // self-loop 6 with chain 9→8→7→6.
  private val f = Map(
    0L -> 1L, 1L -> 2L, 2L -> 0L, 3L -> 1L,
    4L -> 5L, 5L -> 4L,
    6L -> 6L, 7L -> 6L, 8L -> 7L, 9L -> 8L)
  private val cycleNodes = Set(0L, 1L, 2L, 4L, 5L, 6L)
  private val cycleIdOf = Map( // min id of each cycle
    0L -> 0L, 1L -> 0L, 2L -> 0L, 4L -> 4L, 5L -> 4L, 6L -> 6L)

  /** Scala replay: walk 2^rounds steps, tracking the window min. */
  private def reference(rounds: Int): Map[Long, (Long, Long)] =
    f.keys.map { v =>
      var cur = v
      var mn = v
      // window of size 2^rounds: v, f(v), ..., f^(2^rounds - 1)(v)
      for (_ <- 1L to (1L << rounds) - 1) { cur = f(cur); mn = math.min(mn, cur) }
      v -> (f(cur), mn) // p = one more step = f^(2^rounds)(v)
    }.toMap

  private def doubled(rounds: Int): Map[Long, (Long, Long)] =
    Successor.doubled(f.toSeq.toDF("v", "p"), rounds)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("doubled(4) matches the sequential replay node-for-node") {
    assert(doubled(4) == reference(4))
  }

  test("with 2^K >= N: anchors are exactly the cycle nodes, mn at a cycle node is its cycle id") {
    val st = doubled(4) // 2^4 = 16 >= 10 nodes
    assert(st.values.map(_._1).toSet == cycleNodes)
    for ((c, id) <- cycleIdOf) assert(st(c)._2 == id, s"node $c")
  }

  test("extra rounds past convergence are idempotent") {
    val a = doubled(4)
    val b = doubled(6)
    // anchors may differ in phase around the cycle but stay ON the cycle;
    // the census (cycle membership of anchors, window mins) is stable
    assert(b.values.map(_._1).toSet == cycleNodes)
    assert(a.view.mapValues(_._2).toMap == b.view.mapValues(_._2).toMap)
  }
}

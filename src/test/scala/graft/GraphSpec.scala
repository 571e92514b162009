package graft

import graft.operators.Graph
import org.scalatest.funsuite.AnyFunSuite

/** Fixed-point PageRank invariants on hand-computed toy graphs. */
class GraphSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.fixedPointPageRank(edges.toDF("u", "v"), "u", "v", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Scala replay of the fixed-point update rule. */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = out.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val contribs = edges.flatMap { case (u, v) =>
        r.get(u).map(ru => v -> ru / out(u))
      }
      r = contribs.groupBy(_._1).view
        .mapValues(cs => 150000L + 85L * cs.map(_._2).sum / 100L).toMap
    }
    r
  }

  test("undirected triangle: symmetry forces equal ranks, value matches the closed form") {
    val tri = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (3L, 1L))
    val got = ranks(tri, 5)
    assert(got.values.toSet.size == 1)
    assert(got == reference(tri, 5))
  }

  test("star: the hub outranks the leaves; values equal the Scala replay") {
    // undirected star 0—{1,2,3,4}
    val star = (1L to 4L).flatMap(l => Seq((0L, l), (l, 0L)))
    val got = ranks(star, 5)
    assert(got(0L) > got(1L))
    assert((1L to 4L).map(got).toSet.size == 1)
    assert(got == reference(star, 5))
  }

  test("directed 3-cycle: rank mass circulates, all nodes equal") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val got = ranks(cycle, 5)
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got.values.toSet.size == 1)
    assert(got == reference(cycle, 5))
  }

  test("asymmetric graph: the Scala replay agrees node-for-node") {
    // 4-node graph: 0↔1, 0↔2, 1→3, 3→1 — node 0 and 1 split attention
    val g = Seq((0L, 1L), (1L, 0L), (0L, 2L), (2L, 0L), (1L, 3L), (3L, 1L))
    val got = ranks(g, 4)
    assert(got == reference(g, 4))
    // hub 0 (two in-edges from dedicated leaves... leaf 2 feeds only 0)
    assert(got(0L) > got(2L))
  }
}

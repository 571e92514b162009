package graft

import graft.operators.EditDistance
import org.scalatest.funsuite.AnyFunSuite

/** PassJoin segment blocking against exact brute force: over adversarially
  * small alphabets (maximal accidental segment collisions) and lengths down
  * to 1 (empty segments, clipped shift windows), the blocked join must
  * return EXACTLY the brute-force pair set — recall is claimed at 100%, and
  * precision is enforced by the verify step.
  */
class EditDistanceSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def brute(strs: Seq[(Long, String)], k: Int): Set[(Long, Long, Long)] =
    (for {
      (ia, sa) <- strs; (ib, sb) <- strs
      if ia < ib && sa.nonEmpty && sb.nonEmpty
      ed = lev(sa, sb) if ed <= k
    } yield (ia, ib, ed.toLong)).toSet

  private def blocked(strs: Seq[(Long, String)], k: Int): Set[(Long, Long, Long)] =
    EditDistance.passJoin(strs.toDF("id", "s"), "id", "s", k)
      .select("ida", "idb", "ed").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("passJoin equals brute force on random 2-letter-alphabet strings, k = 1 and 2") {
    val rnd = new scala.util.Random(42)
    val strs = (0L until 120L).map { i =>
      i -> (1 to (1 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(2)).toChar).mkString
    }
    for (k <- Seq(1, 2))
      assert(blocked(strs, k) == brute(strs, k), s"k=$k")
  }

  test("passJoin equals brute force on word-like names, k = 1 and 2") {
    val adjs = Seq("red", "blue", "bleu", "green", "grean", "smal", "small")
    val nouns = Seq("bolt", "bolts", "ring", "rng", "widget", "wedget")
    val strs = (for (a <- adjs; n <- nouns) yield s"$a $n").zipWithIndex
      .map { case (s, i) => i.toLong -> s }
    for (k <- Seq(1, 2))
      assert(blocked(strs, k) == brute(strs, k), s"k=$k")
  }

  test("passJoin finds indel pairs across length boundaries incl. length 1") {
    val strs = Seq(0L -> "a", 1L -> "ab", 2L -> "b", 3L -> "abc", 4L -> "abcd",
      5L -> "bcd", 6L -> "x")
    for (k <- Seq(1, 2))
      assert(blocked(strs, k) == brute(strs, k), s"k=$k")
  }
}

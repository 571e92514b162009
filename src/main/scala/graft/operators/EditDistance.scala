package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join via segment blocking (the PassJoin
  * family: Li/Deng/Feng, "PASS-JOIN: a partition-based method for
  * similarity joins", VLDB 2011 — public literature).
  *
  * Every string is split into `k + 1` even segments. If `ed(s, t) <= k`,
  * the `<= k` edits touch at most `k` segments of `s`, so at least one
  * segment survives untouched and appears verbatim in `t`, displaced by at
  * most `k` positions (one per insertion/deletion before it). Candidate
  * generation is therefore an EQUALITY join — (segment text, segment index,
  * source length) — between a per-string index of `k + 1` segments and a
  * per-string probe set of O(k³) shifted substrings, followed by an exact
  * `levenshtein` verify on the candidates only. Recall is 100% by the
  * pigeonhole argument; no pair of strings with `ed <= k` can miss.
  *
  * Scale shape (100 TB): both sides are linear expansions of the dictionary
  * (k+1 index rows, (2k+1)²(k+1) probe rows per string — constants, not
  * data-dependent), the join is a plain keyed shuffle on short substring
  * keys, and the quadratic work (`levenshtein`) runs only on candidates.
  * Contrast with the deletion-neighborhood blocking of
  * [[graft.queries.TextDedupPack]] q107: neighborhoods materialize
  * `len + 1` variants of `len - 1` chars each (quadratic bytes per string),
  * while PassJoin's index is `k + 1` short segments — the right trade for
  * long strings and k > 1.
  *
  * Not derived from the reference (its ETL has no similarity join); this is
  * the training-data extension family (typo-cluster mining over entity
  * dictionaries).
  */
object EditDistance {

  /** All unordered pairs `(ida < idb)` from `dict` with
    * `levenshtein(sa, sb) <= k`. `dict` must hold one row per id; empty
    * strings are dropped (an empty string's neighborhood is the length-<=k
    * strings — pair it by a length filter if ever needed, not a join).
    *
    * Output columns: `ida, idb, sa, sb, ed`.
    */
  def passJoin(dict: DataFrame, idCol: String, strCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 4, s"k must be in [1, 4], got $k")
    val segs = k + 1
    val base = dict
      .select(col(idCol).as("__id"), col(strCol).as("__s"))
      .filter(length(col("__s")) >= 1)

    // Even partition of a length-l string: segment i covers
    // [floor(i*l/segs), floor((i+1)*l/segs)). Lengths here are tiny
    // relative to 2^53, so double floor-division is exact.
    def segStart(l: Column, i: Column) = floor(i * l / segs).cast("long")

    // Index side: k+1 segments per string, keyed by (text, index, length).
    val idx = base
      .select(col("__id"), col("__s"), length(col("__s")).cast("long").as("__l"),
        explode(sequence(lit(0), lit(k))).as("__i"))
      .withColumn("__st", segStart(col("__l"), col("__i")))
      .withColumn("__sl", segStart(col("__l"), col("__i") + 1) - col("__st"))
      .select(col("__id"), col("__s"), col("__l"), col("__i"),
        col("__s").substr((col("__st") + 1).cast("int"), col("__sl").cast("int"))
          .as("__seg"))

    // Probe side: for every source length l within +-k of |t| and every
    // segment index, the substrings of that segment's length at start
    // positions displaced by at most k (clipped to t's bounds).
    val probe = base
      .select(col("__id").as("__pid"), col("__s").as("__t"),
        length(col("__s")).cast("long").as("__m"))
      .select(col("*"),
        explode(sequence(greatest(col("__m") - k, lit(1L)), col("__m") + k))
          .as("__l"))
      .select(col("*"), explode(sequence(lit(0), lit(k))).as("__i"))
      .withColumn("__st", segStart(col("__l"), col("__i")))
      .withColumn("__sl", segStart(col("__l"), col("__i") + 1) - col("__st"))
      .withColumn("__lo", greatest(col("__st") - k, lit(0L)))
      .withColumn("__hi", least(col("__m") - col("__sl"), col("__st") + k))
      .select(col("__pid"), col("__t"), col("__l"), col("__i"), col("__sl"),
        explode(when(col("__lo") <= col("__hi"), sequence(col("__lo"), col("__hi")))
          .otherwise(array().cast("array<bigint>"))).as("__p"))
      .select(col("__pid"), col("__t"), col("__l"), col("__i"),
        col("__t").substr((col("__p") + 1).cast("int"), col("__sl").cast("int"))
          .as("__seg"))

    // Both orientations of every true pair match (the pigeonhole argument
    // applies to s's segments AND t's), so keeping __id < __pid loses
    // nothing; distinct() collapses multi-segment hits before the verify.
    idx.join(probe, Seq("__seg", "__i", "__l"))
      .filter(col("__id") < col("__pid"))
      .select(col("__id").as("ida"), col("__pid").as("idb"),
        col("__s").as("sa"), col("__t").as("sb"))
      .distinct()
      .withColumn("ed", levenshtein(col("sa"), col("sb")).cast("long"))
      .filter(col("ed") <= k)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality rulebook (the Deequ/great-expectations shape,
  * re-expressed as plain Catalyst aggregates): each rule yields one row
  * `(rule, n_checked, n_violations)`, and every row-local rule over the
  * same table folds into a SINGLE scan of conditional sums — the audit
  * cost is one pass per table plus one keyed agg per uniqueness rule and
  * one keyed join per referential rule, regardless of how many rules the
  * book holds. Nothing collects: results are one-row aggregates unioned
  * in-plan, so a 100 TB audit is exactly as shuffle-heavy as its weakest
  * rule (a distinct-count), never rule-count × scans.
  *
  * Violation semantics: a row violates a row rule when the rule's
  * predicate is not TRUE for it (NULL counts as a violation — an
  * unknowable check is a failed check, except for [[Rules.referential]]
  * where a NULL foreign key is a completeness problem, not an orphan).
  */
object Rules {

  /** A row-local rule: `name` labels the output row, `holds` must evaluate
    * TRUE on conforming rows. Build with the combinators below or supply
    * any Column predicate.
    */
  final case class RowRule(name: String, holds: Column)

  def notNull(name: String, c: Column): RowRule = RowRule(name, c.isNotNull)
  def inRange(name: String, c: Column, lo: Column, hi: Column): RowRule =
    RowRule(name, c >= lo && c <= hi)
  def inSet(name: String, c: Column, values: Seq[String]): RowRule =
    RowRule(name, c.isInCollection(values))

  /** All `rules` evaluated in one scan of `df`: a single aggregate of
    * conditional sums, unpivoted with `stack` into one row per rule.
    */
  def audit(df: DataFrame, rules: Seq[RowRule]): DataFrame = {
    require(rules.nonEmpty, "empty rulebook")
    require(rules.forall(!_.name.contains("'")), "rule names must not contain quotes")
    val aggs = count(lit(1)).as("__n") +: rules.zipWithIndex.map { case (r, i) =>
      sum(when(r.holds, 0L).otherwise(1L)).as(s"__v$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.zipWithIndex
      .map { case (r, i) => s"'${r.name}', __v$i" }.mkString(", ")
    one.select(
      expr(s"stack(${rules.size}, $stackArgs) AS (rule, n_violations)"),
      col("__n").as("n_checked"))
      .select("rule", "n_checked", "n_violations")
  }

  /** Uniqueness over a key tuple: `n_violations` = rows living in a
    * duplicated key class (one keyed count + a tiny re-agg).
    */
  def unique(ruleName: String, df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__c"))
      .agg(sum(col("__c")).as("n_checked"),
        sum(when(col("__c") > 1, col("__c")).otherwise(0L)).as("n_violations"))
      .select(lit(ruleName).as("rule"), col("n_checked"), col("n_violations"))

  /** Referential integrity: child rows whose non-NULL foreign key misses
    * every parent key. The parent side is distinct-aggregated before the
    * join (keyed shuffle on the FK; a dimension-sized parent broadcasts
    * under AQE).
    */
  def referential(
      ruleName: String,
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val parents = parent.select(col(parentKey).as("__pk")).distinct()
    child.select(col(childKey).as("__fk"))
      .join(parents, col("__fk") === col("__pk"), "left")
      .agg(count(lit(1)).as("n_checked"),
        sum(when(col("__fk").isNotNull && col("__pk").isNull, 1L).otherwise(0L))
          .as("n_violations"))
      .select(lit(ruleName).as("rule"), col("n_checked"), col("n_violations"))
  }
}

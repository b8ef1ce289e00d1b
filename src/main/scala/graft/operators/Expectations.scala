package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations — executable contract checks run before a
  * corpus snapshot ships (the deequ/dbt-test shape, engine-native).
  *
  * Every row-local rule contributes one violation counter to a SINGLE
  * aggregation job; uniqueness rides the same job as
  * `count(*) − count(DISTINCT keys)`. The report is a small long-format
  * frame (rule, n_violations) — at 100 TB this is one scan, map-side
  * combined, regardless of how many rules are attached.
  *
  * Null semantics are explicit per rule: `notNull` counts nulls;
  * `inRange`/`matches` ignore nulls (attach `notNull` separately if
  * nulls are themselves a violation) — so rules compose without double
  * counting. `unique`'s DISTINCT skips rows with a null key (standard
  * SQL DISTINCT behavior both engines).
  */
object Expectations {

  final case class Rule(name: String, violation: Column)

  def notNull(c: String): Rule =
    Rule(s"not_null($c)", col(c).isNull)

  def inRange(c: String, lo: Column, hi: Column): Rule =
    Rule(s"in_range($c)", col(c).isNotNull && (col(c) < lo || col(c) > hi))

  def matches(c: String, regex: String): Rule =
    Rule(s"matches($c)", col(c).isNotNull && !col(c).rlike(regex))

  /** Run all rules in one aggregation; returns (rule, n_violations)
    * sorted by rule name. `uniqueKeys`, when non-empty, adds a
    * `unique(...)` rule counting surplus duplicate rows. */
  def check(df: DataFrame, rules: Seq[Rule],
      uniqueKeys: Seq[String] = Nil): DataFrame = {
    require(rules.nonEmpty || uniqueKeys.nonEmpty, "no expectations given")
    // coalesce: sum() over zero rows is NULL, and an EMPTY input is a
    // state a contract check exists to report — it must read as 0
    // violations (count/countDistinct are already 0 on empty).
    val counters = rules.map(r =>
      coalesce(sum(when(r.violation, 1L).otherwise(0L)), lit(0L))
        .as(s"__${r.name}")) ++
      (if (uniqueKeys.nonEmpty)
        Seq((count(lit(1)) - countDistinct(uniqueKeys.head,
          uniqueKeys.tail: _*)).as("__unique"))
      else Nil)
    val row = df.agg(counters.head, counters.tail: _*)
    val names = rules.map(_.name) ++
      (if (uniqueKeys.nonEmpty)
        Seq(s"unique(${uniqueKeys.mkString(",")})") else Nil)
    val cols = rules.map(r => col(s"__${r.name}")) ++
      (if (uniqueKeys.nonEmpty) Seq(col("__unique")) else Nil)
    val entries = array(names.zip(cols).map { case (n, c) =>
      struct(lit(n).as("rule"), c.as("n_violations"))
    }: _*)
    row.select(explode(entries).as("e"))
      .select(col("e.rule"), col("e.n_violations"))
      .orderBy(col("rule"))
  }
}

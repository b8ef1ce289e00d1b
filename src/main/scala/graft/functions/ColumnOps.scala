package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level let-binding.
  *
  * Interpreted higher-order functions re-evaluate every non-lambda
  * subexpression in the lambda body PER ELEMENT — e.g.
  * `transform(seq, i -> element_at(split(lower(text)), i))` re-runs the
  * full lowercase+regex-split once per index (measured: the entire cost
  * of the shingle pipeline, ~250 tokenizations per row). `bind` routes a
  * value through a single-element `transform`, turning it into a
  * NamedLambdaVariable: evaluated exactly once per row, free to
  * reference any number of times.
  */
object ColumnOps {

  /** let v = value in body(v) — value is evaluated once per row. */
  def bind(value: Column, body: Column => Column): Column =
    element_at(transform(array(value), v => body(v)), 1)
}

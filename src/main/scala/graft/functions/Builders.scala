package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression

/** Shared function-builder helpers for the registry / extension
  * injection paths — one arity guard, not a copy per registration site
  * (a wrong-arity SQL call must fail with a clean message, not an
  * IndexOutOfBoundsException from inside the analyzer). */
private[graft] object Builders {
  def unary(name: String)(mk: Expression => Expression)
      : Seq[Expression] => Expression = { exprs =>
    require(exprs.size == 1,
      s"$name expects exactly 1 argument, got ${exprs.size}")
    mk(exprs(0))
  }

  def binary(name: String)(mk: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = { exprs =>
    require(exprs.size == 2,
      s"$name expects exactly 2 arguments, got ${exprs.size}")
    mk(exprs(0), exprs(1))
  }
}

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

  /** Register `name` only when absent from the session's registry.
    * Re-registration via createOrReplaceTempFunction is harmless to
    * results but pays registry work per Column construction and logs
    * "replaced a previously registered function" on every call — the
    * Verify entry tail was wall-to-wall with it (r18 verdict #9). Every
    * caller registers a CONSTANT builder under a fixed or content-hashed
    * name (same name ⇒ same expression), so skip-if-present is sound.
    * The registry is per-session state, so this needs no extra cache. */
  def registerOnce(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting.
  *
  * A hot grouping key concentrates one shuffle partition (AQE splits
  * skewed JOINS but not skewed aggregations over high-cardinality
  * payloads like collect/distinct). Salted two-phase aggregation fans
  * the hot key across `salts` partial groups, then merges: correct for
  * any commutative-associative aggregate pair.
  *
  * Phase 1 shuffles on (key, salt) — at most 1/salts of the hot key's
  * rows per reducer; phase 2 shuffles `salts` rows per key.
  */
object Salting {

  /** Row-spreading salt: any per-row value works — the merged aggregate
    * is salt-independent; monotonically_increasing_id already embeds the
    * partition id in its high bits, so it alone distributes fine. */
  private def saltCol(salts: Int) =
    pmod(monotonically_increasing_id(), lit(salts))

  /** Salted count: equivalent to groupBy(keys).count() for any skew. */
  def saltedCount(df: DataFrame, keys: Seq[String], salts: Int = 16)
      : DataFrame = {
    val salted = df.withColumn("__salt", saltCol(salts))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__pc"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__pc")).as("n"))
  }

  /** Salted sum of exact integer cents (see RelationalQueries money
    * discipline) — partial sums per salt, then merged. */
  def saltedCentSum(df: DataFrame, keys: Seq[String], valueCol: String,
      salts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", saltCol(salts))
      .withColumn("__cents", graft.functions.Money.cents(col(valueCol)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col("__cents")).as("__ps"))
      .groupBy(keys.map(col): _*)
      .agg((sum(col("__ps")).cast("double") / 100.0).as("total"))
  }

  /** Broadcast-salt the small side of a skewed join: replicate each
    * small-side row `salts` times so the salted big side still matches.
    * Returns (bigSalted, smallReplicated, saltCol) for a join on
    * originalKeys :+ saltCol. */
  def saltedJoinSides(big: DataFrame, small: DataFrame, salts: Int)
      : (DataFrame, DataFrame, String) = {
    val bigSalted = big.withColumn("__salt", saltCol(salts).cast("int"))
    val smallRep = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    (bigSalted, smallRep, "__salt")
  }

  /** Complete salted inner equi join: row-equivalent to
    * big.join(small, keys) under any key skew — each hot key spreads
    * across `salts` reducers (the manual fallback when AQE's skew-join
    * splitting can't apply, e.g. non-sort-merge plans or skew introduced
    * after a prior stage). Replication multiplies the SMALL side only. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int = 16): DataFrame = {
    val (b, s, saltName) = saltedJoinSides(big, small, salts)
    b.join(s, keys :+ saltName).drop(saltName)
  }
}

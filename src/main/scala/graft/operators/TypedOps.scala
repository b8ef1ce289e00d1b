package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Dataset[T] API surface (SURVEY.md §1: "Dataset[T] where type
  * safety helps"): case-class views over the fixture tables and a typed
  * Aggregator, for pipelines where compile-time field checks matter more
  * than dynamic schemas. Encoders keep everything in Tungsten rows —
  * this is NOT the RDD API.
  */
object TypedOps {

  final case class Doc(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)
  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double, props: String)

  def docs(spark: SparkSession, dir: String): Dataset[Doc] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir).as[Doc]
  }

  def events(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    graft.Tables.events(spark, dir).as[Event]
  }

  /** Typed exact-cents sum aggregator: Double amounts → exact Long cents
    * buffer → Double total (the money discipline, typed). */
  object CentSum extends Aggregator[Double, Long, Double] {
    override def zero: Long = 0L
    override def reduce(b: Long, a: Double): Long =
      b + graft.functions.Money.centsOf(a)
    override def merge(b1: Long, b2: Long): Long = b1 + b2
    override def finish(r: Long): Double = r / 100.0
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Per-event-type exact value totals through the typed API. */
  def valueTotalsByType(spark: SparkSession, dir: String)
      : Dataset[(String, Double)] = {
    import spark.implicits._
    events(spark, dir).groupByKey(_.event_type)
      .mapValues(_.value)
      .agg(CentSum.toColumn.name("total"))
  }
}

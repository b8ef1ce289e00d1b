package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-evolution read: serve ONE logical table from parquet snapshots
  * written under different schema versions (the corpus-migration
  * reality — a recrawl adds a column, years of old shards don't have
  * it). Spark's `mergeSchema` footer merge is the native mechanism:
  * the merged schema is the union of the versions' fields, rows from
  * older files read the added columns as NULL.
  *
  * The verified CONTRACT (the [[OrcTable]] discipline — the value is
  * the proof, not plumbing): `q_schema_evolution` serves an old-schema
  * shard and a new-schema shard through one merged read and the DuckDB
  * oracle recomputes the expected null-fill from the source table — any
  * drift in the union'd schema, column order, or null semantics breaks
  * the hash.
  *
  * 100 TB note: `mergeSchema` costs a footer read per file AT PLANNING
  * TIME — fine for a migration window, wrong as the steady state. The
  * production path is to declare the unioned schema explicitly
  * (`spark.read.schema(target)`) once the migration is understood;
  * this operator is the bridge that keeps mixed-version corpora
  * queryable meanwhile. */
object SchemaEvolution {

  private val cache = new graft.util.SessionCache[String]

  /** Write the two schema versions as sibling shard directories once
    * per (session, dataset-key), return the mergeSchema read over both. */
  def mergedRead(spark: SparkSession, datasetKey: String,
      oldShard: => DataFrame, newShard: => DataFrame): DataFrame = {
    val path = cache.getOrElseUpdate(spark, datasetKey) {
      val p = graft.util.IndexPaths.fresh(datasetKey, "evolve")
      oldShard.write.mode("overwrite").parquet(s"$p/v1")
      newShard.write.mode("overwrite").parquet(s"$p/v2")
      p
    }
    spark.read.option("mergeSchema", "true").parquet(s"$path/v1", s"$path/v2")
  }
}

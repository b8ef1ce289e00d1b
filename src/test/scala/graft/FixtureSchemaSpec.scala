package graft

import org.apache.spark.sql.types._

/** Fixture-drift tripwire (VERDICT r11 #3).
  *
  * Round 11 lost 13 queries and 20 tests to a silent driver-side testdata
  * regeneration: `events.ts` moved from parquet TIMESTAMP(NANOS) to
  * TIMESTAMP_MICROS/NTZ, and every events consumer errored with an opaque
  * DATATYPE_MISMATCH deep inside query analysis. This spec makes the NEXT
  * format shift fail loudly and immediately, naming the table, the column,
  * and the found-vs-expected type — one red line instead of 13 −1 bench
  * entries.
  *
  * Pinning policy: exact type per column, except raw timestamp columns
  * accept either TIMESTAMP or TIMESTAMP_NTZ (both read fine against the
  * DuckDB oracle under a UTC session, and [[Tables.events]] normalizes the
  * one column the engine computes on). The NORMALIZED events loader must
  * yield exactly TimestampType — that is the schema every downstream
  * operator was written against.
  */
class FixtureSchemaSpec extends SparkSpec {

  /** "ts" family: any timestamp flavor; Tables normalizes where it matters. */
  private val TS = "timestamp"
  private def typeName(dt: DataType): String = dt match {
    case _: TimestampType | _: TimestampNTZType => TS
    case ArrayType(e, _) => s"array<${typeName(e)}>"
    case other => other.simpleString
  }

  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> TS, "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> TS),
    // events.ts intentionally listed as the flexible TS family here: the
    // RAW on-disk flavor may drift (nanos / micros-NTZ / UTC) as long as
    // Tables.events normalizes it — the strict pin is the separate test
    // below. A raw flavor Tables.events can't dispatch on dies inside
    // Tables.events itself with a named error.
    "events" -> Seq("event_id" -> "bigint", "ts" -> TS,
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int")
  )

  // all three driver SF dirs: a PARTIAL regeneration (one dir rebuilt
  // with new logical types, others stale) must fail naming the dir too
  private val sfDirs = Seq(sf001, sf01, "/root/testdata/sf0.1")

  for (table <- Tables.all) {
    test(s"fixture schema pin: $table") {
      for (dir <- sfDirs) {
        val df =
          if (table == "events") Tables.events(spark, dir)
          else Tables.load(spark, dir, table)
        val found = df.schema.map(f => f.name -> typeName(f.dataType))
        val exp = expected(table)
        assert(found == exp,
          s"\nFIXTURE DRIFT in $dir/$table.parquet:" +
            exp.zipAll(found, "<missing>" -> "", "<missing>" -> "")
              .collect { case ((en, et), (fn, ft)) if (en, et) != (fn, ft) =>
                s"\n  column $en: expected $et, found $fn:$ft" }
              .mkString +
            "\n(driver regenerated testdata with new logical types — " +
            "update Tables dispatch + this pin together)")
      }
    }
  }

  test("fixture schema pin: normalized events.ts is exactly TIMESTAMP") {
    // Every windowed/as-of/interval/session operator computes on this
    // column; NTZ-vs-UTC or long leaking through breaks them all at once.
    assert(Tables.events(spark, sf001).schema("ts").dataType == TimestampType)
  }
}

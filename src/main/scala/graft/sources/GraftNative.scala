package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.{Map => JMap}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.unsafe.types.UTF8String

/** "graft-native" — a DataSource V2 reader for the REFERENCE's storage
  * model: a table is a directory of block (partition) dirs, each block
  * holding ONE little-endian fixed-width file per column, with strings
  * dictionary-encoded as an i32 code file plus a line-per-symbol
  * `.dict` sidecar where line i is id i (the reference's
  * `{table}/{col}.symbols` scheme — ref `src/table/read.rs:13-23`,
  * `src/table/write.rs:123-142`; column files of `to_le_bytes` values —
  * ref `src/table/mod.rs:34-44`, `src/table/read.rs:109-128`).
  *
  * Why DSv2 and not just parquet: this makes the reference's own files
  * a first-class Spark table — `spark.read.format("graft-native")` —
  * with COLUMN PRUNING pushed into the source (a pruned scan opens only
  * the requested columns' files; per-column files make projection a
  * file-system no-op, the reference's core storage bet) and one Spark
  * partition per block dir (the reference's partition = the parallelism
  * unit). Filters ride on top as ordinary Spark filters.
  *
  * v0 scope: types i64/f64/str, no nulls (the reference has no null
  * representation either — SURVEY §1.2); writes via [[GraftNative.write]]
  * (distributed: one block per input partition, local filesystem).
  */
object GraftNative {
  private[sources] val MetaFile = "_graft_meta.json"

  /** Default native code for a Spark type (write path without an
    * explicit native-type override). */
  private[sources] def typeOf(dt: DataType): String = dt match {
    case LongType => "i64"
    case DoubleType => "f64"
    case IntegerType => "i32"
    case FloatType => "f32"
    case ShortType => "i16"
    case ByteType => "i8"
    case StringType => "str"
    case other => throw new IllegalArgumentException(
      s"graft-native supports integral/float/string columns, got $other")
  }

  /** The reference's FULL width set (ref `src/schema.rs:4-20` for
    * I8..U64/F32/F64, `src/table/read.rs:25-32` for Symbol8/16/32,
    * `src/schema.rs:141-166` + `src/table/write.rs:114-120` for
    * resolution-compressed timestamps):
    *
    *  - `i8 u8 i16 u16 i32 u32 i64 u64` — fixed-width LE integers;
    *    unsigned widths widen by one Spark type (u8→short, u16→int,
    *    u32→long); u64 reads as long, values above 2^63-1 unsupported
    *    (documented SURVEY §1.2 choice).
    *  - `f32 f64` — IEEE floats.
    *  - `sym8 sym16 str` — dictionary codes of 1/2/4 bytes + the
    *    line-per-symbol `.dict` sidecar (`str` keeps its historical
    *    name; it IS the reference's Symbol32).
    *  - `ts<W>@<R>` — timestamp compressed to W∈{1,2,4,8}-byte UNSIGNED
    *    deltas against an 8-byte little-endian per-block min header, at
    *    resolution R nanos (the reference stores deltas vs the
    *    partition min at the column resolution; our block is its
    *    partition). Values must sit on the R grid — floor upstream
    *    (ZTable.floorResolution is that knob). Reads as i64 nanos.
    */
  private val TsRe = "ts([1248])@([0-9]+)".r

  private[sources] def sparkOf(native: String): DataType = native match {
    case "i8" => ByteType
    case "u8" | "i16" => ShortType
    case "u16" | "i32" => IntegerType
    case "u32" | "i64" | "u64" => LongType
    case "f32" => FloatType
    case "f64" => DoubleType
    case "str" | "sym8" | "sym16" => StringType
    case TsRe(_, _) => LongType
    case other =>
      throw new IllegalArgumentException(s"unknown graft-native type '$other'")
  }

  /** Bytes per stored value of a native code. */
  private[sources] def widthOfNative(native: String): Int = native match {
    case "i8" | "u8" | "sym8" => 1
    case "i16" | "u16" | "sym16" => 2
    case "i32" | "u32" | "f32" | "str" => 4
    case "i64" | "u64" | "f64" => 8
    case TsRe(w, _) => w.toInt
    case other =>
      throw new IllegalArgumentException(s"unknown graft-native type '$other'")
  }

  /** Column-file header bytes (ts compression stores the block min). */
  private[sources] def headerOfNative(native: String): Int = native match {
    case TsRe(_, _) => 8
    case _ => 0
  }

  private[sources] def tsParams(native: String): (Int, Long) = native match {
    case TsRe(w, r) => (w.toInt, r.toLong)
    case other => throw new IllegalStateException(s"not a ts type: $other")
  }

  /** List a dir's entries, CLOSING the NIO stream (Files.list leaks a
    * file descriptor per call otherwise — repeated scans would exhaust
    * the limit on a long-lived session). */
  private[sources] def listDir(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toVector finally s.close()
  }

  /** (name, native code) pairs in meta order. */
  private[sources] def nativesOf(dir: String): Array[(String, String)] = {
    val json = new String(Files.readAllBytes(Paths.get(dir, MetaFile)),
      StandardCharsets.UTF_8)
    """\{"name":"([^"]+)","type":"([a-z0-9@]+)"\}""".r
      .findAllMatchIn(json).map(m => (m.group(1), m.group(2))).toArray
  }

  private[sources] def schemaOf(dir: String): StructType =
    StructType(nativesOf(dir).map { case (name, native) =>
      StructField(name, sparkOf(native), nullable = false)
    })

  /** Native codes for DECODING one block: a block-local meta sidecar —
    * written when compaction had to widen a column (e.g. ts2 -> i64)
    * past what the table meta declares — overrides the table's. The
    * Spark-facing schema never changes (a ts column is i64 nanos at
    * either width), so per-block widths compose with concurrent
    * appends that still encode at the table's declared widths. */
  private[sources] def nativesOfBlock(block: String): Array[(String, String)] =
    if (Files.exists(Paths.get(block, MetaFile))) nativesOf(block)
    else nativesOf(Paths.get(block).getParent.toString)

  /** Timestamp input columns are canonicalized to the reference's i64
    * NANOS representation (ref `src/schema.rs:8`) before encoding —
    * `unix_micros * 1000`, exact for µs data, with NTZ cast through the
    * session zone (graft sessions pin UTC, so the cast is the identity
    * on micros). Every downstream path (meta, encode, stats, ts<W>@<R>
    * deltas) then sees the one Long shape, and read-back is i64 nanos
    * matching Tables.eventsRawTs' contract. */
  private def canonTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, unix_micros}
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case TimestampType | TimestampNTZType =>
          d.withColumn(f.name,
            unix_micros(col(f.name).cast(TimestampType)) * lit(1000L))
        case _ => d
      }
    }
  }

  /** Distributed fixture/ingest writer: one `block-<partition>` dir per
    * input partition (executors share the filesystem on local[*]; on a
    * cluster this would target a DFS path via the Hadoop FS API). */
  def write(df: DataFrame, dir: String): Unit = write(df, dir, Map.empty)

  /** Write with explicit native types for some columns (e.g.
    * `"volume" -> "u64"`, `"sym" -> "sym8"`, `"ts" -> "ts2@60000000000"`);
    * unlisted columns use the Spark-type default. Each override's
    * widened Spark type must equal the DataFrame column's type. */
  def write(df: DataFrame, dir: String, nativeTypes: Map[String, String]): Unit = {
    val canon = canonTs(df)
    writeMeta(canon.schema, dir, nativeTypes)
    appendBlocks(canon, dir, tag = "")
  }

  /** Append a batch as new blocks tagged `block-<tag><pid>` without
    * touching existing ones — the streaming-ingest face (each
    * micro-batch appends its own blocks, the reference's partition
    * rollover). Creates the meta sidecar on first use; later batches
    * must match its schema. */
  def append(df: DataFrame, dir: String, tag: String): Unit = {
    val canon = canonTs(df)
    if (!Files.exists(Paths.get(dir, MetaFile))) writeMeta(canon.schema, dir)
    else require(schemaOf(dir) == StructType(canon.schema.fields.map(f =>
      StructField(f.name, f.dataType, nullable = false))),
      s"schema mismatch appending to graft-native table at $dir")
    appendBlocks(canon, dir, tag)
  }

  private def writeMeta(schema: StructType, dir: String,
      nativeTypes: Map[String, String] = Map.empty): Unit = {
    nativeTypes.keys.foreach(k => require(schema.fieldNames.contains(k),
      s"native-type override for unknown column '$k'"))
    val natives = schema.fields.map { f =>
      val native = nativeTypes.getOrElse(f.name, typeOf(f.dataType))
      require(sparkOf(native) == f.dataType,
        s"column '${f.name}': native type $native widens to ${sparkOf(native)}, " +
          s"but the DataFrame column is ${f.dataType}")
      f.name -> native
    }
    Files.createDirectories(Paths.get(dir))
    writeNatives(natives, dir)
  }

  private def writeNatives(natives: Array[(String, String)], dir: String): Unit = {
    val meta = natives
      .map { case (n, t) => s"""{"name":"$n","type":"$t"}""" }
      .mkString("""{"cols":[""", ",", "]}")
    Files.write(Paths.get(dir, MetaFile), meta.getBytes(StandardCharsets.UTF_8))
  }

  /** Stream-ingest replay high-water mark (written atomically by
    * `Ingest.appendNativeIdempotent`): the highest batch id whose
    * blocks are durably complete. -1 when the table has none. */
  private[graft] val StreamMarkFile = "_last_stream_batch"
  // exactly the streaming tag shape (b%06d-): a user tag like "b1-"
  // must not be mistaken for a stream batch and excluded from compaction
  private val StreamBlockRe = "block-b(\\d{6,})-.*".r
  private[graft] def streamMark(dir: String): Long = {
    val p = Paths.get(dir, StreamMarkFile)
    if (Files.exists(p))
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong
    else -1L
  }

  /** Integral (and compressed-ts) natives read back to a Long for
    * stats; floats and symbols are handled separately. */
  private def longGetter(native: String): Option[(Row, Int) => Long] = native match {
    case "i8" => Some((r, i) => r.getByte(i).toLong)
    case "u8" | "i16" => Some((r, i) => r.getShort(i).toLong)
    case "u16" | "i32" => Some((r, i) => r.getInt(i).toLong)
    case "u32" | "i64" | "u64" => Some((r, i) => r.getLong(i))
    case TsRe(_, _) => Some((r, i) => r.getLong(i))
    case _ => None
  }

  private def appendBlocks(df: DataFrame, dir: String, tag: String): Unit = {
    val schema = df.schema
    // encode per the TABLE's declared native types (meta order may use
    // narrow widths the Spark schema can't express)
    val nativeByName = nativesOf(dir).toMap
    val fields = schema.fields.map(f => (f.name, nativeByName(f.name)))
    df.rdd.mapPartitionsWithIndex { case (pid, rows) =>
      val block = Paths.get(dir, f"block-$tag$pid%05d")
      val data = rows.toArray
      // empty partitions write NOTHING — an empty block dir (no .bin,
      // no stats) would otherwise brick every later scan's eager reads
      if (data.nonEmpty) {
        Files.createDirectories(block)
        fields.zipWithIndex.foreach { case ((name, typ), i) =>
          writeColumn(block, name, typ, data, i)
        }
        // per-block numeric min/max sidecar — the reference's partition
        // metadata (ref src/table/meta.rs), used for block skipping;
        // ts-compressed columns record their RECONSTRUCTED nanos bounds
        val stats = fields.zipWithIndex.flatMap {
          case ((name, "f64"), i) =>
            val vs = data.map(_.getDouble(i))
            Some(s""""$name":[${vs.min},${vs.max}]""")
          case ((name, "f32"), i) =>
            val vs = data.map(_.getFloat(i))
            Some(s""""$name":[${vs.min},${vs.max}]""")
          case ((name, native), i) => longGetter(native).map { g =>
            val vs = data.map(g(_, i))
            s""""$name":[${vs.min},${vs.max}]"""
          }
        }
        Files.write(block.resolve("_stats.json"),
          (stats :+ s""""__rows":[${data.length},${data.length}]""")
            .mkString("{", ",", "}").getBytes(StandardCharsets.UTF_8))
      }
      Iterator.single(data.length)
    }.count()
    ()
  }

  /** Merge all blocks into `numBlocks` fresh ones — the small-file
    * compaction a streaming-ingested native table needs (micro-batches
    * append one block per burst; scans pay per-block open cost). The
    * rewrite materializes fully into a sibling dir BEFORE any old block
    * is removed, then swaps — same copy-on-write discipline as
    * ZTable.compact. Stats/dict sidecars regenerate with the new
    * blocks. Returns the number of blocks replaced. */
  def compactBlocks(spark: org.apache.spark.sql.SparkSession, dir: String,
      numBlocks: Int): Int = lockFor(dir).synchronized {
    val tmp = dir + ".compacting"
    recoverCompaction(dir)
    // SNAPSHOT the block list before planning the rewrite scan, read
    // exactly that snapshot (the `blocks` option), and later delete only
    // the snapshot: blocks appended concurrently by a streaming ingest
    // are neither folded into the rewrite nor deleted — they simply
    // survive next to the compacted ones.
    // a stream batch BEYOND the replay high-water mark is a crashed
    // attempt mid-replay: folding its blocks into g-names would defeat
    // appendNativeIdempotent's prefix cleanup and the replay would land
    // the batch twice — leave those blocks under their original names
    // for the replay to supersede
    val lastBatch = streamMark(dir)
    val old = listDir(Paths.get(dir))
      .filter(p => p.getFileName.toString.startsWith("block-") && Files.isDirectory(p))
      .map(_.getFileName.toString).sorted
      .filterNot(n => StreamBlockRe.findFirstMatchIn(n)
        .exists(_.group(1).toLong > lastBatch))
    if (old.isEmpty) return 0
    // fresh generation tag: rewritten block names can never equal a
    // retired name, so roll-forward recovery can re-run from any point
    // without mistaking a freshly-moved block for a to-retire one
    val gen = old.flatMap(n =>
      "block-g(\\d+)-.*".r.findFirstMatchIn(n).map(_.group(1).toInt))
      .maxOption.getOrElse(-1) + 1
    val natives = nativesOf(dir)
    val narrowTs = natives.collect { case (n, TsRe(w, _)) if w.toInt < 8 => n }
    val base = spark.read.format("graft-native")
      .option("blocks", old.mkString(","))
      .load(dir)
    // delta-compressed ts stores offsets against a PER-BLOCK min, so a
    // round-robin merge of far-apart blocks overflows a narrow width
    // even though every source block was valid — range-partition on
    // the ts column to keep each output block's span minimal (also the
    // better layout for block skipping)
    val df = narrowTs.headOption match {
      case Some(tsName) => base.repartitionByRange(numBlocks,
        org.apache.spark.sql.functions.col(tsName))
      case None => base.repartition(numBlocks)
    }
    // the rewrite must encode with the TABLE's declared native types
    // (narrow widths, dict codes, compressed ts) — copy the original
    // meta rather than re-deriving defaults from the widened Spark
    // schema, or the compacted blocks decode with the wrong widths
    Files.createDirectories(Paths.get(tmp))
    Files.copy(Paths.get(dir, MetaFile), Paths.get(tmp, MetaFile),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    try appendBlocks(df, tmp, tag = s"g$gen-")
    catch {
      // even range-clustered, a merged block can exceed a narrow ts
      // width's span, or merge blocks whose mins disagree modulo the
      // resolution. Losing the delta compression beats a permanently
      // uncompactable table: retry once with those columns as plain
      // i64 nanos (bit-identical on read — ts decodes to i64 nanos
      // either way; the width is a storage detail)
      case e: Exception if narrowTs.nonEmpty && Iterator.iterate(e: Throwable)(_.getCause)
          .takeWhile(_ != null).take(10).flatMap(t => Option(t.getMessage)).exists(m =>
            m.contains("exceeds") && m.contains("width") || m.contains("resolution grid")) =>
        listBlockDirs(tmp).foreach(deleteBlockDir)
        val widened = natives.map { case (n, t) =>
          (n, if (narrowTs.contains(n)) "i64" else t) }
        writeNatives(widened, tmp)
        appendBlocks(df, tmp, tag = s"g$gen-")
        // the TABLE meta must stay at its declared widths (concurrent
        // appends keep encoding with it) — each widened block instead
        // carries a block-local meta the readers prefer (nativesOfBlock)
        listBlockDirs(tmp).foreach(b => writeNatives(widened, b.toString))
    }
    // COMMIT POINT: once the marker (listing the blocks to retire)
    // exists, the rewrite is durable and recovery can always roll
    // FORWARD; without it, recovery rolls back by discarding tmp.
    Files.write(Paths.get(tmp, CommitFile),
      old.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finishCompaction(dir)
    old.size
  }

  private[sources] val CommitFile = "_commit"

  /** JVM-wide per-table locks (normalized dir): a read rolling a
    * committed compaction forward must not race the live compactBlocks
    * doing the same swap (two concurrent [[finishCompaction]] passes
    * race on the deletes/moves). Appends stay lock-free — the snapshot
    * discipline in [[compactBlocks]] already makes them safe. Cross-
    * process coordination is out of scope (manifest commits are the
    * production answer). */
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(dir: String): Object =
    locks.computeIfAbsent(
      Paths.get(dir).toAbsolutePath.normalize.toString, _ => new Object)

  /** Second, INNER lock guarding just the swap window (finish /
    * roll-forward / scan-time block listing). compactBlocks holds the
    * op lock for its whole (minutes-long) rewrite; scans must not wait
    * on that — they only need the few milliseconds of
    * [[finishCompaction]]'s delete+move excluded, or a listing taken
    * mid-swap sees NEITHER the retired nor the moved-in copy and the
    * query silently returns partial rows. Order is always op lock →
    * swap lock; the swap lock is innermost everywhere. */
  private val swapLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[sources] def swapLockFor(dir: String): Object =
    swapLocks.computeIfAbsent(
      Paths.get(dir).toAbsolutePath.normalize.toString, _ => new Object)

  /** Read-path guard: a crash AFTER [[compactBlocks]]' commit point
    * leaves the table mid-swap — some retired blocks deleted, the
    * rewritten ones still in the sibling staging dir — and a scan would
    * silently miss those rows until the next compaction. Loads roll a
    * COMMITTED staging forward under the table lock. An UNCOMMITTED
    * staging is left alone: it is either a live compaction's
    * work-in-progress (invisible to reads, and deleting it would abort
    * that compaction) or harmless debris the next compaction rolls
    * back. */
  private[sources] def maybeRecover(dir: String): Unit = {
    val commit = Paths.get(dir + ".compacting", CommitFile)
    if (Files.exists(commit)) finishCompaction(dir) // re-checks under its lock
  }

  /** Block dirs of a table (shared helper for compaction/replay cleanup). */
  private[graft] def listBlockDirs(dir: String): Seq[Path] =
    listDir(Paths.get(dir))
      .filter(p => p.getFileName.toString.startsWith("block-") && Files.isDirectory(p))

  /** Delete one block dir and its files. */
  private[graft] def deleteBlockDir(b: Path): Unit = {
    listDir(b).foreach(Files.delete); Files.delete(b)
  }

  /** Finish a committed compaction: retire the marker's old blocks,
    * move the rewritten blocks in, drop the tmp dir. Idempotent — safe
    * to re-run from any partial state after the commit point. */
  private def finishCompaction(dir: String): Unit = swapLockFor(dir).synchronized {
    val tmpP = Paths.get(dir + ".compacting")
    if (!Files.exists(tmpP.resolve(CommitFile))) return // already finished
    val retire = new String(Files.readAllBytes(tmpP.resolve(CommitFile)),
      StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty)
    retire.map(Paths.get(dir, _)).filter(Files.exists(_)).foreach(deleteBlockDir)
    listDir(tmpP).filter(_.getFileName.toString.startsWith("block-")).foreach { b =>
      val target = Paths.get(dir, b.getFileName.toString)
      if (Files.exists(target)) deleteBlockDir(b) // crash mid-move: keep the moved copy
      else Files.move(b, target)
    }
    if (Files.exists(tmpP.resolve(MetaFile))) Files.delete(tmpP.resolve(MetaFile))
    Files.delete(tmpP.resolve(CommitFile))
    Files.delete(tmpP)
  }

  /** Crash recovery for [[compactBlocks]], run on entry (and callable
    * directly when opening a table after a crash): a tmp dir WITH the
    * commit marker is rolled forward (the rewrite was complete); one
    * without is rolled back by deleting it (the source blocks were
    * never touched before the commit point, so no data is lost). */
  def recoverCompaction(dir: String): Unit = lockFor(dir).synchronized {
    val tmpP = Paths.get(dir + ".compacting")
    if (!Files.exists(tmpP)) return
    if (Files.exists(tmpP.resolve(CommitFile))) finishCompaction(dir)
    else {
      listDir(tmpP).foreach { b =>
        if (Files.isDirectory(b)) deleteBlockDir(b) else Files.delete(b)
      }
      Files.delete(tmpP)
    }
  }

  /** A block's symbol dictionary as a set, if the sidecar exists.
    * Symbol-count-sized (same class as the stats sidecar): reading it
    * at plan time costs one small file per block per string filter. */
  private[sources] def blockDict(block: String, colName: String): Option[Set[String]] = {
    val p = Paths.get(block, s"$colName.dict")
    if (!Files.exists(p)) None
    else Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .split("\n", -1).toSet)
  }

  /** Exact per-block bounds (BigDecimal — i64 nanos exceed a double's
    * 2^53 integer range, and a rounded bound could wrongly skip). */
  private[sources] def blockStats(
      block: String): Map[String, (java.math.BigDecimal, java.math.BigDecimal)] = {
    val p = Paths.get(block, "_stats.json")
    if (!Files.exists(p)) Map.empty
    else """"([^"]+)":\[([-0-9.eE]+),([-0-9.eE]+)\]""".r
      .findAllMatchIn(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
      .map(m => m.group(1) ->
        (new java.math.BigDecimal(m.group(2)), new java.math.BigDecimal(m.group(3))))
      .toMap
  }

  private def writeColumn(block: Path, name: String, typ: String,
      rows: Array[Row], i: Int): Unit = typ match {
    case "i64" =>
      val bb = ByteBuffer.allocate(rows.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      rows.foreach(r => bb.putLong(r.getLong(i)))
      Files.write(block.resolve(s"$name.bin"), bb.array())
    case "u64" =>
      val bb = ByteBuffer.allocate(rows.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      rows.foreach { r =>
        val v = r.getLong(i)
        require(v >= 0L, s"u64 column $name: value $v out of the " +
          "supported [0, 2^63-1] range (SURVEY §1.2: u64 reads as long)")
        bb.putLong(v)
      }
      Files.write(block.resolve(s"$name.bin"), bb.array())
    case "f64" =>
      val bb = ByteBuffer.allocate(rows.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      rows.foreach(r => bb.putDouble(r.getDouble(i)))
      Files.write(block.resolve(s"$name.bin"), bb.array())
    case "i32" =>
      val bb = ByteBuffer.allocate(rows.length * 4).order(ByteOrder.LITTLE_ENDIAN)
      rows.foreach(r => bb.putInt(r.getInt(i)))
      Files.write(block.resolve(s"$name.bin"), bb.array())
    case "u32" =>
      val bb = ByteBuffer.allocate(rows.length * 4).order(ByteOrder.LITTLE_ENDIAN)
      rows.foreach { r =>
        val v = r.getLong(i)
        require(v >= 0L && v <= 0xFFFFFFFFL, s"u32 column $name: $v out of range")
        bb.putInt(v.toInt)
      }
      Files.write(block.resolve(s"$name.bin"), bb.array())
    case "f32" =>
      val bb = ByteBuffer.allocate(rows.length * 4).order(ByteOrder.LITTLE_ENDIAN)
      rows.foreach(r => bb.putFloat(r.getFloat(i)))
      Files.write(block.resolve(s"$name.bin"), bb.array())
    case "i16" =>
      val bb = ByteBuffer.allocate(rows.length * 2).order(ByteOrder.LITTLE_ENDIAN)
      rows.foreach(r => bb.putShort(r.getShort(i)))
      Files.write(block.resolve(s"$name.bin"), bb.array())
    case "u16" =>
      val bb = ByteBuffer.allocate(rows.length * 2).order(ByteOrder.LITTLE_ENDIAN)
      rows.foreach { r =>
        val v = r.getInt(i)
        require(v >= 0 && v <= 0xFFFF, s"u16 column $name: $v out of range")
        bb.putShort(v.toShort)
      }
      Files.write(block.resolve(s"$name.bin"), bb.array())
    case "i8" =>
      Files.write(block.resolve(s"$name.bin"), rows.map(_.getByte(i)))
    case "u8" =>
      Files.write(block.resolve(s"$name.bin"), rows.map { r =>
        val v = r.getShort(i)
        require(v >= 0 && v <= 0xFF, s"u8 column $name: $v out of range")
        v.toByte
      })
    case "str" | "sym8" | "sym16" =>
      val width = widthOfNative(typ)
      val maxSyms = 1L << (width * 8)
      val dict = mutable.LinkedHashMap.empty[String, Int]
      val bb = ByteBuffer.allocate(rows.length * width).order(ByteOrder.LITTLE_ENDIAN)
      rows.foreach { r =>
        val s = r.getString(i)
        require(s.indexOf('\n') < 0, // dict sidecar is line-per-symbol (ref scheme)
          s"graft-native str values must not contain newlines: column $name")
        val code = dict.getOrElseUpdate(s, dict.size)
        require(dict.size <= maxSyms,
          s"$typ column $name: more than $maxSyms distinct symbols")
        width match {
          case 1 => bb.put(code.toByte)
          case 2 => bb.putShort(code.toShort)
          case _ => bb.putInt(code)
        }
      }
      Files.write(block.resolve(s"$name.bin"), bb.array())
      Files.write(block.resolve(s"$name.dict"),
        dict.keys.mkString("\n").getBytes(StandardCharsets.UTF_8))
    case TsRe(_, _) =>
      val (width, res) = tsParams(typ)
      val vs = rows.map(_.getLong(i))
      val min = vs.min
      val bb = ByteBuffer.allocate(8 + rows.length * width)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.putLong(min)
      val maxDelta = if (width == 8) Long.MaxValue else (1L << (width * 8)) - 1
      vs.foreach { v =>
        val off = v - min
        require(off % res == 0, s"ts column $name: $v is off the " +
          s"$res-nanos resolution grid relative to block min $min — " +
          "floor timestamps to the resolution before writing")
        val delta = off / res
        require(delta >= 0 && delta <= maxDelta,
          s"ts column $name: delta $delta exceeds $width-byte width")
        width match {
          case 1 => bb.put(delta.toByte)
          case 2 => bb.putShort(delta.toShort)
          case 4 => bb.putInt(delta.toInt)
          case _ => bb.putLong(delta)
        }
      }
      Files.write(block.resolve(s"$name.bin"), bb.array())
  }
}

/** `spark.read.format("graft-native").load(dir)` entry point. */
class GraftNativeSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-native"
  private def path(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "graft-native requires a path")
    p
  }
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    // every load passes through here — the one read-side hook where a
    // crashed-but-committed compaction can be rolled forward before
    // block listing happens (see GraftNative.maybeRecover)
    GraftNative.maybeRecover(path(options))
    GraftNative.schemaOf(path(options))
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GraftNativeTable(properties.get("path"), schema)
}

class GraftNativeTable(dir: String, schema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft-native `$dir`"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftNativeScanBuilder(dir, schema,
      // optional exact-block allowlist (comma-separated dir names) —
      // lets compaction rewrite a SNAPSHOT of the block list so blocks
      // appended concurrently are neither duplicated nor dropped
      Option(options.get("blocks")).map(_.split(",").filter(_.nonEmpty).toSet))
}

/** One pushed aggregate: kind ∈ min|max|count, with the source column
  * (empty for count) and its data type. */
case class GraftNativeAgg(kind: String, col: String, dt: DataType)

class GraftNativeScanBuilder(dir: String, full: StructType,
    blocks: Option[Set[String]] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
  import org.apache.spark.sql.sources._
  private var required: StructType = full
  private var skippable: Array[Filter] = Array.empty
  private var aggs: Option[Seq[GraftNativeAgg]] = None

  /** MIN/MAX/COUNT(*) with no grouping answer from the per-block stats
    * sidecars alone — zero column files read (the reference's
    * "metadata answers first/last-ts" C2 shape, ref src/table/meta.rs).
    * Partial-pushdown contract: one row per block, Spark finalizes
    * (min of mins, sum of counts). Spark only attempts this when no
    * post-scan filters remain; every filter here is residual, so the
    * pushdown can never see a filtered scan. */
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (agg.groupByExpressions.nonEmpty || skippable.nonEmpty) return false
    def statCol(e: org.apache.spark.sql.connector.expressions.Expression): Option[StructField] =
      e match {
        case f: NamedReference if f.fieldNames.length == 1 =>
          full.fields.find(x => x.name == f.fieldNames.head &&
            (x.dataType == LongType || x.dataType == DoubleType ||
             x.dataType == IntegerType || x.dataType == FloatType ||
             x.dataType == ShortType || x.dataType == ByteType))
        case _ => None
      }
    val specs = agg.aggregateExpressions().toSeq.map {
      case m: Min => statCol(m.column).map(f => GraftNativeAgg("min", f.name, f.dataType))
      case m: Max => statCol(m.column).map(f => GraftNativeAgg("max", f.name, f.dataType))
      case _: CountStar => Some(GraftNativeAgg("count", "", LongType))
      case _ => None
    }
    if (specs.exists(_.isEmpty)) return false
    // every non-empty block must carry a stats sidecar
    val blocks = GraftNative.listDir(Paths.get(dir))
      .filter(p => p.getFileName.toString.startsWith("block-") && Files.isDirectory(p))
    val ok = blocks.forall { b =>
      !GraftNative.listDir(b).exists(_.toString.endsWith(".bin")) ||
        Files.exists(b.resolve("_stats.json"))
    }
    if (!ok) return false
    aggs = Some(specs.flatten)
    true
  }
  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve file-schema field order; empty projection (count(*)) is legal
    required = StructType(full.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))
  /** Numeric range/equality/membership filters drive BLOCK SKIPPING
    * against the per-block min/max sidecars (the reference's
    * partition-metadata seek, ref src/table/meta.rs); string
    * equality/membership skips via the line-per-symbol dict sidecars
    * (the reference's symbol dictionary, ref src/table/read.rs:13-23 —
    * a symbol absent from a block's dict provably has no rows there,
    * which is P5 symbol-membership filtering answered from metadata).
    * Everything is returned as residual — skipping is pruning, not
    * evaluation — so Spark re-applies the exact predicate above the
    * scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    skippable = filters.filter {
      case GreaterThan(_, _: Number) | GreaterThanOrEqual(_, _: Number) |
           LessThan(_, _: Number) | LessThanOrEqual(_, _: Number) |
           EqualTo(_, _: Number) | EqualTo(_, _: String) => true
      case In(_, vs) => vs.nonEmpty &&
        (vs.forall(_.isInstanceOf[Number]) || vs.forall(_.isInstanceOf[String]))
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = skippable
  override def build(): Scan =
    GraftNativeScan(dir, required, skippable.toSeq, aggs, blocks)
}

case class GraftNativeBlock(block: String) extends InputPartition

case class GraftNativeScan(dir: String, required: StructType,
    filters: Seq[org.apache.spark.sql.sources.Filter] = Nil,
    aggs: Option[Seq[GraftNativeAgg]] = None,
    blocks: Option[Set[String]] = None)
    extends Scan with Batch with Serializable {
  import org.apache.spark.sql.sources._
  override def readSchema(): StructType = aggs match {
    case Some(specs) => StructType(specs.zipWithIndex.map { case (a, i) =>
      StructField(s"${a.kind}_$i", a.dt, nullable = a.kind != "count")
    })
    case None => required
  }
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-native cols=[${required.fieldNames.mkString(",")}] " +
      s"skipFilters=[${filters.mkString(",")}]" +
      aggs.fold("")(s => s" pushedAggs=[${s.map(a => a.kind + "(" + a.col + ")").mkString(",")}]")

  private def dec(v: Any): java.math.BigDecimal =
    new java.math.BigDecimal(v.toString)

  /** True iff the stats PROVE no row of this block can match. */
  private def provablyEmpty(block: String): Boolean = {
    val stats = GraftNative.blockStats(block)
    filters.exists {
      case GreaterThan(c, v: Number) =>
        stats.get(c).exists { case (_, mx) => mx.compareTo(dec(v)) <= 0 }
      case GreaterThanOrEqual(c, v: Number) =>
        stats.get(c).exists { case (_, mx) => mx.compareTo(dec(v)) < 0 }
      case LessThan(c, v: Number) =>
        stats.get(c).exists { case (mn, _) => mn.compareTo(dec(v)) >= 0 }
      case LessThanOrEqual(c, v: Number) =>
        stats.get(c).exists { case (mn, _) => mn.compareTo(dec(v)) > 0 }
      case EqualTo(c, v: Number) =>
        stats.get(c).exists { case (mn, mx) =>
          dec(v).compareTo(mn) < 0 || dec(v).compareTo(mx) > 0 }
      case EqualTo(c, v: String) =>
        GraftNative.blockDict(block, c).exists(!_.contains(v))
      case In(c, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
        GraftNative.blockDict(block, c).exists(d => !vs.exists(v =>
          d.contains(v.asInstanceOf[String])))
      case In(c, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Number]) =>
        stats.get(c).exists { case (mn, mx) => vs.forall { v =>
          val d = dec(v.asInstanceOf[Number])
          d.compareTo(mn) < 0 || d.compareTo(mx) > 0 } }
      case _ => false
    }
  }

  override def planInputPartitions(): Array[InputPartition] =
    // under the swap lock: a listing taken inside finishCompaction's
    // delete+move window sees NEITHER the retired nor the moved-in
    // blocks and the scan silently returns partial rows. The lock is
    // held only for those milliseconds — a compaction's minutes-long
    // rewrite holds the separate op lock, so scans never wait on it.
    GraftNative.swapLockFor(dir).synchronized {
      GraftNative.listDir(Paths.get(dir))
        .filter(p => p.getFileName.toString.startsWith("block-") &&
          Files.isDirectory(p) &&
          // defensive: a COMPLETELY empty block dir (left by a crashed
          // writer) contributes no rows instead of a read error; dirs
          // holding only a stats sidecar stay plannable (the aggregate
          // pushdown path reads metadata alone)
          GraftNative.listDir(p).nonEmpty)
        .filter(p => blocks.forall(_.contains(p.getFileName.toString)))
        .sortBy(_.getFileName.toString)
        .filterNot(p => provablyEmpty(p.toString))
        .map(p => GraftNativeBlock(p.toString): InputPartition)
        .toArray
    }
  override def createReaderFactory(): PartitionReaderFactory = aggs match {
    case Some(specs) => new GraftNativeAggReaderFactory(specs)
    case None => new GraftNativeReaderFactory(required)
  }
}

/** Aggregate-pushdown reader: ONE row per block, straight from the
  * stats sidecar — no column file is ever opened (spec proves it by
  * deleting them all). */
class GraftNativeAggReaderFactory(specs: Seq[GraftNativeAgg])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val block = partition.asInstanceOf[GraftNativeBlock].block
      private val stats = GraftNative.blockStats(block)
      private var emitted = false
      override def next(): Boolean =
        if (emitted || stats.isEmpty) false else { emitted = true; true }
      override def get(): InternalRow = {
        val vals: Array[Any] = specs.map { a =>
          def bound(lo: Boolean) = if (lo) stats(a.col)._1 else stats(a.col)._2
          a.kind match {
            case "count" => stats("__rows")._1.longValueExact(): Any
            case k =>
              val b = bound(k == "min")
              // each branch ascribes Any: match-type unification would
              // otherwise numerically widen every bound to Double
              a.dt match {
                case LongType => b.longValueExact(): Any
                case IntegerType => b.intValueExact(): Any
                case ShortType => b.shortValueExact(): Any
                case ByteType => b.byteValueExact(): Any
                case FloatType => b.floatValue(): Any
                case _ => b.doubleValue(): Any
              }
          }
        }.toArray
        new GenericInternalRow(vals)
      }
      override def close(): Unit = ()
    }
}

class GraftNativeReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftNativeReader(partition.asInstanceOf[GraftNativeBlock].block, required)
  /** Non-empty projections read COLUMNAR (S4 "zero-copy columnar batch"
    * made literal in Spark terms: the scan emits ColumnarBatch and rows
    * materialize only at the ColumnarToRow boundary, inside whole-stage
    * codegen). The empty projection (count(*) with residual filters)
    * stays on the row reader — a zero-column batch buys nothing. */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    required.fields.nonEmpty
  override def createColumnarReader(partition: InputPartition): PartitionReader[ColumnarBatch] =
    new GraftNativeColumnarReader(partition.asInstanceOf[GraftNativeBlock].block, required)
}

/** Columnar block reader: each column file is decoded ONCE into a
  * primitive array (the moral equivalent of the reference's
  * reinterpret-mmap-as-typed-slice, ref src/table/read.rs:109-128 —
  * the JVM can't alias bytes as long[] without copying, so this is one
  * bulk copy instead of zero, still no per-row boxing), then served as
  * 4096-row ColumnarBatches through reused OnHeapColumnVectors with
  * bulk put(Longs|Doubles). Dictionary codes stay codes until batch
  * fill; each batch row writes the pre-encoded UTF-8 bytes of its dict
  * entry. */
class GraftNativeColumnarReader(block: String, required: StructType)
    extends PartitionReader[ColumnarBatch] {
  private val BatchRows = 4096

  private sealed trait Col { def fill(vec: OnHeapColumnVector, start: Int, n: Int): Unit }
  private final class LongCol(vs: Array[Long]) extends Col {
    def fill(vec: OnHeapColumnVector, start: Int, n: Int): Unit =
      vec.putLongs(0, n, vs, start)
  }
  private final class DoubleCol(vs: Array[Double]) extends Col {
    def fill(vec: OnHeapColumnVector, start: Int, n: Int): Unit =
      vec.putDoubles(0, n, vs, start)
  }
  private final class IntCol(vs: Array[Int]) extends Col {
    def fill(vec: OnHeapColumnVector, start: Int, n: Int): Unit =
      vec.putInts(0, n, vs, start)
  }
  private final class FloatCol(vs: Array[Float]) extends Col {
    def fill(vec: OnHeapColumnVector, start: Int, n: Int): Unit =
      vec.putFloats(0, n, vs, start)
  }
  private final class ShortCol(vs: Array[Short]) extends Col {
    def fill(vec: OnHeapColumnVector, start: Int, n: Int): Unit =
      vec.putShorts(0, n, vs, start)
  }
  private final class ByteCol(vs: Array[Byte]) extends Col {
    def fill(vec: OnHeapColumnVector, start: Int, n: Int): Unit =
      vec.putBytes(0, n, vs, start)
  }
  private final class DictCol(codes: Array[Int], dict: Array[Array[Byte]]) extends Col {
    def fill(vec: OnHeapColumnVector, start: Int, n: Int): Unit = {
      var i = 0
      while (i < n) { vec.putByteArray(i, dict(codes(start + i))); i += 1 }
    }
  }

  private val natives: Map[String, String] =
    GraftNative.nativesOfBlock(block).toMap

  private val cols: Array[Col] = required.fields.map { f =>
    val native = natives(f.name)
    val bytes = Files.readAllBytes(Paths.get(block, s"${f.name}.bin"))
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def n = (bytes.length - GraftNative.headerOfNative(native)) /
      GraftNative.widthOfNative(native)
    native match {
      case "i64" | "u64" =>
        val vs = new Array[Long](n)
        bb.asLongBuffer().get(vs)
        new LongCol(vs)
      case "f64" =>
        val vs = new Array[Double](n)
        bb.asDoubleBuffer().get(vs)
        new DoubleCol(vs)
      case "i32" =>
        val vs = new Array[Int](n)
        bb.asIntBuffer().get(vs)
        new IntCol(vs)
      case "u32" =>
        new LongCol(Array.tabulate(n)(i => bb.getInt(i * 4) & 0xFFFFFFFFL))
      case "f32" =>
        val vs = new Array[Float](n)
        bb.asFloatBuffer().get(vs)
        new FloatCol(vs)
      case "i16" =>
        val vs = new Array[Short](n)
        bb.asShortBuffer().get(vs)
        new ShortCol(vs)
      case "u16" =>
        new IntCol(Array.tabulate(n)(i => bb.getShort(i * 2) & 0xFFFF))
      case "i8" => new ByteCol(bytes)
      case "u8" =>
        new ShortCol(Array.tabulate(n)(i => (bytes(i) & 0xFF).toShort))
      case "str" | "sym8" | "sym16" =>
        val codes = GraftNative.widthOfNative(native) match {
          case 1 => Array.tabulate(n)(i => bytes(i) & 0xFF)
          case 2 => Array.tabulate(n)(i => bb.getShort(i * 2) & 0xFFFF)
          case _ =>
            val cs = new Array[Int](n)
            bb.asIntBuffer().get(cs)
            cs
        }
        val dict = new String(Files.readAllBytes(Paths.get(block, s"${f.name}.dict")),
          StandardCharsets.UTF_8).split("\n", -1)
          .map(_.getBytes(StandardCharsets.UTF_8))
        new DictCol(codes, dict)
      case ts =>
        val (width, res) = GraftNative.tsParams(ts)
        val min = bb.getLong(0)
        def delta(i: Int): Long = width match {
          case 1 => bytes(8 + i) & 0xFFL
          case 2 => (bb.getShort(8 + i * 2) & 0xFFFF).toLong
          case 4 => bb.getInt(8 + i * 4) & 0xFFFFFFFFL
          case _ => bb.getLong(8 + i * 8)
        }
        new LongCol(Array.tabulate(n)(i => min + delta(i) * res))
    }
  }
  private val nRows: Int = {
    val f = required.fields.head
    val native = natives(f.name)
    ((Files.size(Paths.get(block, s"${f.name}.bin")) -
      GraftNative.headerOfNative(native)) /
      GraftNative.widthOfNative(native)).toInt
  }
  private val vecs: Array[OnHeapColumnVector] =
    required.fields.map(f => new OnHeapColumnVector(BatchRows, f.dataType))
  private val batch = new ColumnarBatch(vecs.map(v => v: ColumnVector))
  private var pos = 0

  override def next(): Boolean =
    if (pos >= nRows) false
    else {
      val n = math.min(BatchRows, nRows - pos)
      var c = 0
      while (c < cols.length) {
        vecs(c).reset()
        cols(c).fill(vecs(c), pos, n)
        c += 1
      }
      batch.setNumRows(n)
      pos += n
      true
    }
  override def get(): ColumnarBatch = batch
  override def close(): Unit = vecs.foreach(_.close())
}

/** Reads one block: only the REQUIRED columns' files are opened — the
  * pruning is literal (untouched columns cost zero I/O). */
class GraftNativeReader(block: String, required: StructType)
    extends PartitionReader[InternalRow] {
  private val natives: Map[String, String] =
    GraftNative.nativesOfBlock(block).toMap

  private val cols: Array[Int => Any] = required.fields.map { f =>
    val native = natives(f.name)
    val bytes = Files.readAllBytes(Paths.get(block, s"${f.name}.bin"))
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    native match {
      case "i64" | "u64" => (i: Int) => bb.getLong(i * 8)
      case "f64" => (i: Int) => bb.getDouble(i * 8)
      case "i32" => (i: Int) => bb.getInt(i * 4)
      case "u32" => (i: Int) => bb.getInt(i * 4) & 0xFFFFFFFFL
      case "f32" => (i: Int) => bb.getFloat(i * 4)
      case "i16" => (i: Int) => bb.getShort(i * 2)
      case "u16" => (i: Int) => bb.getShort(i * 2) & 0xFFFF
      case "i8" => (i: Int) => bytes(i)
      case "u8" => (i: Int) => (bytes(i) & 0xFF).toShort
      case "str" | "sym8" | "sym16" =>
        val dict = new String(Files.readAllBytes(Paths.get(block, s"${f.name}.dict")),
          StandardCharsets.UTF_8).split("\n", -1).map(UTF8String.fromString)
        GraftNative.widthOfNative(native) match {
          case 1 => (i: Int) => dict(bytes(i) & 0xFF)
          case 2 => (i: Int) => dict(bb.getShort(i * 2) & 0xFFFF)
          case _ => (i: Int) => dict(bb.getInt(i * 4))
        }
      case ts =>
        val (width, res) = GraftNative.tsParams(ts)
        val min = bb.getLong(0)
        width match {
          case 1 => (i: Int) => min + (bytes(8 + i) & 0xFFL) * res
          case 2 => (i: Int) => min + (bb.getShort(8 + i * 2) & 0xFFFF).toLong * res
          case 4 => (i: Int) => min + (bb.getInt(8 + i * 4) & 0xFFFFFFFFL) * res
          case _ => (i: Int) => min + bb.getLong(8 + i * 8) * res
        }
    }
  }
  private val nRows: Long = {
    // row count from any present column file's width; a pruned-to-zero
    // projection (count(*)) falls back to the first meta column
    val name =
      if (required.fields.nonEmpty) required.fields.head.name
      else GraftNative.nativesOfBlock(block).head._1
    val native = natives(name)
    (Files.size(Paths.get(block, s"$name.bin")) -
      GraftNative.headerOfNative(native)) / GraftNative.widthOfNative(native)
  }
  private var row = -1
  override def next(): Boolean = { row += 1; row < nRows }
  override def get(): InternalRow =
    new GenericInternalRow(cols.map(f => f(row)).asInstanceOf[Array[Any]])
  override def close(): Unit = ()
}

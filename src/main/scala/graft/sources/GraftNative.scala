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
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
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

  private[sources] def typeOf(dt: DataType): String = dt match {
    case LongType => "i64"
    case DoubleType => "f64"
    case StringType => "str"
    case other => throw new IllegalArgumentException(
      s"graft-native v0 supports i64/f64/str, got $other")
  }

  private[sources] def schemaOf(dir: String): StructType = {
    val json = new String(Files.readAllBytes(Paths.get(dir, MetaFile)),
      StandardCharsets.UTF_8)
    val fields = """\{"name":"([^"]+)","type":"(i64|f64|str)"\}""".r
      .findAllMatchIn(json).map { m =>
        val dt = m.group(2) match {
          case "i64" => LongType
          case "f64" => DoubleType
          case "str" => StringType
        }
        StructField(m.group(1), dt, nullable = false)
      }.toArray
    StructType(fields)
  }

  /** Distributed fixture/ingest writer: one `block-<partition>` dir per
    * input partition (executors share the filesystem on local[*]; on a
    * cluster this would target a DFS path via the Hadoop FS API). */
  def write(df: DataFrame, dir: String): Unit = {
    val schema = df.schema
    schema.fields.foreach(f => typeOf(f.dataType)) // validate early
    Files.createDirectories(Paths.get(dir))
    val meta = schema.fields
      .map(f => s"""{"name":"${f.name}","type":"${typeOf(f.dataType)}"}""")
      .mkString("""{"cols":[""", ",", "]}")
    Files.write(Paths.get(dir, MetaFile), meta.getBytes(StandardCharsets.UTF_8))
    val fields = schema.fields.map(f => (f.name, typeOf(f.dataType)))
    df.rdd.mapPartitionsWithIndex { case (pid, rows) =>
      val block = Paths.get(dir, f"block-$pid%05d")
      Files.createDirectories(block)
      val data = rows.toArray
      if (data.nonEmpty) {
        fields.zipWithIndex.foreach { case ((name, typ), i) =>
          writeColumn(block, name, typ, data, i)
        }
        // per-block numeric min/max sidecar — the reference's partition
        // metadata (ref src/table/meta.rs), used for block skipping
        val stats = fields.zipWithIndex.collect {
          case ((name, "i64"), i) =>
            val vs = data.map(_.getLong(i))
            s""""$name":[${vs.min},${vs.max}]"""
          case ((name, "f64"), i) =>
            val vs = data.map(_.getDouble(i))
            s""""$name":[${vs.min},${vs.max}]"""
        }
        Files.write(block.resolve("_stats.json"),
          stats.mkString("{", ",", "}").getBytes(StandardCharsets.UTF_8))
      }
      Iterator.single(data.length)
    }.count()
    ()
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
    case "f64" =>
      val bb = ByteBuffer.allocate(rows.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      rows.foreach(r => bb.putDouble(r.getDouble(i)))
      Files.write(block.resolve(s"$name.bin"), bb.array())
    case "str" =>
      val dict = mutable.LinkedHashMap.empty[String, Int]
      val bb = ByteBuffer.allocate(rows.length * 4).order(ByteOrder.LITTLE_ENDIAN)
      rows.foreach { r =>
        val s = r.getString(i)
        bb.putInt(dict.getOrElseUpdate(s, dict.size))
      }
      Files.write(block.resolve(s"$name.bin"), bb.array())
      Files.write(block.resolve(s"$name.dict"),
        dict.keys.mkString("\n").getBytes(StandardCharsets.UTF_8))
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
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftNative.schemaOf(path(options))
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
    new GraftNativeScanBuilder(dir, schema)
}

class GraftNativeScanBuilder(dir: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  import org.apache.spark.sql.sources._
  private var required: StructType = full
  private var skippable: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve file-schema field order; empty projection (count(*)) is legal
    required = StructType(full.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))
  /** Numeric range/equality filters drive BLOCK SKIPPING against the
    * per-block min/max sidecars (the reference's partition-metadata
    * seek, ref src/table/meta.rs). Everything is returned as residual —
    * skipping is pruning, not evaluation — so Spark re-applies the
    * exact predicate above the scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    skippable = filters.filter {
      case GreaterThan(_, _: Number) | GreaterThanOrEqual(_, _: Number) |
           LessThan(_, _: Number) | LessThanOrEqual(_, _: Number) |
           EqualTo(_, _: Number) => true
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = skippable
  override def build(): Scan = GraftNativeScan(dir, required, skippable.toSeq)
}

case class GraftNativeBlock(block: String) extends InputPartition

case class GraftNativeScan(dir: String, required: StructType,
    filters: Seq[org.apache.spark.sql.sources.Filter] = Nil)
    extends Scan with Batch with Serializable {
  import org.apache.spark.sql.sources._
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-native cols=[${required.fieldNames.mkString(",")}] " +
      s"skipFilters=[${filters.mkString(",")}]"

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
      case _ => false
    }
  }

  override def planInputPartitions(): Array[InputPartition] =
    Files.list(Paths.get(dir)).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("block-") &&
        Files.isDirectory(p))
      .toArray.sortBy(_.getFileName.toString)
      .filterNot(p => provablyEmpty(p.toString))
      .map(p => GraftNativeBlock(p.toString): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftNativeReaderFactory(required)
}

class GraftNativeReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftNativeReader(partition.asInstanceOf[GraftNativeBlock].block, required)
}

/** Reads one block: only the REQUIRED columns' files are opened — the
  * pruning is literal (untouched columns cost zero I/O). */
class GraftNativeReader(block: String, required: StructType)
    extends PartitionReader[InternalRow] {
  private val cols: Array[Int => Any] = required.fields.map { f =>
    f.dataType match {
      case LongType =>
        val bb = ByteBuffer.wrap(Files.readAllBytes(
          Paths.get(block, s"${f.name}.bin"))).order(ByteOrder.LITTLE_ENDIAN)
        (i: Int) => bb.getLong(i * 8)
      case DoubleType =>
        val bb = ByteBuffer.wrap(Files.readAllBytes(
          Paths.get(block, s"${f.name}.bin"))).order(ByteOrder.LITTLE_ENDIAN)
        (i: Int) => bb.getDouble(i * 8)
      case StringType =>
        val bb = ByteBuffer.wrap(Files.readAllBytes(
          Paths.get(block, s"${f.name}.bin"))).order(ByteOrder.LITTLE_ENDIAN)
        val dict = new String(Files.readAllBytes(Paths.get(block, s"${f.name}.dict")),
          StandardCharsets.UTF_8).split("\n", -1).map(UTF8String.fromString)
        (i: Int) => dict(bb.getInt(i * 4))
      case other => throw new IllegalStateException(s"unsupported $other")
    }
  }
  private val nRows: Long = {
    // row count from any present column file's width; a pruned-to-zero
    // projection (count(*)) falls back to the first meta column
    val fields =
      if (required.fields.nonEmpty) required.fields
      else GraftNative.schemaOf(Paths.get(block).getParent.toString).fields.take(1)
    val f = fields.head
    val w = if (f.dataType == StringType) 4 else 8
    Files.size(Paths.get(block, s"${f.name}.bin")) / w
  }
  private var row = -1
  override def next(): Boolean = { row += 1; row < nRows }
  override def get(): InternalRow =
    new GenericInternalRow(cols.map(f => f(row)).asInstanceOf[Array[Any]])
  override def close(): Unit = ()
}

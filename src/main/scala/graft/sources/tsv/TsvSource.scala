package graft.sources.tsv

import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A DataSource V2 with filter / column / limit pushdown — the Spark-native
  * architecture of the reference's foreign-table pushdown (S6): PG plans the
  * query, then ships predicates and projections to ClickHouse over the FDW
  * (reference: init.sql:27-70; pushdown behavior
  * queries/q1-aggregation-by-type/README.md:139-143 "PostgreSQL executor
  * bypassed"). Here Catalyst's V2ScanRelationPushDown plays PG's role and
  * this source plays the remote engine: predicates/projections accepted by
  * [[TsvScanBuilder]] are evaluated AT the source, before rows ever enter
  * Spark operators, and the residual plan stays in Spark — exactly the
  * FDW split. The format is deliberately trivial (header + tab-separated,
  * one file per partition) so the pushdown machinery is the whole point.
  *
  * Usage: spark.read.format("graft.sources.tsv").schema(s).load(dir)
  */
class DefaultSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft.sources.tsv requires an explicit schema (the reference's " +
        "foreign tables declare one too, init.sql:27-70)")

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new TsvTable(schema, properties.get("path"))
}

final class TsvTable(schema: StructType, path: String)
    extends Table with SupportsRead {
  override def name(): String = s"tsv:$path"
  override def schema(): StructType = schema0
  private val schema0 = schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new TsvScanBuilder(schema0, path)
}

/** Accepts the pushable subset of Catalyst's translated filters; the rest
  * are returned as residual (Spark re-applies them — same contract as the
  * FDW's "unsupported expressions stay in PG"). */
final class TsvScanBuilder(schema: StructType, path: String)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = schema
  private var limit: Int = -1

  private def pushable(f: Filter): Boolean = f match {
    case EqualTo(_, _) | GreaterThan(_, _) | GreaterThanOrEqual(_, _) |
        LessThan(_, _) | LessThanOrEqual(_, _) | IsNotNull(_) | IsNull(_) =>
      true
    case In(_, _) => true
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, unsup) = filters.partition(pushable)
    pushed = sup
    unsup // residual, evaluated by Spark
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushLimit(l: Int): Boolean = { limit = l; true }
  override def isPartiallyPushed: Boolean = true

  override def build(): Scan = new TsvScan(schema, required, pushed, limit, path)
}

final class TsvScan(
    fullSchema: StructType,
    required: StructType,
    filters: Array[Filter],
    limit: Int,
    path: String)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"TsvScan path=$path, PushedFilters=${filters.mkString("[", ", ", "]")}" +
      s", PushedLimit=${if (limit >= 0) limit else "none"}" +
      s", ReadSchema=${required.map(_.name).mkString("[", ",", "]")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = Paths.get(path)
    val files =
      if (Files.isDirectory(dir)) {
        val stream = Files.list(dir)
        try
          stream.iterator().asScala
            .map(_.toString)
            .filter { f =>
              val n = Paths.get(f).getFileName.toString
              !n.startsWith("_") && !n.startsWith(".")
            }
            .toArray.sorted
        finally stream.close()
      } else Array(path)
    files.map(f => TsvPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TsvReaderFactory(fullSchema, required, filters, limit)
}

final case class TsvPartition(file: String) extends InputPartition

final class TsvReaderFactory(
    fullSchema: StructType,
    required: StructType,
    filters: Array[Filter],
    limit: Int)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new TsvPartitionReader(
      p.asInstanceOf[TsvPartition].file, fullSchema, required, filters, limit)
}

/** Line-at-a-time reader that evaluates the PUSHED filters and projection
  * source-side — rows failing a pushed predicate never materialize as
  * InternalRows, the per-partition limit short-circuits the read.
  *
  * Field format: tab-separated; a field MAY be wrapped in double quotes
  * (required when it contains a tab or a quote), with embedded quotes
  * doubled (`""`) — i.e. standard CSV quoting with `\t` as separator,
  * what Spark's CSV writer emits with `sep=\t, escape="`. Embedded
  * NEWLINES are not supported (the reader is line-oriented); writers
  * must strip or reject them. */
final class TsvPartitionReader(
    file: String,
    fullSchema: StructType,
    required: StructType,
    filters: Array[Filter],
    limit: Int)
    extends PartitionReader[InternalRow] {

  private val lines = Files.lines(Paths.get(file))
  private val it = lines.iterator().asScala.drop(1) // header
  private val idx = fullSchema.fieldNames.zipWithIndex.toMap
  private val outFields = required.fields.map(f => (idx(f.name), f.dataType))
  private var current: InternalRow = _
  private var emitted = 0

  /** Quote-aware splitter: like split("\t", -1) but honouring CSV-style
    * double-quote wrapping with `""` escapes, so string values containing
    * tabs or quotes round-trip through the Spark CSV writer. */
  private def splitLine(line: String): Array[String] = {
    val out = Array.newBuilder[String]
    val n = line.length
    var i = 0
    var more = true
    while (more) {
      val sb = new java.lang.StringBuilder
      if (i < n && line.charAt(i) == '"') { // quoted field
        i += 1
        var closed = false
        while (!closed && i < n) {
          val c = line.charAt(i)
          if (c == '"') {
            if (i + 1 < n && line.charAt(i + 1) == '"') { sb.append('"'); i += 2 }
            else { closed = true; i += 1 }
          } else { sb.append(c); i += 1 }
        }
      } else {
        while (i < n && line.charAt(i) != '\t') { sb.append(line.charAt(i)); i += 1 }
      }
      out += sb.toString
      if (i < n && line.charAt(i) == '\t') i += 1
      else more = false
    }
    out.result()
  }

  private def parse(raw: String, dt: DataType): Any =
    if (raw.isEmpty) null
    else dt match {
      case LongType => raw.toLong
      case IntegerType => raw.toInt
      case DoubleType => raw.toDouble
      case StringType => raw
      case other =>
        throw new IllegalArgumentException(s"unsupported TSV type $other")
    }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Number) => java.lang.Long.compare(x, y.longValue())
    case (x: Int, y: Number) => java.lang.Integer.compare(x, y.intValue())
    case (x: Double, y: Number) => java.lang.Double.compare(x, y.doubleValue())
    case (x: String, y) => x.compareTo(String.valueOf(y))
    case _ => throw new IllegalArgumentException(s"incomparable: $a vs $b")
  }

  private def eval(f: Filter, get: String => Any): Boolean = f match {
    case EqualTo(c, v) => get(c) != null && cmp(get(c), v) == 0
    case GreaterThan(c, v) => get(c) != null && cmp(get(c), v) > 0
    case GreaterThanOrEqual(c, v) => get(c) != null && cmp(get(c), v) >= 0
    case LessThan(c, v) => get(c) != null && cmp(get(c), v) < 0
    case LessThanOrEqual(c, v) => get(c) != null && cmp(get(c), v) <= 0
    case IsNotNull(c) => get(c) != null
    case IsNull(c) => get(c) == null
    case In(c, vs) => get(c) != null && vs.exists(v => cmp(get(c), v) == 0)
    case _ => true
  }

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false
    while (it.hasNext) {
      val cells = splitLine(it.next())
      def get(name: String): Any = {
        val i = idx(name)
        parse(cells(i), fullSchema.fields(i).dataType)
      }
      if (filters.forall(eval(_, get))) {
        val values = outFields.map { case (i, dt) =>
          parse(cells(i), dt) match {
            case s: String => UTF8String.fromString(s)
            case other => other
          }
        }
        current = InternalRow.fromSeq(values.toIndexedSeq)
        emitted += 1
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
}

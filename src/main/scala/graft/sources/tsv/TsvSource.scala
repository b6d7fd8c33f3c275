package graft.sources.tsv

import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min, Sum}
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
    extends Table
    with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"tsv:$path"
  override def schema(): StructType = schema0
  private val schema0 = schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new TsvScanBuilder(schema0, path)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new TsvWriteBuilder(info.schema(), path)
}

/** DSv2 WRITE path — the reader's symmetric half, completing the source
  * story (read with filter/column/limit/aggregate pushdown + committed
  * batch write). The commit protocol is the standard two-phase shape
  * every distributed sink needs at 100 TB:
  *  - each task streams its partition to a DOT-PREFIXED staging file
  *    (invisible to the reader, which skips `_`/`.` names);
  *  - task commit returns the staged path as its commit message;
  *  - the DRIVER's job commit first DELETES the `_SUCCESS` marker, then
  *    (under TRUNCATE) deletes the previously-visible files, renames
  *    staged → final, and writes a fresh `_SUCCESS` last — so a reader
  *    that gates on `_SUCCESS` (the Hadoop convention) never accepts a
  *    torn directory: a driver crash mid-commit leaves files in flux
  *    but NO marker. (Readers that ignore the marker can still observe
  *    an in-progress commit — single-filesystem renames here are
  *    per-file atomic, not per-job; a true all-or-nothing swap needs a
  *    directory-level rename or a manifest, which object stores and
  *    HDFS handle via committers out of scope for this source.);
  *  - task/job abort deletes staged files — a failed job leaves the
  *    directory exactly as it was.
  * Serialization mirrors the reader's conventions exactly: header line,
  * tab separator, CSV-style double-quote wrapping only when a value
  * contains a tab or a quote, embedded quotes doubled, NULL as the
  * empty field (which means empty STRINGS do not round-trip — they read
  * back as NULL, the reader's long-standing contract), and embedded
  * newlines rejected loudly (the reader is line-oriented). */
final class TsvWriteBuilder(schema: StructType, path: String)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.Write {
      override def toBatch
          : org.apache.spark.sql.connector.write.BatchWrite =
        new TsvBatchWrite(schema, path, doTruncate)
    }
}

final case class TsvStagedFile(staged: String, finalPath: String)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

final class TsvBatchWrite(
    schema: StructType, path: String, truncate: Boolean)
    extends org.apache.spark.sql.connector.write.BatchWrite {

  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory =
    new TsvWriterFactory(schema, path)

  override def commit(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    // invalidate FIRST: the old _SUCCESS must not vouch for a directory
    // we are about to mutate — a crash below leaves no valid marker
    Files.deleteIfExists(dir.resolve("_SUCCESS"))
    if (truncate) {
      val stream = Files.list(dir)
      try stream.iterator().asScala
        .filter { p =>
          val n = p.getFileName.toString
          !n.startsWith("_") && !n.startsWith(".")
        }
        .foreach(Files.deleteIfExists(_))
      finally stream.close()
    }
    messages.foreach { case TsvStagedFile(staged, finalPath) =>
      Files.move(Paths.get(staged), Paths.get(finalPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    Files.write(dir.resolve("_SUCCESS"), Array.empty[Byte])
  }

  override def abort(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit =
    messages.foreach {
      case TsvStagedFile(staged, _) =>
        Files.deleteIfExists(Paths.get(staged))
      case _ => ()
    }
}

final class TsvWriterFactory(schema: StructType, path: String)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new TsvDataWriter(schema, path, partitionId, taskId)
}

final class TsvDataWriter(
    schema: StructType, path: String, partitionId: Int, taskId: Long)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {

  // taskId in the name keeps speculative/retried attempts collision-free;
  // only the attempt whose message reaches commit() gets renamed visible
  private val fileName = f"part-$partitionId%05d-$taskId.tsv"
  private val staged = Paths.get(path, s".staging-$fileName")
  private val out = {
    Files.createDirectories(Paths.get(path))
    val w = Files.newBufferedWriter(staged,
      java.nio.charset.StandardCharsets.UTF_8)
    w.write(schema.fieldNames.mkString("\t"))
    w.write("\n")
    w
  }

  private def render(raw: String): String =
    if (raw.indexOf('\n') >= 0 || raw.indexOf('\r') >= 0)
      throw new IllegalArgumentException(
        "TSV is line-oriented: embedded newlines are not writable " +
          s"(strip them upstream): $raw")
    else if (raw.indexOf('\t') >= 0 || raw.indexOf('"') >= 0)
      "\"" + raw.replace("\"", "\"\"") + "\""
    else raw

  override def write(row: InternalRow): Unit = {
    val cells = schema.fields.zipWithIndex.map { case (f, i) =>
      if (row.isNullAt(i)) ""
      else f.dataType match {
        case LongType => row.getLong(i).toString
        case IntegerType => row.getInt(i).toString
        case DoubleType => row.getDouble(i).toString
        case StringType => render(row.getUTF8String(i).toString)
        case other => throw new IllegalArgumentException(
          s"unsupported TSV type $other")
      }
    }
    out.write(cells.mkString("\t"))
    out.write("\n")
  }

  override def commit()
      : org.apache.spark.sql.connector.write.WriterCommitMessage = {
    out.close()
    TsvStagedFile(staged.toString, Paths.get(path, fileName).toString)
  }

  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(staged)
  }

  override def close(): Unit = ()
}

/** One pushed-down aggregate over the source: group-by column indexes into
  * the full schema, plus the accepted aggregate functions. The source
  * returns PARTIAL per-partition results (one row per group per file);
  * Spark's final aggregate merges them — exactly the FDW's partial
  * pushdown split, and the plan any distributed engine uses (partial at
  * the data, final after the exchange). */
final case class TsvAggSpec(
    groupBy: Array[(Int, DataType)],
    aggs: Array[TsvAggSpec.AggOp]) {
  /** group columns first, then aggregate columns — V2ScanRelationPushDown
    * maps the scan output to the rewritten Aggregate by POSITION in that
    * order. */
  def outputSchema: StructType = StructType(
    groupBy.zipWithIndex.map { case ((_, dt), i) =>
      StructField(s"g$i", dt)
    } ++
      aggs.zipWithIndex.map { case (a, i) =>
        StructField(s"a$i", a.resultType)
      })
}

object TsvAggSpec {
  sealed trait AggOp { def resultType: DataType }
  /** COUNT(*) */
  final case class CountStarOp() extends AggOp {
    def resultType: DataType = LongType
  }
  /** COUNT(col) — non-null count */
  final case class CountOp(col: Int) extends AggOp {
    def resultType: DataType = LongType
  }
  final case class SumOp(col: Int, resultType: DataType) extends AggOp
  final case class MinOp(col: Int, resultType: DataType) extends AggOp
  final case class MaxOp(col: Int, resultType: DataType) extends AggOp
}

/** Accepts the pushable subset of Catalyst's translated filters; the rest
  * are returned as residual (Spark re-applies them — same contract as the
  * FDW's "unsupported expressions stay in PG"). Whole GROUP-BY aggregates
  * (count/sum/min/max) are also accepted for PARTIAL pushdown — the
  * reference's headline FDW behavior ("entire aggregation pushed …
  * PostgreSQL executor bypassed", queries/q1-aggregation-by-type/
  * README.md:139-143): per-partition aggregation happens AT the source,
  * only one row per (group × file) enters Spark, and Spark's final
  * aggregate merges partials. */
final class TsvScanBuilder(schema: StructType, path: String)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit
    with SupportsPushDownAggregates {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = schema
  private var limit: Int = -1
  private var aggSpec: Option[TsvAggSpec] = None

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

  // a limit cannot be applied below a pushed aggregate
  override def pushLimit(l: Int): Boolean =
    if (aggSpec.isDefined) false else { limit = l; true }
  override def isPartiallyPushed: Boolean = true

  private def colIndex(e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[Int] = e match {
    case nr: NamedReference if nr.fieldNames.length == 1 =>
      schema.fieldNames.indexOf(nr.fieldNames.head) match {
        case -1 => None
        case i => Some(i)
      }
    case _ => None
  }

  private def translateAgg(f: AggregateFunc): Option[TsvAggSpec.AggOp] =
    f match {
      case _: CountStar => Some(TsvAggSpec.CountStarOp())
      case c: Count if !c.isDistinct =>
        colIndex(c.column).map(TsvAggSpec.CountOp)
      case s: Sum if !s.isDistinct =>
        colIndex(s.column).map { i =>
          val rt = schema.fields(i).dataType match {
            case DoubleType => DoubleType
            case _ => LongType
          }
          TsvAggSpec.SumOp(i, rt)
        }
      case m: Min =>
        colIndex(m.column).map(i =>
          TsvAggSpec.MinOp(i, schema.fields(i).dataType))
      case m: Max =>
        colIndex(m.column).map(i =>
          TsvAggSpec.MaxOp(i, schema.fields(i).dataType))
      case _ => None
    }

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    false // partial: one row per group per FILE, Spark merges

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    if (limit >= 0) return false
    val groupCols = aggregation.groupByExpressions.map(colIndex)
    val aggOps = aggregation.aggregateExpressions.map(translateAgg)
    if (groupCols.exists(_.isEmpty) || aggOps.exists(_.isEmpty)) false
    else {
      aggSpec = Some(TsvAggSpec(
        groupCols.map(_.get).map(i => (i, schema.fields(i).dataType)),
        aggOps.map(_.get)))
      true
    }
  }

  override def build(): Scan =
    new TsvScan(schema, aggSpec.map(_.outputSchema).getOrElse(required),
      pushed, limit, path, aggSpec)
}

final class TsvScan(
    fullSchema: StructType,
    required: StructType,
    filters: Array[Filter],
    limit: Int,
    path: String,
    aggSpec: Option[TsvAggSpec] = None)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"TsvScan path=$path, PushedFilters=${filters.mkString("[", ", ", "]")}" +
      s", PushedLimit=${if (limit >= 0) limit else "none"}" +
      s", PushedAggregation=${aggSpec.isDefined}" +
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
    new TsvReaderFactory(fullSchema, required, filters, limit, aggSpec)
}

final case class TsvPartition(file: String) extends InputPartition

final class TsvReaderFactory(
    fullSchema: StructType,
    required: StructType,
    filters: Array[Filter],
    limit: Int,
    aggSpec: Option[TsvAggSpec])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    // agg mode: required = EMPTY schema — the aggregator reads typed
    // values through cell() off the raw cells, so materializing a
    // full-width InternalRow per input row would be pure waste
    val base = new TsvPartitionReader(
      p.asInstanceOf[TsvPartition].file, fullSchema,
      aggSpec.map(_ => StructType(Nil)).getOrElse(required), filters,
      if (aggSpec.isDefined) -1 else limit)
    aggSpec match {
      case Some(spec) => new TsvAggregatingReader(base, fullSchema, spec)
      case None => base
    }
  }
}

/** Per-partition (per-file) hash aggregation executed AT the source: drains
  * the filtered row stream, folds it into one state per group, then emits
  * one partial row per group — the source-side half of the FDW aggregate
  * pushdown. State is bounded by the file's group cardinality, and Spark's
  * final aggregate merges partials across files. */
final class TsvAggregatingReader(
    rows: TsvPartitionReader,
    fullSchema: StructType,
    spec: TsvAggSpec)
    extends PartitionReader[InternalRow] {

  import TsvAggSpec._

  private lazy val resultIter: Iterator[InternalRow] = {
    val groups = scala.collection.mutable.LinkedHashMap
      .empty[Seq[Any], Array[Any]]
    while (rows.next()) {
      val key = spec.groupBy.toSeq.map { case (i, dt) => rows.cell(i, dt) }
      val st = groups.getOrElseUpdate(
        key, Array.fill[Any](spec.aggs.length)(null))
      var a = 0
      while (a < spec.aggs.length) {
        st(a) = (spec.aggs(a), st(a)) match {
          case (CountStarOp(), prev) =>
            (if (prev == null) 0L else prev.asInstanceOf[Long]) + 1L
          case (CountOp(i), prev) =>
            val c = if (prev == null) 0L else prev.asInstanceOf[Long]
            if (rows.cell(i, fullSchema.fields(i).dataType) != null) c + 1L
            else c
          case (SumOp(i, rt), prev) =>
            rows.cell(i, fullSchema.fields(i).dataType) match {
              case null => prev
              case v if rt == DoubleType =>
                (if (prev == null) 0.0 else prev.asInstanceOf[Double]) +
                  v.asInstanceOf[Number].doubleValue()
              case v =>
                (if (prev == null) 0L else prev.asInstanceOf[Long]) +
                  v.asInstanceOf[Number].longValue()
            }
          case (MinOp(i, _), prev) =>
            rows.cell(i, fullSchema.fields(i).dataType) match {
              case null => prev
              case v if prev == null => v
              case v => if (TsvOrd.lt(v, prev)) v else prev
            }
          case (MaxOp(i, _), prev) =>
            rows.cell(i, fullSchema.fields(i).dataType) match {
              case null => prev
              case v if prev == null => v
              case v => if (TsvOrd.lt(prev, v)) v else prev
            }
        }
        a += 1
      }
    }
    // a GLOBAL aggregate must yield exactly one row even over an empty
    // (or fully filtered) file — counts 0, sums/mins/maxes NULL — or
    // Spark's final merge over zero partials would return NULL where SQL
    // requires count(*) = 0
    if (groups.isEmpty && spec.groupBy.isEmpty) {
      groups(Seq.empty) = spec.aggs.map {
        case CountStarOp() | CountOp(_) => 0L: Any
        case _ => null: Any
      }
    }
    groups.iterator.map { case (key, st) =>
      InternalRow.fromSeq(
        (key ++ st).map {
          case s: String => UTF8String.fromString(s)
          case other => other
        })
    }
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (resultIter.hasNext) { current = resultIter.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = rows.close()
}

private object TsvOrd {
  def lt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Long, y: Long) => x < y
    case (x: Int, y: Int) => x < y
    // Double.compare, not <: NaN must order GREATER than every value
    // (Spark's min/max ordering) or a pushed MIN/MAX over a column
    // containing NaN becomes row-order-dependent and diverges from the
    // identical unpushed query
    case (x: Double, y: Double) => java.lang.Double.compare(x, y) < 0
    case (x: String, y: String) => x < y
    case _ => throw new IllegalArgumentException(s"incomparable $a / $b")
  }
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
  private var curCells: Array[String] = _
  private var emitted = 0

  /** Typed value of full-schema column `i` on the row `next()` just
    * accepted — the aggregating reader's raw-cell access path. */
  def cell(i: Int, dt: DataType): Any = parse(curCells(i), dt)

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
        // a closing quote must be followed by a tab or end-of-line; text
        // after it (`"ab"c`) is a malformed row — fail loudly rather than
        // silently dropping the remainder (hand-written TSV territory;
        // the Spark CSV writer never emits this)
        if (!closed || (i < n && line.charAt(i) != '\t'))
          throw new IllegalArgumentException(
            s"malformed TSV row (unterminated quote or trailing text " +
              s"after closing quote at offset $i): $line")
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
      val line = it.next()
      val cells = splitLine(line)
      // schema arity check up front: a short row would otherwise surface
      // as an opaque ArrayIndexOutOfBounds deep in parse/cell
      if (cells.length != fullSchema.length)
        throw new IllegalArgumentException(
          s"malformed TSV row in $file: expected ${fullSchema.length} " +
            s"fields, got ${cells.length}: $line")
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
        curCells = cells
        emitted += 1
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
}

package graft.functions

import org.apache.spark.sql.{graftbridge, Column}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** K-minimum-values (KMV / bottom-k, the theta-sketch family) distinct
  * sketch as a [[TypedImperativeAggregate]] — the fourth mergeable sketch
  * beside HllMd5 / CountMinMd5 / the DDSketch path, and the one that
  * supports what HLL cannot: SET-OPERATION estimates. Because the state
  * is the k smallest distinct hash VALUES (not a lossy projection), two
  * sketches' union is just the k smallest of the merged value sets, and
  * Jaccard/intersection fall out of the union sketch by membership
  * counting (Beyer et al., "On synopses for distinct-value estimation
  * under multiset operations", SIGMOD'07) — the audience-overlap /
  * cross-corpus-similarity primitive a 100 TB pipeline runs as a
  * sketch-matrix instead of a quadratic distinct-join.
  *
  * Determinism contract (the repo's differential-testing discipline):
  * the hash is the first 15 md5 hex chars as a 60-BIT integer (the q182
  * nibble convention, widened from 48 bits per the r5 audit: hash
  * collisions bias a KMV estimate low by ~n²/2^(b+1), so 48 bits meant
  * ~0.2% at 10¹² distinct shingles while 60 bits keeps the bias under
  * 10⁻⁴ out to ~10¹⁵ — beyond any 100 TB corpus; 60 is the widest
  * width whose nibble sum stays a POSITIVE signed int64 in both
  * engines, which is what keeps the value ORDER portable — a full
  * 64-bit hash would wrap negative in Spark and overflow DuckDB's
  * BIGINT nibble arithmetic), the state is a SET of the k smallest
  * values — commutative/associative under update and merge, so
  * partitioning cannot change it — and the emitted sketch is the
  * sorted value array. DuckDB reproduces the identical array with
  * rank-k SQL over the same md5, so estimates built from the sketch
  * (single IEEE divisions of exact integers) hash-match cross-engine.
  *
  * Estimator (applied query-side, sketch emits raw values): with the
  * sketch full, D-hat = (k-1) * 2^60 / v_k; with fewer than k values the
  * sketch IS the distinct hash set and the count is exact. 63 * 2^60 has
  * 6 significant bits — exactly representable in a double, so the
  * estimate is ONE division of exactly-represented operands.
  *
  * K = 64: 8 hex-char state ceiling (512 B serialized), relative
  * standard error ~ 1/sqrt(k-2) ~ 13% — the profiling regime; raise K
  * for tighter bounds at the same O(k log k) cost.
  */
case class KmvMd5(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.TreeSet[Long]]
    with UnaryLike[Expression] {

  import KmvMd5.{HexChars, K}

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_md5 expects a STRING child (cast first for a canonical " +
        s"serialization), got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_md5"

  override def createAggregationBuffer(): scala.collection.mutable.TreeSet[Long] =
    scala.collection.mutable.TreeSet.empty[Long]

  private def insert(
      buf: scala.collection.mutable.TreeSet[Long], v: Long): Unit = {
    if (buf.size < K) buf += v
    else if (v < buf.last && !buf.contains(v)) {
      buf.remove(buf.last)
      buf += v
    }
  }

  override def update(
      buf: scala.collection.mutable.TreeSet[Long],
      input: InternalRow): scala.collection.mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val hex = HllMd5.md5Hex(v.toString)
      insert(buf, java.lang.Long.parseLong(hex.substring(0, HexChars), 16))
    }
    buf
  }

  override def merge(
      buf: scala.collection.mutable.TreeSet[Long],
      other: scala.collection.mutable.TreeSet[Long])
      : scala.collection.mutable.TreeSet[Long] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: scala.collection.mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(
      buf: scala.collection.mutable.TreeSet[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(
      bytes: Array[Byte]): scala.collection.mutable.TreeSet[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    while (bb.remaining() >= 8) buf += bb.getLong
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMd5 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMd5 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMd5 =
    copy(child = newChild)
}

object KmvMd5 {
  val K = 64

  /** Hex chars of md5 consumed per value — 60 bits (see class doc). */
  val HexChars = 15

  /** The hash domain size 2^60 as an exactly-represented double — the
    * estimator numerator scale ((k−1)·Domain / v_k). SQL twins use
    * [[DomainSql]]. */
  val Domain: Double = 1.152921504606846976e18

  /** [[Domain]] as its SQL literal — use this in oracle text, never an
    * inline number (r6 review: the 48→60 widening had to chase eight
    * scattered literals). */
  val DomainSql = "1152921504606846976.0"

  /** DuckDB twin of the hash itself: the [[HexChars]]-nibble md5 parse
    * as a BIGINT sum. Every KMV oracle must build its hash expression
    * through THIS generator — the widening had to edit three
    * hand-rolled copies in lockstep; the width now flows from
    * [[HexChars]] alone. */
  def nibSql(expr0: String): String =
    (1 to HexChars).map { i =>
      val scale = 1L << (4 * (HexChars - i))
      s"(CAST(instr('0123456789abcdef', substr(md5($expr0), $i, 1))" +
        s" AS BIGINT) - 1) * ${scale}"
    }.mkString("(", " + ", ")")

  /** Column-API entry: KmvMd5.sketch($"col") — aggregate usage. */
  def sketch(c: Column): Column =
    graftbridge.column(
      KmvMd5(graftbridge.expression(c)).toAggregateExpression())

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[KmvMd5].getCanonicalName, "kmv_md5")
}

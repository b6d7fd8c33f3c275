package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{graftbridge, Column}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bloom membership filter (Bloom, CACM 1970) as a
  * [[TypedImperativeAggregate]] — the set-membership rung of the sketch
  * family next to [[HllMd5]] (distinct counts), [[CountMinMd5]]
  * (frequencies) and [[TDigestQuantile]] (quantiles). The 100 TB use is
  * runtime join pruning: aggregate the build side's join keys into 8 KB
  * of mergeable state, broadcast that one row, and drop probe-side rows
  * whose keys cannot be present BEFORE the shuffle — the same
  * semi-join-reduction idea behind Spark's own InjectRuntimeFilter,
  * but with engine-portable hashing (the reference's engines ship the
  * equivalent as `bloom_filter` index granules,
  * /root/reference/clickhouse/schema.sql).
  *
  * ENGINE-PORTABLE and deterministic like the other graft sketches: hash
  * h of key sets bit `int(md5(h + ":" + key)[0:4 hex], 16)` of an M=65536
  * bit array (K=4 hashes). State is 1024 longs; merge is bitwise OR —
  * commutative, associative, bit-exact across engines — so a DuckDB
  * oracle reproduces the words with `bit_or` over per-key masks and
  * replays every membership probe EXACTLY (no tolerance band).
  *
  * Guarantee: no false negatives (a present key's bits are all set).
  * False-positive rate at load n keys: (1 - e^(-K·n/M))^K — ~0.24% at
  * n = 2000, ~13% at n = 15000; size M to the build side's distinct-key
  * estimate in real deployments.
  */
case class BloomMd5(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  import BloomMd5.{K, WORDS}

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_md5 expects a STRING child (cast first for a canonical " +
        s"serialization), got ${child.dataType.simpleString}")
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_md5"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](WORDS)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.toString
      var h = 0
      while (h < K) {
        val p = BloomMd5.bitPos(h, key)
        buf(p >>> 6) |= (1L << (p & 63))
        h += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < WORDS) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * WORDS)
    buffer.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(WORDS)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomMd5 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomMd5 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomMd5 =
    copy(child = newChild)
}

object BloomMd5 {
  /** M = 65536 bits = 1024 longs; K = 4 independent hash functions. */
  val M = 65536
  val WORDS = M / 64
  val K = 4

  /** Bit position for hash `h`: first four hex chars of
    * md5(h + ":" + key) — 16 bits, 0..65535. Mirrored in SQL (both
    * dialects) via instr/strpos nibble decoding, the same scheme the
    * q61/q69 oracles use. */
  private[graft] def bitPos(h: Int, key: String): Int = {
    val hex = HllMd5.md5Hex(h.toString + ":" + key)
    var p = 0
    var i = 0
    while (i < 4) {
      p = (p << 4) | Character.digit(hex.charAt(i), 16)
      i += 1
    }
    p
  }

  /** Column-API entry: BloomMd5.sketch($"col") — aggregate usage. */
  def sketch(c: Column): Column =
    graftbridge.column(
      BloomMd5(graftbridge.expression(c)).toAggregateExpression())

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[BloomMd5].getCanonicalName, "bloom_md5")
}

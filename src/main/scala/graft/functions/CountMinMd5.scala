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

/** Count-min frequency sketch (Cormode & Muthukrishnan, J.Alg 2005) as a
  * [[TypedImperativeAggregate]] — the frequency-estimation rung of the
  * sketch family next to [[HllMd5]] (distinct counts) and
  * [[TDigestQuantile]] (quantiles): heavy-hitter counts over an unbounded
  * key domain in O(D·W) fixed state, where the exact answer needs a
  * groupBy over every distinct key. At 100 TB the sketch is the point:
  * 8 KB of mergeable state per group flows through map-side partials
  * instead of a vocabulary-sized shuffle.
  *
  * ENGINE-PORTABLE and deterministic, like the other graft sketches:
  * row d of the matrix counts occurrences hashed by md5("d:" + key); a
  * key's estimate is the MIN over its D cells, which over-counts only
  * (collisions add, never subtract), guaranteeing estimate >= true count.
  * All state is integer sums — commutative, associative, bit-exact across
  * engines — so a DuckDB oracle can reproduce the estimates EXACTLY by
  * re-aggregating the same cells in SQL (no tolerance band needed, unlike
  * engine-private sketch implementations).
  *
  * D=4 rows × W=256 buckets (bucket = first two md5 hex chars). Error
  * contract: estimate - true <= 2·n/W with probability 1 - (1/2)^D over
  * the hash family; at W=256 that is ~0.8% of the stream length per
  * row, tightened by the min over 4 independent rows.
  */
case class CountMinMd5(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  import CountMinMd5.{D, W}

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_md5 expects a STRING child (cast first for a canonical " +
        s"serialization), got ${child.dataType.simpleString}")
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_md5"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](D * W)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.toString
      var d = 0
      while (d < D) {
        buf(d * W + CountMinMd5.bucket(d, key)) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < D * W) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(Array.tabulate(D) { d =>
      new GenericArrayData(java.util.Arrays.copyOfRange(buf, d * W, (d + 1) * W))
    })

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * D * W)
    buffer.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(D * W)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinMd5 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinMd5 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): CountMinMd5 =
    copy(child = newChild)
}

object CountMinMd5 {
  /** Depth (independent hash rows) and width (buckets per row). */
  val D = 4
  val W = 256

  /** Bucket for row `d`: first two hex chars of md5("d:" + key) — one
    * byte, 0..255. Mirrored in SQL by the q69 oracle via
    * strpos('0123456789abcdef', …) nibble decoding. */
  private[graft] def bucket(d: Int, key: String): Int = {
    val hex = HllMd5.md5Hex(d.toString + ":" + key)
    Character.digit(hex.charAt(0), 16) * 16 +
      Character.digit(hex.charAt(1), 16)
  }

  /** Column-API entry: CountMinMd5.sketch($"col") — aggregate usage. */
  def sketch(c: Column): Column =
    graftbridge.column(
      CountMinMd5(graftbridge.expression(c)).toAggregateExpression())

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CountMinMd5].getCanonicalName, "cms_md5")
}

package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{graftbridge, Column}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Mutable t-digest state: merged centroids plus an unmerged tail buffer
  * that compresses on overflow — amortized O(1) updates, bounded size. */
final class TDigestBuffer(val delta: Double) {
  var means: ArrayBuffer[Double] = ArrayBuffer.empty
  var weights: ArrayBuffer[Double] = ArrayBuffer.empty
  /** NaN inputs quarantined by weight, not fed to centroid math (one NaN
    * would poison every weighted mean it merges into). Spark's builtin
    * percentile/min/max order NaN GREATER than every value, so the NaN
    * mass sits at the top of the distribution in [[quantile]]. */
  var nanWeight: Double = 0.0
  private val pendingLimit = 512
  private val pendingM = new ArrayBuffer[Double](pendingLimit)
  private val pendingW = new ArrayBuffer[Double](pendingLimit)

  def add(x: Double, w: Double): Unit = {
    if (x.isNaN) { nanWeight += w; return }
    pendingM += x
    pendingW += w
    if (pendingM.length >= pendingLimit) compress()
  }

  def addAll(other: TDigestBuffer): Unit = {
    var i = 0
    while (i < other.means.length) {
      add(other.means(i), other.weights(i)); i += 1
    }
    nanWeight += other.nanWeight
    other.flushInto(this)
  }

  private def flushInto(target: TDigestBuffer): Unit = {
    var i = 0
    while (i < pendingM.length) {
      target.add(pendingM(i), pendingW(i)); i += 1
    }
  }

  /** Dunning's merging compression (k1-style size bound
    * 4·n·q·(1−q)/δ): sort all centroids by mean, then greedily merge
    * neighbours while the combined weight stays under the local
    * quantile-dependent limit — tight centroids at the tails, coarse in
    * the middle, the property that makes tail quantiles accurate. */
  def compress(): Unit = {
    // no new data → merged state is final; re-merging would both waste
    // O(n log n) work per eval/serialize AND make the estimate depend on
    // how often compress() happened to run
    if (pendingM.isEmpty) return
    val n = means.length + pendingM.length
    if (n == 0) return
    val m = new Array[Double](n)
    val w = new Array[Double](n)
    var i = 0
    while (i < means.length) { m(i) = means(i); w(i) = weights(i); i += 1 }
    var j = 0
    while (j < pendingM.length) {
      m(i) = pendingM(j); w(i) = pendingW(j); i += 1; j += 1
    }
    val order = Array.range(0, n).sortBy(m(_))
    val total = w.sum
    val om = ArrayBuffer.empty[Double]
    val ow = ArrayBuffer.empty[Double]
    var cm = m(order(0))
    var cw = w(order(0))
    var cum = 0.0
    var k = 1
    while (k < n) {
      val nm = m(order(k))
      val nw = w(order(k))
      val q = (cum + cw / 2) / total
      val limit = 4 * total * q * (1 - q) / delta
      if (cw + nw <= math.max(limit, 1.0)) {
        cm = (cm * cw + nm * nw) / (cw + nw); cw += nw
      } else {
        om += cm; ow += cw; cum += cw; cm = nm; cw = nw
      }
      k += 1
    }
    om += cm; ow += cw
    means = om; weights = ow
    pendingM.clear(); pendingW.clear()
  }

  /** Quantile by monotone interpolation between centroid CENTERS
    * (cumulative-weight midpoints) — the standard t-digest estimate. */
  def quantile(q: Double): Double = {
    compress()
    val n = means.length
    if (n == 0) return Double.NaN
    // NaN sorts greatest: the quantile falls in the NaN mass at the top
    val grand = weights.sum + nanWeight
    if (q * grand > weights.sum) return Double.NaN
    if (n == 1) return means(0)
    val total = weights.sum
    val target = q * total
    var cum = 0.0
    var prevCenter = 0.0
    var prevMean = means(0)
    var i = 0
    while (i < n) {
      val center = cum + weights(i) / 2
      if (target <= center) {
        if (i == 0) return means(0)
        val f = (target - prevCenter) / (center - prevCenter)
        return prevMean + f * (means(i) - prevMean)
      }
      prevCenter = center
      prevMean = means(i)
      cum += weights(i)
      i += 1
    }
    means(n - 1)
  }

  def serialize(): Array[Byte] = {
    compress()
    val bb = ByteBuffer.allocate(8 + 8 + 4 + means.length * 16)
    bb.putDouble(delta)
    bb.putDouble(nanWeight)
    bb.putInt(means.length)
    var i = 0
    while (i < means.length) {
      bb.putDouble(means(i)); bb.putDouble(weights(i)); i += 1
    }
    bb.array()
  }
}

object TDigestBuffer {
  def deserialize(bytes: Array[Byte]): TDigestBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TDigestBuffer(bb.getDouble)
    buf.nanWeight = bb.getDouble
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.means += bb.getDouble; buf.weights += bb.getDouble; i += 1 }
    buf
  }
}

/** t-digest quantile as a [[TypedImperativeAggregate]] — the direct
  * analog of the reference's `quantileTDigest(q)(price)` (ClickHouse Q4,
  * queries/q4-top-countries-percentiles/README.md:222-244: ~27 ms from
  * constant-size mergeable sketch state while exact percentile sorts
  * cost PostgreSQL 4.3 s). Centroid-based (Dunning's merging digest):
  * updates and merges are O(δ); memory is O(δ) regardless of group
  * size — the 100 TB percentile path. Estimates depend on merge order
  * (like quantileTDigest itself), so queries using it are tolerance-
  * tested, not oracle-hashed (SURVEY §5's approximate set).
  */
case class TDigestQuantile(
    child: Expression,
    percentage: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TDigestBuffer] {

  private lazy val q: Double =
    percentage.eval().asInstanceOf[Double]

  override def children: Seq[Expression] = Seq(child, percentage)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"tdigest_quantile expects a DOUBLE child, got " +
          s"${child.dataType.simpleString}")
    else if (!percentage.foldable || percentage.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        "tdigest_quantile expects a foldable DOUBLE percentage")
    else percentage.eval() match {
      case null =>
        TypeCheckResult.TypeCheckFailure("percentage must not be NULL")
      case d: Double if d < 0.0 || d > 1.0 =>
        TypeCheckResult.TypeCheckFailure(s"percentage $d outside [0, 1]")
      case _ => TypeCheckResult.TypeCheckSuccess
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "tdigest_quantile"

  override def createAggregationBuffer(): TDigestBuffer =
    new TDigestBuffer(100.0)

  override def update(buf: TDigestBuffer, input: InternalRow): TDigestBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double], 1.0)
    buf
  }

  override def merge(buf: TDigestBuffer, other: TDigestBuffer): TDigestBuffer = {
    buf.addAll(other)
    buf
  }

  override def eval(buf: TDigestBuffer): Any = {
    // SQL NULL only for a truly empty group; a NaN from the quarantined
    // NaN mass (which sorts greatest, like builtin percentile) surfaces
    // as the NaN it is. Compress first: un-merged values live in the
    // pending buffer, so `means` alone cannot prove emptiness.
    buf.compress()
    if (buf.means.isEmpty && buf.nanWeight == 0.0) null
    else buf.quantile(q)
  }

  override def serialize(buffer: TDigestBuffer): Array[Byte] =
    buffer.serialize()
  override def deserialize(storageFormat: Array[Byte]): TDigestBuffer =
    TDigestBuffer.deserialize(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestQuantile =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestQuantile =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TDigestQuantile =
    copy(child = newChildren(0), percentage = newChildren(1))
}

object TDigestQuantile {
  /** Column-API entry: TDigestQuantile.of($"price", 0.5). */
  def of(c: Column, q: Double): Column =
    graftbridge.column(
      TDigestQuantile(
        graftbridge.expression(c),
        org.apache.spark.sql.catalyst.expressions.Literal(q))
        .toAggregateExpression())

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[TDigestQuantile].getCanonicalName, "tdigest_quantile")
}

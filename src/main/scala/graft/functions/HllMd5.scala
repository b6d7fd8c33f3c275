package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{graftbridge, Column}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}

/** HyperLogLog distinct-count sketch as a [[TypedImperativeAggregate]] —
  * the custom-UDAF rung of the SURVEY §2.11 ladder (mergeable sketch
  * state + explicit serialize/merge/eval), and the mechanism behind the
  * reference's `uniq()` profiling (clickhouse/queries.sql:20-27).
  *
  * Unlike the built-in HLL++ (q10b, engine-private hashing → rows-only
  * check), this sketch is ENGINE-PORTABLE and deterministic: registers
  * and ranks derive from md5 hex, the per-register state is a MAX
  * (commutative/associative — partition order can't change it), and the
  * final harmonic sum runs in fixed register order. The DuckDB oracle
  * recomputes the identical estimate in pure SQL, making the
  * approximate-distinct path differentially testable — same methodology
  * as every exact operator.
  *
  * 64 registers (first 2 hex chars mod 64), rank = leading-zero bits of
  * the next 16 hex chars + 1 (max 65). Raw HLL estimate
  * alpha·m²/Σ2^-M[j], no small-range bias correction: linear counting
  * needs ln(), whose last-ulp behavior is libm-specific — the one
  * operation that would break cross-engine bit-equality. At sketch
  * sizes ≪ cardinality the raw estimate is the standard one anyway.
  *
  * USABLE RANGE (user-facing contract): without the linear-counting
  * correction the raw estimate has a floor of ≈ alpha·m ≈ 45, so groups
  * with FEWER than ~2.5·m = 160 distinct values are overestimated toward
  * that floor — use exact `count(distinct …)` there; the sketch is for
  * cardinalities well above m. The one special case is exact: an empty
  * group (all-zero registers) reports 0.0, not the floor.
  */
case class HllMd5(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] {

  import HllMd5.M

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_md5 expects a STRING child (cast first for a canonical " +
        s"serialization), got ${child.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_md5"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val hex = HllMd5.md5Hex(v.toString)
      val reg = (Character.digit(hex.charAt(0), 16) * 16 +
        Character.digit(hex.charAt(1), 16)) % M
      val rank = HllMd5.rankOf(hex)
      if (rank > buf(reg)) buf(reg) = rank.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < M) {
      if (other(j) > buf(j)) buf(j) = other(j)
      j += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    // all-zero registers = no non-null input was ever observed: report
    // 0.0 (still deterministic, no ln() needed) instead of the raw
    // estimate's floor alpha·m ≈ 44.9, which would claim ~45 distinct
    // values for an EMPTY group
    var j = 0
    var nonEmpty = false
    while (j < M) { if (buf(j) != 0) nonEmpty = true; j += 1 }
    if (!nonEmpty) 0.0
    else {
      val alpha = 0.7213 / (1 + 1.079 / M)
      var sum = 0.0
      j = 0
      while (j < M) { // fixed register order — DuckDB folds the same list
        sum += math.pow(2.0, -buf(j).toDouble)
        j += 1
      }
      alpha * M * M / sum
    }
  }

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storageFormat: Array[Byte]): Array[Byte] =
    storageFormat

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMd5 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMd5 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllMd5 =
    copy(child = newChild)
}

object HllMd5 {
  val M = 64

  private[functions] def md5Hex(s: String): String = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    val sb = new java.lang.StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** Leading-zero-bit rank over hex chars 3..18 (1-based), +1; 65 if all
    * zero. Mirrored in SQL by the q61 oracle. */
  private[functions] def rankOf(hex: String): Int = {
    var z = 0
    while (z < 16 && hex.charAt(2 + z) == '0') z += 1
    if (z == 16) 65
    else {
      val v = Character.digit(hex.charAt(2 + z), 16)
      val nibbleLz = if (v >= 8) 0 else if (v >= 4) 1 else if (v >= 2) 2 else 3
      4 * z + nibbleLz + 1
    }
  }

  /** Column-API entry: HllMd5.sketch($"col") — aggregate usage. */
  def sketch(c: Column): Column =
    graftbridge.column(
      HllMd5(graftbridge.expression(c)).toAggregateExpression())

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[HllMd5].getCanonicalName, "hll_md5")
}

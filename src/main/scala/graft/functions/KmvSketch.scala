package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV ("k minimum values") distinct-value synopsis — the theta-sketch
  * family's workhorse, and the one capability HLL fundamentally lacks:
  * SET INTERSECTION estimation.
  *
  * An HLL register array supports union only (merge = max of registers);
  * estimating |A∩B| from HLLs forces inclusion-exclusion, whose error is
  * proportional to |A∪B| — useless when the intersection is small. A KMV
  * sketch instead keeps the k smallest values of a uniform 64-bit hash of
  * each element. Because the retained sample is a uniform sample of the
  * DISTINCT elements below a data-determined threshold θ (= the k-th
  * smallest normalized hash), two sketches can be combined by plain set
  * algebra on their retained hashes under θ = min(θ_a, θ_b):
  *
  *   |A| ≈ (k-1)/θ_A            (the classic KMV estimator)
  *   |A∪B| ≈ |{x ∈ A∪B : x < θ}| / θ
  *   |A∩B| ≈ |{x ∈ A∩B : x < θ}| / θ
  *
  * with relative standard error ~1/√(k-2) (~6.3% at k=256). When a set
  * has fewer than k distinct elements the sketch holds ALL of them and
  * every estimate is exact — a sharp, testable boundary.
  *
  * Scale posture: the aggregate is a [[TypedImperativeAggregate]], so it
  * partial-aggregates map-side (ObjectHashAggregate) — the shuffle
  * carries one ≤(8k+4)-byte synopsis per group per map partition, never
  * the element stream. The estimator side is pure column algebra over
  * the emitted sorted-array synopses (`array_union`/`array_intersect`/
  * `filter`), so any number of pairwise set operations run without
  * touching the base data again — the 100 TB pattern: sketch once,
  * answer many overlap questions from KB-sized artifacts.
  *
  * Determinism: the uniformizing hash is a fixed splitmix64 finalizer
  * (public-domain constants), so the sketch of a given set is the same
  * on every run, partitioning, and merge order — estimates are
  * reproducible values, not random variables, which is what lets the
  * catalog pin them against exact counts with fixed error-margin bits.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"kmv_sketch needs k >= 2, got $k")

  override def prettyName: String = "kmv_sketch"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a bigint element column, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = KmvSketchAgg.uniformHash63(v.asInstanceOf[Long])
      // TreeSet keeps natural (ascending) order and dedups; cap at k by
      // evicting the current maximum — O(log k) per element, O(k) memory.
      if (buf.size < k) buf.add(h)
      else if (h < buf.last()) { buf.add(h); if (buf.size > k) buf.pollLast() }
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (buf.size < k) buf.add(h)
      else if (h < buf.last()) { buf.add(h); if (buf.size > k) buf.pollLast() }
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out) // ascending — element_at(sk, k) IS θ·2^63
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + 8 * buf.size)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(in.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

object KmvSketchAgg {

  /** splitmix64 finalizer (Steele/Lea/Flood, public-domain constants),
    * masked to the non-negative 63-bit space so long comparison IS
    * unsigned comparison and u(h) = h / 2^63 ∈ [0, 1). */
  def uniformHash63(v: Long): Long = {
    var z = v + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    (z ^ (z >>> 31)) & Long.MaxValue
  }

  private val Two63: Double = 9.223372036854776e18 // 2^63

  /** The aggregate as a Column: KMV synopsis (sorted ascending bigint
    * array, ≤ k elements) of the distinct values of `elems`. */
  def kmv(elems: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketchAgg(ColumnBridge.expression(elems), k).toAggregateExpression())

  /** θ·2^63 in LONG space: the k-th smallest retained hash when the
    * sketch is saturated, else "everything was retained" (Long.MaxValue —
    * strictly above any stored 63-bit hash, so `x < θ` keeps all). */
  private def thetaLong(sk: Column, k: Int): Column =
    when(size(sk) < k, lit(Long.MaxValue)).otherwise(element_at(sk, k))

  private def thetaFrac(sk: Column, k: Int): Column =
    when(size(sk) < k, lit(1.0))
      .otherwise(element_at(sk, k).cast("double") / lit(Two63))

  /** Distinct-count estimate of one sketch: exact below saturation,
    * (k-1)/θ above. */
  def kmvEstimate(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(lit((k - 1).toDouble) / thetaFrac(sk, k))

  /** |A∪B| estimate: count retained hashes of either sketch strictly
    * below θ = min(θ_a, θ_b), scale by 1/θ. Exact when both sketches are
    * unsaturated (θ = 1 keeps everything, the union is literal). */
  def kmvUnionEstimate(a: Column, b: Column, k: Int): Column = {
    val thL = least(thetaLong(a, k), thetaLong(b, k))
    val thF = least(thetaFrac(a, k), thetaFrac(b, k))
    size(filter(array_union(a, b), x => x < thL)).cast("double") / thF
  }

  /** |A∩B| estimate — the HLL-impossible one: the retained hashes below
    * θ are a uniform θ-sample of each set's distinct elements, so hashes
    * present in BOTH sketches below θ are a θ-sample of the
    * intersection. Exact when both sketches are unsaturated. */
  def kmvIntersectEstimate(a: Column, b: Column, k: Int): Column = {
    val thL = least(thetaLong(a, k), thetaLong(b, k))
    val thF = least(thetaFrac(a, k), thetaFrac(b, k))
    size(filter(array_intersect(a, b), x => x < thL)).cast("double") / thF
  }
}

package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct sketch state: the k smallest
  * DISTINCT rank keys seen so far. A rank key is `xxhash64(value) ^
  * Long.MinValue` — the sign-bit flip makes SIGNED order on stored
  * keys equal UNSIGNED order on the hash, so the TreeSet, the emitted
  * sorted array, and every downstream `array_sort` agree on one total
  * order without unsigned arithmetic anywhere.
  *
  * The capped insert is O(log k) against the current worst survivor;
  * duplicates are absorbed by the set (TreeSet.add is a no-op), which
  * is the operational win over exact DISTINCT: the sketch can be fed
  * raw observation rows — no pre-`distinct()` shuffle.
  */
final class KmvBuffer(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]

  def add(rankKey: Long): Unit =
    if (set.size < k) { set.add(rankKey); () }
    else if (rankKey < set.last && set.add(rankKey)) { set.pollLast(); () }
}

/** Shared TypedImperativeAggregate plumbing for the two KMV aggregates
  * (value sketching and sketch union). State is O(k) longs per group,
  * mergeable (k-min of a union = k-min of the parts' k-mins — the
  * rollup algebra is LOSSLESS, unlike e.g. sampled-distinct), and
  * spill-safe: serialize is a flat long array for the
  * ObjectHashAggregate sort-based fallback path.
  *
  * Why this exists next to `hll_sketch_agg` (q_hll_rollup): HLL
  * supports union only — intersections via inclusion-exclusion explode
  * in relative error. A KMV sketch is a uniform bottom-k SAMPLE of the
  * hash space, so two sketches support a direct intersection estimate
  * (ρ matches in the combined bottom-k, scaled by the union estimate —
  * Beyer et al., "On Synopses for Distinct-Value Estimation Under
  * Multiset Operations", SIGMOD '07). See [[Kmv]] for the estimators.
  */
abstract class KmvAggBase extends TypedImperativeAggregate[KmvBuffer]
  with UnaryLike[Expression] {

  def k: Int

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    val it = other.set.iterator()
    while (it.hasNext) buffer.add(it.next())
    buffer
  }

  /** Ascending rank keys (TreeSet iterates in order). */
  override def eval(buffer: KmvBuffer): Any = {
    val out = new Array[Long](buffer.set.size)
    val it = buffer.set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.set.size)
    bb.putInt(buffer.set.size)
    val it = buffer.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val buffer = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    var i = 0
    while (i < n) { buffer.set.add(bb.getLong); i += 1 }
    buffer
  }
}

/** `kmv_sketch(hash, k)`: sketch a stream of LONG hash values (pair
  * with `xxhash64(...)` so the hashing stays codegen'd in the input
  * projection). Emits the sketch as a sorted array of rank keys.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends KmvAggBase {

  require(k > 0, s"kmv sketch needs k > 0, got $k")

  override def prettyName: String = "kmv_sketch"

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long] ^ Long.MinValue)
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

/** `kmv_union_agg(sketch, k)`: merge already-built sketches (arrays of
  * rank keys) — the rollup aggregate, exactly `hll_union_agg`'s role.
  * Lossless: unioning per-partition sketches yields bit-identical
  * state to sketching the whole set directly (specced).
  */
case class KmvUnionAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends KmvAggBase {

  require(k > 0, s"kmv union needs k > 0, got $k")

  override def prettyName: String = "kmv_union_agg"

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) { buffer.add(arr.getLong(i)); i += 1 }
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvUnionAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvUnionAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): KmvUnionAgg =
    copy(child = newChild)
}

/** Column-level KMV API: the two aggregates plus estimator expressions
  * that run entirely on built-in (codegen'd) array functions — no UDFs
  * anywhere in the read path.
  */
object Kmv {

  private val Two64 = 1.8446744073709552e19 // 2^64
  private val Shift = 9.223372036854775808e18 // 2^63

  /** Sketch a LONG hash column (use `xxhash64(cols…)` to produce it).
    * The cast pins the aggregate's LONG input contract at the Column
    * layer (misuse fails analysis, not execution). */
  def kmvSketch(hash: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketchAgg(ColumnBridge.expression(hash.cast("long")), k)
        .toAggregateExpression())

  /** Merge sketches produced by [[kmvSketch]] (rollup path). */
  def kmvUnion(sketch: Column, k: Int): Column =
    ColumnBridge.column(
      KmvUnionAgg(ColumnBridge.expression(sketch), k).toAggregateExpression())

  /** Rank key → its position in the unit interval (0, 1). */
  private def unit(rankKey: Column): Column =
    (rankKey.cast("double") + lit(Shift)) / lit(Two64)

  /** Distinct-count estimate from a sketch: exact while the set fit in
    * k (the sketch IS the set), else the bottom-k estimator
    * (k−1)/U(k) with U(k) the k-th smallest normalized hash.
    */
  def estDistinct(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit(k - 1.0) / unit(element_at(sketch, k)))

  /** The combined bottom-k of two sketches — itself a valid sketch of
    * the union (rank keys are globally ordered, so the k smallest of
    * the merged arrays are the k smallest of the union's survivors).
    */
  def unionSketch(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** Intersection-cardinality estimate (Beyer et al. '07): ρ = members
    * of the combined bottom-k present in BOTH sketches, scaled by the
    * union estimate: |A∩B| ≈ (ρ/|K|)·D̂(A∪B). Exact when both sets fit
    * in k. Null-safe: empty∩anything estimates 0.
    */
  def estIntersect(a: Column, b: Column, k: Int): Column = {
    val u = unionSketch(a, b, k)
    val rho = size(array_intersect(array_intersect(u, a), b)).cast("double")
    when(size(u) === 0, lit(0.0))
      .otherwise(rho / size(u) * estDistinct(u, k))
  }
}

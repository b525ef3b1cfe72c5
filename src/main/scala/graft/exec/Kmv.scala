package graft.exec

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** K-minimum-values (KMV / theta) distinct sketches (Beyer et al. 2007,
  * "On Synopses for Distinct-Value Estimation Under Multiset Operations"):
  * keep the `k` smallest distinct 64-bit hashes of a column. Where HLL
  * answers only "how many distinct", KMV sketches support SET ALGEBRA —
  * union, and crucially INTERSECTION estimates ("how many shingles do the
  * train and eval corpora share") that register sketches cannot express.
  *
  * The sketch is a bounded, mergeable aggregate: each task keeps at most
  * `k` longs, partials merge associatively (keep the k smallest of the
  * union), and only sketches cross the exchange. Set operations are pure
  * codegen'd array expressions over the released sketches — no second pass
  * over data.
  *
  * Exactness contract (the driver-oracle regime): while the true distinct
  * count is < k the sketch retains EVERY hash, so estimates are exact
  * counts and intersections are exact distinct-overlap counts (modulo
  * 64-bit hash collisions, ~n^2/2^64). Past k, the classic estimators
  * apply: distinct ~ (k-1)/U_(k) with relative error ~1/sqrt(k-2), and
  * intersection via the rho * union rule.
  *
  * Encoding: values are stored as xxhash64 XOR Long.MinValue, making
  * SIGNED ascending order equal UNSIGNED ascending order of the raw hash —
  * so plain array_sort / array ops / min-k logic all use natural longs.
  */
final case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvSketchAgg.State]
    with UnaryLike[Expression] {

  require(k >= 2, "kmv_sketch needs k >= 2")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch aggregates pre-hashed longs, got ${child.dataType.simpleString}")

  import KmvSketchAgg.State

  override def createAggregationBuffer(): State = new State(k)

  override def update(buffer: State, input: InternalRow): State = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: State, other: State): State = {
    buffer.mergeWith(other)
    buffer
  }

  override def eval(buffer: State): Any =
    new GenericArrayData(buffer.sortedValues)

  override def serialize(obj: State): Array[Byte] = obj.toBytes
  override def deserialize(bytes: Array[Byte]): State = State.fromBytes(bytes, k)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "kmv_sketch"
}

object KmvSketchAgg {
  /** Bounded min-k set of flipped hashes. A TreeSet keeps membership and
    * max-eviction both O(log k); state never exceeds k entries.
    */
  final class State(val k: Int) {
    private val set = new java.util.TreeSet[java.lang.Long]()

    def add(v: Long): Unit =
      if (set.size < k) { set.add(v); () }
      else if (v < set.last()) { if (set.add(v)) { set.pollLast(); () } }

    def mergeWith(other: State): Unit = {
      val it = other.set.iterator()
      while (it.hasNext) add(it.next())
    }

    def sortedValues: Array[Long] = {
      val out = new Array[Long](set.size)
      val it = set.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }

    def toBytes: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(set.size)
      val it = set.iterator()
      while (it.hasNext) out.writeLong(it.next())
      out.flush()
      bos.toByteArray
    }
  }

  object State {
    def fromBytes(bytes: Array[Byte], k: Int): State = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val st = new State(k)
      val n = in.readInt()
      var i = 0
      while (i < n) { st.add(in.readLong()); i += 1 }
      st
    }
  }
}

/** Grouped union of already-built KMV sketches — the rollup aggregate
  * that turns per-(day, source) sketches into per-source sketches without
  * re-reading data. Unlike HLL (whose direct builds score via HIP and
  * unions via the standard estimator), KMV has ONE estimator, so a rolled-
  * up sketch is BIT-IDENTICAL to a direct single-pass sketch of the
  * combined data: k-smallest-of-union is associative, order-free, and
  * exactly what one pass retains (KmvSpec pins this).
  */
final case class KmvUnionAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvSketchAgg.State]
    with UnaryLike[Expression] {

  require(k >= 2, "kmv_union needs k >= 2")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kmv_union merges array<bigint> sketches, got ${other.simpleString}")
    }

  import KmvSketchAgg.State

  override def createAggregationBuffer(): State = new State(k)

  override def update(buffer: State, input: InternalRow): State = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      while (i < arr.numElements()) { buffer.add(arr.getLong(i)); i += 1 }
    }
    buffer
  }

  override def merge(buffer: State, other: State): State = {
    buffer.mergeWith(other)
    buffer
  }

  override def eval(buffer: State): Any =
    new GenericArrayData(buffer.sortedValues)

  override def serialize(obj: State): Array[Byte] = obj.toBytes
  override def deserialize(bytes: Array[Byte]): State =
    KmvSketchAgg.State.fromBytes(bytes, k)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def withNewMutableAggBufferOffset(newOffset: Int): KmvUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvUnionAgg =
    copy(child = newChild)
  override def prettyName: String = "kmv_union"
}

/** Column API over [[KmvSketchAgg]] plus the codegen'd set-operation
  * estimators. Sketches are sorted array<long> in the flipped encoding;
  * every helper below is a pure projection over released sketches.
  *
  * INVARIANT: every sketch passed to [[estimate]] / [[union]] /
  * [[intersectEstimate]] / [[jaccardEstimate]] must have been built by
  * [[sketch]]/[[unionAgg]] with the SAME `k` — the sketch array does not
  * carry its k, so the estimators trust the caller. A sketch built with a
  * LARGER k is caught structurally (size > k fails loudly via
  * [[checkK]]); a sketch built with a SMALLER k is indistinguishable from
  * an exact-regime sketch and would silently bias the estimator — keep k
  * in one place at the call site.
  */
object Kmv {

  /** Structural k guard: a sketch can never hold more than its k hashes,
    * so size > k proves a mismatched (larger-k) sketch — fail loudly
    * instead of estimating from the wrong order statistic.
    */
  private def checkK(sk: Column, k: Int): Column =
    when(size(sk) > k,
      raise_error(concat(
        lit("kmv: sketch holds "), size(sk).cast("string"),
        lit(s" hashes but k=$k was passed — it was built with a larger k"))))
      .otherwise(sk)

  /** Grouped rollup: union many sketches per group ([[KmvUnionAgg]]);
    * bit-identical to sketching the combined data directly.
    */
  def unionAgg(sketches: Column, k: Int): Column =
    ColumnBridge.column(
      KmvUnionAgg(ColumnBridge.expression(sketches), k)
        .toAggregateExpression())

  /** Aggregate: the KMV sketch of `c` (any type; hashed with xxhash64).
    * Null items are skipped, matching count(DISTINCT c)'s null discipline.
    */
  def sketch(c: Column, k: Int): Column = {
    val flipped = when(c.isNotNull,
      xxhash64(c).bitwiseXOR(lit(Long.MinValue)))
    ColumnBridge.column(
      KmvSketchAgg(ColumnBridge.resolvedExpression(flipped), k)
        .toAggregateExpression())
  }

  /** Normalized uniform of the flipped hash at `idx` (0-based), in (0, 1). */
  private def u(sk: Column, idx: Column): Column =
    (element_at(sk, idx + 1).cast("double") + lit(9.223372036854776e18)) /
      lit(1.8446744073709552e19)

  /** Distinct-count estimate: exact size while < k (every hash retained),
    * else (k-1) / U_(k).
    */
  def estimate(sk: Column, k: Int): Column = {
    val s = checkK(sk, k)
    when(size(s) < k, size(s).cast("double"))
      .otherwise(lit((k - 1).toDouble) / u(s, lit(k - 1)))
  }

  /** Union sketch: the k smallest distinct hashes of either side — exactly
    * the sketch a single pass over the concatenated data would build.
    */
  def union(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(checkK(a, k), checkK(b, k)))), 1, k)

  /** Distinct-intersection estimate via the rho * union rule
    * (|U_k ∩ A ∩ B| / |U_k|) * estimate(U_k): exact when the union stays
    * under k (U_k then holds every hash of both sides), the standard
    * theta-sketch estimator past it.
    */
  def intersectEstimate(a: Column, b: Column, k: Int): Column = {
    val uk = union(a, b, k)
    val common = size(array_intersect(array_intersect(uk, a), b))
    when(size(uk) === 0, lit(0.0)).otherwise(
      common.cast("double") / size(uk).cast("double") * estimate(uk, k))
  }

  /** Jaccard estimate of the two distinct sets: |U_k ∩ A ∩ B| / |U_k|. */
  def jaccardEstimate(a: Column, b: Column, k: Int): Column = {
    val uk = union(a, b, k)
    when(size(uk) === 0, lit(0.0)).otherwise(
      size(array_intersect(array_intersect(uk, a), b)).cast("double") /
        size(uk).cast("double"))
  }
}

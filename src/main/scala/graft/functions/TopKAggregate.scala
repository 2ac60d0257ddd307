package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k accumulator: keeps the k best (score desc, id asc) pairs. */
final class TopKBuffer(val k: Int) {
  // flat arrays, heap-ordered with the WORST element at index 0
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  // Total order via Double.compare (NaN sorts greatest, matching Spark's
  // window ordering, and never wedges the heap); -0.0 is normalized to 0.0
  // at insertion so it ties with 0.0 exactly as SQL comparisons do.
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c < 0 || (c == 0 && i1 > i2)
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var m = i
      if (l < n && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < n && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) return
      val ts = scores(i); scores(i) = scores(m); scores(m) = ts
      val ti = ids(i); ids(i) = ids(m); ids(m) = ti
      i = m
    }
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) / 2
      if (worse(scores(i), ids(i), scores(p), ids(p))) {
        val ts = scores(i); scores(i) = scores(p); scores(p) = ts
        val ti = ids(i); ids(i) = ids(p); ids(p) = ti
        i = p
      } else return
    }
  }

  def add(score0: Double, id: Long): Unit = {
    val score = if (score0 == 0.0) 0.0 else score0 // normalize -0.0
    if (n < k) {
      scores(n) = score; ids(n) = id; n += 1; siftUp(n - 1)
    } else if (k > 0 && worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id; siftDown(0)
    }
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.n) { add(other.scores(i), other.ids(i)); i += 1 }
  }

  /** (id, score) pairs sorted best-first (Double.compare total order). */
  def sorted: Array[(Long, Double)] = {
    val out = Array.tabulate(n)(i => (ids(i), scores(i)))
    out.sortWith { case ((i1, s1), (i2, s2)) =>
      val c = java.lang.Double.compare(s1, s2)
      c > 0 || (c == 0 && i1 < i2)
    }
  }
}

/** Native Catalyst bounded top-k aggregate: `topk_by_score(score, id, k)` →
  * `array<struct<id:bigint, score:double>>` sorted best-first (score desc,
  * id asc ties).
  *
  * This is the aggregation `row_number()`-over-a-window cannot be: the
  * accumulator is O(k) per group on BOTH the partial (map) and final
  * (reduce) side, so ranking N scored rows per group shuffles only
  * partitions×k pre-reduced pairs — the SQL-facing twin of
  * `SimOps.topKPerQuery` with no Dataset encode/decode hop. Plans as
  * ObjectHashAggregate with a partial_topk_by_score stage.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TopKBuffer] with ImplicitCastInputTypes {

  private lazy val k: Int = {
    require(kExpr.foldable, "topk_by_score: k must be a literal")
    val v = kExpr.eval().asInstanceOf[Number].intValue()
    require(v > 0, "topk_by_score: k must be positive")
    v
  }

  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType, IntegerType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(new StructType()
    .add("id", LongType, nullable = false)
    .add("score", DoubleType, nullable = false), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows: Array[Any] = buf.sorted.map { case (i, s) =>
      InternalRow(i, s): Any
    }
    new GenericArrayData(rows): ArrayData
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * buf.n)
    bb.putInt(buf.k); bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.add(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
  override def prettyName: String = "topk_by_score"
}

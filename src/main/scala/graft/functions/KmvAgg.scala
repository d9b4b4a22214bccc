package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.types._

/** The KMV (k-minimum-values / theta) register as a MAP-SIDE-COMBINABLE,
  * DUPLICATE-SKIPPING aggregate — the scale shape a distinct sketch
  * BUILD needs at 100 TB. The previous spelling (`.distinct()` then a
  * bounded top-k heap) was k-bounded only AFTER its first exchange: the
  * distinct is a hash aggregate keyed on (group, hash), and at
  * sketch-relevant cardinalities (per-partition values mostly unique)
  * its exchange carries O(distinct values) across the wire — the exact
  * cost a distinct sketch exists to avoid, and the wire cost the
  * module's own HLL never pays (register MAX combines map-side). This
  * aggregate keeps a k-bounded SET per group in each map task — set
  * semantics give duplicate skipping for free, the k-bound caps it —
  * so the ONE exchange carries at most k longs per (group, partition)
  * no matter how many rows or distinct values a partition holds, and a
  * merge of stored sketches ([[graft.ops.Sketches.kmvMerge]]) rides
  * the identical path.
  *
  * Result: the at-most-k smallest DISTINCT hash values, ascending —
  * exactly the rows the distinct+heap spelling produced (spec-pinned
  * as row equality), so estimates, merges and the theta set algebra
  * replay unchanged. */
object KmvAgg {

  /** At most k smallest distinct longs. TreeSet: dedup + ordered in
    * one structure; `last` is the current cut line, insertion
    * O(log k). */
  final class Buf(val k: Int) {
    private[KmvAgg] val set = new java.util.TreeSet[java.lang.Long]()
    def add(h: Long): Unit = {
      if (set.size < k) { set.add(java.lang.Long.valueOf(h)); () }
      else if (h < set.last()) {
        if (set.add(java.lang.Long.valueOf(h))) { set.pollLast(); () }
      }
    }
  }

  case class KmvMinK(hash: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Buf] {
    require(k >= 1, "kmvMinK needs k >= 1")
    override def children: Seq[Expression] = Seq(hash)
    override def nullable: Boolean = false
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (hash.dataType == LongType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kmv_min_k needs a bigint hash, got ${hash.dataType} — " +
            "cast explicitly")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def createAggregationBuffer(): Buf = new Buf(k)

    override def update(b: Buf, input: InternalRow): Buf = {
      val v = hash.eval(input)
      if (v != null) b.add(v.asInstanceOf[Long])
      b
    }

    override def merge(b: Buf, o: Buf): Buf = {
      o.set.forEach(h => b.add(h.longValue))
      b
    }

    /** Ascending — TreeSet iteration order IS the rank order. */
    override def eval(b: Buf): Any = {
      val arr = new Array[Any](b.set.size)
      var i = 0
      val it = b.set.iterator()
      while (it.hasNext) { arr(i) = it.next().longValue; i += 1 }
      new GenericArrayData(arr)
    }

    override def serialize(b: Buf): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + b.set.size * 8)
      bb.putInt(b.set.size)
      b.set.forEach(h => { bb.putLong(h.longValue); () })
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Buf = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val b = new Buf(k)
      var i = 0
      while (i < n) { b.add(bb.getLong); i += 1 }
      b
    }

    override def withNewMutableAggBufferOffset(o: Int): KmvMinK =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KmvMinK =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression =
      copy(hash = c(0))
    override def prettyName: String = "kmv_min_k"
  }

  /** Column form: the at-most-k smallest distinct values of `hash`
    * per group, as array<bigint> ascending. */
  def kmvMinK(hash: Column, k: Int): Column =
    toCol(KmvMinK(toExpr(hash), k).toAggregateExpression())
}

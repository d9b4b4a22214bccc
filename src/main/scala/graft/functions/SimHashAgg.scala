package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.Bridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The md5-replayable SimHash bit-vote tally as ONE typed imperative
  * aggregate (r19 optimization, guide §4).
  *
  * The previous spelling staged 16 digit-value projections, 64
  * two-op vote columns and 64 `sum()` aggregates, then re-assembled
  * the signature from the 64 tally columns — value-correct and
  * map-side combinable, but the 64-wide aggregate made the generated
  * whole-stage code large enough that its Janino compile recurred on
  * EVERY execution (measured ~1.7 s of q175's hot stage with a warm
  * JVM: disabling codegen halved the stage). This aggregate keeps the
  * 64 tallies in one binary buffer (object aggregation — no
  * whole-stage codegen unit at all), still combines map-side, and
  * evaluates straight to the 16-hex-digit signature.
  *
  * Value parity with the column spelling, exactly:
  *  - digit value v_j = instr('0123456789abcdef', digit) - 1 (so a
  *    non-hex digit reads -1 — unreachable for md5 output);
  *  - bit k of digit j votes +1 iff floor-toward-zero(v / 2^(3-k))
  *    is odd, else -1 (the when/otherwise arms);
  *  - a NULL hex input contributes nothing (sum() null semantics);
  *  - tallies are long sums of ±1 (bit-exact integers);
  *  - sig digit j = hex(Σ_k [t_{j,k} > 0] · 2^(3-k)).
  */
object SimHashAgg {

  private val HexChars = "0123456789abcdef"

  final class Tally {
    val t = new Array[Long](64)
  }

  case class SimHashSig(hx: Expression,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Tally] {
    override def children: Seq[Expression] = Seq(hx)
    override def nullable: Boolean = true
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (hx.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_sig needs a hex string, got ${hx.dataType}")
    override def dataType: DataType = StringType

    override def createAggregationBuffer(): Tally = new Tally

    override def update(b: Tally, input: InternalRow): Tally = {
      val v = hx.eval(input)
      if (v != null) {
        val s = v.toString
        var j = 0
        while (j < 16) {
          // instr(...) - 1: not-found and absent positions read -1,
          // whose floor-toward-zero div/mod bit test is 0 -> vote -1
          val dv =
            if (j < s.length) HexChars.indexOf(s.charAt(j)) else -1
          var k = 0
          while (k < 4) {
            val bit = if (dv >= 0) (dv >> (3 - k)) & 1 else 0
            b.t(j * 4 + k) += (if (bit == 1) 1L else -1L)
            k += 1
          }
          j += 1
        }
      }
      b
    }

    override def merge(b: Tally, o: Tally): Tally = {
      var i = 0
      while (i < 64) { b.t(i) += o.t(i); i += 1 }
      b
    }

    override def eval(b: Tally): Any = {
      val out = new Array[Char](16)
      var j = 0
      while (j < 16) {
        var nib = 0
        var k = 0
        while (k < 4) {
          if (b.t(j * 4 + k) > 0) nib |= 1 << (3 - k)
          k += 1
        }
        out(j) = HexChars.charAt(nib)
        j += 1
      }
      UTF8String.fromString(new String(out))
    }

    override def serialize(b: Tally): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(64 * 8)
      var i = 0
      while (i < 64) { bb.putLong(b.t(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Tally = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val b = new Tally
      var i = 0
      while (i < 64) { b.t(i) = bb.getLong; i += 1 }
      b
    }

    override def withNewMutableAggBufferOffset(o: Int): SimHashSig =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): SimHashSig =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression = copy(hx = c(0))
    override def prettyName: String = "simhash_sig"
  }

  /** The 16-hex-digit majority signature of a group of md5 token
    * hashes — see [[SimHashSig]]. */
  def sigOf(hx: Column): Column = toCol(
    SimHashSig(toExpr(hx)).toAggregateExpression())
}

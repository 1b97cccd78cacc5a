package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}

/** Native nearest-centroid assignment against a constant codebook —
  * the hot inner op of every Lloyd iteration, PQ/OPQ coding pass, and
  * k-center round.
  *
  * Replaces `array_min(distStructs(v, cents))`: the `transform` HOF is
  * CodegenFallback in Spark, so the k-centroid loop ran interpreted,
  * allocating a boxed struct row per centroid per row and re-walking
  * the literal centroid arrays through `element_at`; at k=256 that
  * dominated PQ training. This expression does the whole argmin as one
  * primitive-array loop per row, computing |v|² ONCE per row instead
  * of per centroid.
  *
  * Bit-exactness contract (hash-checked by every consumer's oracle):
  *  - d2 = greatest(dot(v,v) + dot(c,c) − 2·dot(v,c), 0) with every
  *    dot a left fold in ascending index order — the same operation
  *    sequence as distStructs / the oracle's list_reduce, so the
  *    doubles are identical;
  *  - the winner is min by (d2, cid) — exactly array_min's struct
  *    ordering, independent of codebook order.
  *
  * Still CodegenFallback itself, but the fallback is ONE virtual call
  * per row around tight primitive loops — the per-element boxing of
  * the HOF form is what cost the time, not the call boundary.
  */
case class ArgminCentroid(child: Expression,
                          cids: Array[Long],
                          cents: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {

  // |c|² folded once at plan time — same left-assoc 0.0 + x·x sequence
  // as the oracle, so (vn2 + cn2) − 2·dot reproduces the HOF doubles.
  private lazy val cn2: Array[Double] = cents.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  }

  override def dataType: DataType = StructType(Seq(
    StructField("d2", DoubleType, nullable = false),
    StructField("cid", LongType, nullable = false)))
  override def prettyName: String = "graft_argmin_centroid"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    val v = x.toDoubleArray()
    var vn2 = 0.0
    var i = 0
    while (i < n) { vn2 += v(i) * v(i); i += 1 }
    var bestD2 = Double.PositiveInfinity
    var bestCid = Long.MaxValue
    var k = 0
    while (k < cents.length) {
      val c = cents(k)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += v(j) * c(j); j += 1 }
      var d2 = vn2 + cn2(k) - 2.0 * dot
      if (d2 < 0.0) d2 = 0.0
      val cid = cids(k)
      if (d2 < bestD2 || (d2 == bestD2 && cid < bestCid)) {
        bestD2 = d2; bestCid = cid
      }
      k += 1
    }
    InternalRow(bestD2, bestCid)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

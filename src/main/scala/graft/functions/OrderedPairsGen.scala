package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Generator
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructField, StructType}

/** Native ordered-pair fan-out for an inverted-index bucket: given the
  * bucket's ascending-sorted `array<struct<doc_id:long, n:int>>`, emit
  * one row per (i < j) pair — the blocked-dedup candidate generation
  * of d_ngram_jaccard / d_containment and their derived pipelines.
  *
  * Replaces `explode(flatten(transform(ids, (x,i) => transform(
  * slice(...), y => struct(...)))))`: the HOF chain is interpreted
  * (CodegenFallback lambdas with a boxed struct per element) and —
  * worse at scale — materializes the ENTIRE pair array per bucket
  * before the explode walks it: a cap-sized bucket is cap²/2 structs
  * (~5 MB at cap 500) allocated at once per input row. This generator
  * yields pairs lazily, one flat row at a time, from two primitive
  * arrays extracted once per bucket; peak memory is the bucket itself.
  *
  * `minSizeRatio` replays the lossless similarity-join size filter
  * with IDENTICAL float semantics to the Column form it replaces
  * (`least(na,nb).cast(double) >= greatest(na,nb).cast(double) * lit(r)`
  * — see orderedPairs): pairs are skipped, never reordered, so the
  * emitted sequence is the filtered subsequence of the HOF's output
  * and every downstream aggregate is bit-identical.
  */
case class OrderedPairsGen(child: Expression, minSizeRatio: Double)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("na", IntegerType, nullable = false),
    StructField("doc_b", LongType, nullable = false),
    StructField("nb", IntegerType, nullable = false)))

  override def prettyName: String = "graft_ordered_pairs"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n < 2) Iterator.empty
      else {
        val ids = new Array[Long](n)
        val szs = new Array[Int](n)
        var k = 0
        while (k < n) {
          val s = arr.getStruct(k, 2)
          ids(k) = s.getLong(0)
          szs(k) = s.getInt(1)
          k += 1
        }
        new Iterator[InternalRow] {
          private var i = 0
          private var j = 1
          private var ready = false

          private def keep(a: Int, b: Int): Boolean =
            minSizeRatio <= 0.0 ||
              math.min(a, b).toDouble >= math.max(a, b).toDouble * minSizeRatio

          private def advance(): Unit = {
            while (!ready && i < n - 1) {
              if (j >= n) { i += 1; j = i + 1 }
              else if (keep(szs(i), szs(j))) ready = true
              else j += 1
            }
          }

          override def hasNext: Boolean = { advance(); ready }

          override def next(): InternalRow = {
            advance()
            if (!ready) throw new NoSuchElementException("OrderedPairsGen exhausted")
            val r = InternalRow(ids(i), szs(i), ids(j), szs(j))
            ready = false
            j += 1
            r
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Id-only variant for buckets keyed without set sizes (LSH band
  * buckets, prefix buckets): ascending-sorted `array<long>` → one row
  * per (i < j) pair. Same lazy-iterator shape as [[OrderedPairsGen]].
  */
case class OrderedIdPairsGen(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false)))

  override def prettyName: String = "graft_ordered_id_pairs"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n < 2) Iterator.empty
      else {
        val ids = arr.toLongArray()
        new Iterator[InternalRow] {
          private var i = 0
          private var j = 1
          override def hasNext: Boolean = i < n - 1 && j < n
          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException("OrderedIdPairsGen exhausted")
            val r = InternalRow(ids(i), ids(j))
            j += 1
            if (j >= n) { i += 1; j = i + 1 }
            r
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

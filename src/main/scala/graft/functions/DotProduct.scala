package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst dot product over two double-array columns.
  *
  * The `aggregate(zip_with(a, b, _*_), 0.0, _+_)` formulation allocates
  * an intermediate array and walks interpreted lambdas per element;
  * this expression is a single codegen'd loop over the two `ArrayData`
  * buffers (stays inside whole-stage codegen — it is the hot inner op
  * of every cosine in the similarity/dedup operators).
  *
  * Accumulation is ascending-index (a left fold), so results are
  * bit-identical to the HOF formulation and to the DuckDB oracle's
  * `list_reduce` replay.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must already be array<double>; the gfunctions wrapper casts.
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  // Null semantics mirror aggregate(zip_with(a, b, _*_), 0.0, _+_)
  // exactly (so the optimizer rewrite is observation-equivalent):
  // zip_with pads a length mismatch with nulls and a null element
  // poisons the fold → null result.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Portable `mult`-ary polynomial string hash mod 2³¹−1 — the
  * fingerprint primitive behind t_fingerprint / d_minhash_lsh /
  * d_simhash. Same value as folding `ascii(char)` over the characters
  * (what the DuckDB oracle replays), but as one codegen'd loop instead
  * of a per-char split + interpreted lambda fold. `mult` selects an
  * independent hash family member (31 is the default; d_simhash
  * concatenates the 31- and 131-ary members into its 60-bit
  * signature).
  */
case class PolyHash(child: Expression, mult: Long = 31L) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * mult + s.charAt(i)) % 2147483647L; i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |java.lang.String $s = $in.toString();
         |long $h = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $h = ($h * ${mult}L + $s.charAt($i)) % 2147483647L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Registers graft's native expressions; installed by GraftSession via
  * `SparkSessionExtensions` (the same hook a cluster deploy would list
  * in `spark.sql.extensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1)),
    ))
    ext.injectFunction((
      new FunctionIdentifier("graft_polyhash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_polyhash"),
      (children: Seq[Expression]) => PolyHash(children.head),
    ))
    ext.injectOptimizerRule(_ => DotProductRewrite)
  }
}

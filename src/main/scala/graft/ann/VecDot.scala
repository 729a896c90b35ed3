package graft.ann

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dot product of two numeric array columns, accumulated in double —
  * the pairwise-scoring kernel of [[Similarity]].
  *
  * Why a custom expression and not `aggregate(zip_with(...))` or an
  * unrolled `a[0]*b[0] + ...` sum (both were measured):
  *  - the higher-order-function form is CodegenFallback — every pair
  *    in the O(n^2) scoring loop pays interpreted lambda dispatch plus
  *    a zipped-array allocation (q16: ~1.9 s at sf0.1);
  *  - the unrolled form codegens, but 128 inlined element accesses per
  *    pair bloat the join-stage method past HotSpot's 8000-byte JIT
  *    ceiling (`bhj_doConsume` measured 37 KB) — the stage runs in the
  *    BYTECODE INTERPRETER and gets ~5x SLOWER (q16: 10-14 s), and at
  *    higher dims the ~100k-node tree additionally turns driver-side
  *    Catalyst planning into the bottleneck (q18 unrolled: 99.7 s/run,
  *    planning-bound).
  *  This expression is ONE plan node whose codegen is a ~15-line
  *  counted loop — tiny method, JIT-compiled, loop-unrollable — the
  *  standard extension-point technique for a numeric kernel.
  *
  * Semantics are BIT-IDENTICAL to
  * `aggregate(zip_with(da, db, (x, y) => x * y), 0d, (acc, v) => acc + v)`
  * over the element-wise double casts: the sum starts at 0.0 and adds
  * products in ascending index order (same IEEE sequence), the result
  * is null when either side is null, when the lengths differ (zip_with
  * pads with null, poisoning the fold), or when any element pair holds
  * a null. The driver oracle gate (hash match on q16-q18) and
  * SimilaritySpec's blocked==brute-force-bit-for-bit test pin this.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<float|double> inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def get(arr: String, e: Expression, i: String) =
        if (elemType(e) == FloatType) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |int graft_n = $a.numElements();
         |if (graft_n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double graft_s = 0.0;
         |  for (int graft_i = 0; graft_i < graft_n; graft_i++) {
         |    if ($a.isNullAt(graft_i) || $b.isNullAt(graft_i)) { ${ev.isNull} = true; break; }
         |    graft_s += (${get(a, left, "graft_i")}) * (${get(b, right, "graft_i")});
         |  }
         |  if (!${ev.isNull}) ${ev.value} = graft_s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot = copy(newLeft, newRight)
}

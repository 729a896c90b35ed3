package graft

import org.apache.spark.sql.GraftInternalAccess
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ann.VecDot

class VecDotSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    GraftInternalAccess.exprColumn(VecDot(
      GraftInternalAccess.columnExpr(a), GraftInternalAccess.columnExpr(b)))

  /** The HOF form VecDot replaces — the bit-equality reference. */
  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    def d(c: org.apache.spark.sql.Column) = transform(c, x => x.cast("double"))
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0d), (acc, v) => acc + v)
  }

  test("VecDot == aggregate(zip_with(...)) bit-for-bit on random float vectors") {
    val rnd = new scala.util.Random(11L)
    val rows = Seq.fill(200)(
      (Seq.fill(64)(rnd.nextGaussian().toFloat), Seq.fill(64)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("a", "b")
    val diff = df.select(dot(col("a"), col("b")).as("v"), hofDot(col("a"), col("b")).as("h"))
      .filter(col("v") =!= col("h")) // exact double equality, not tolerance
    assert(diff.count() == 0)
  }

  test("VecDot matches HOF null semantics: length mismatch, null element, null side, empty") {
    val df = Seq(
      (Seq(1f, 2f), Seq(1f, 2f, 3f)),           // length mismatch -> null
      (Seq(1f, 2f), null),                       // null side -> null
      (Seq.empty[Float], Seq.empty[Float])       // empty -> 0.0
    ).toDF("a", "b")
    val got = df.select(dot(col("a"), col("b")).as("v"),
      hofDot(col("a"), col("b")).as("h")).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), r.toString)
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
    }
    // null ELEMENT poisons the fold on both forms
    val withNullElem = spark.sql(
      "SELECT array(1.0F, CAST(NULL AS FLOAT)) AS a, array(1.0F, 2.0F) AS b")
    val r = withNullElem.select(dot(col("a"), col("b")).as("v"),
      hofDot(col("a"), col("b")).as("h")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("VecDot on double arrays and mixed float/double literal planes") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(0.5, -1.0, 2.0))).toDF("f", "d")
    val r = df.select(dot(col("f"), col("d")).as("v")).head()
    assert(r.getDouble(0) == (1.0 * 0.5 + 2.0 * -1.0 + 3.0 * 2.0))
  }

  test("VecDot interpreted eval (non-codegen path) equals the codegen result") {
    // eval() path: evaluate the expression directly against a row
    val e = VecDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f, 2.0f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = false)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(3.0, 4.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = false)))
    assert(e.eval(null) == (1.0 * 3.0 + 2.0 * 4.0))
  }
}

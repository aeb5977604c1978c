package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Cosine similarity between two float-vector columns as a native
  * Catalyst expression with whole-stage codegen.
  *
  * This is the hot scalar of the similarity/dedup family: at 100 TB a
  * Scala UDF here would box two arrays per row and fall out of
  * WholeStageCodegen; this expression compiles to a tight primitive
  * loop over the unsafe array data (`getFloat`), accumulating in
  * double. Single sequential accumulation order keeps results
  * deterministic across partitionings.
  *
  * Returns NaN when either vector has zero norm; null handling is the
  * standard null-intolerant contract.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0d; var nx = 0d; var ny = 0d; var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv; i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $x.getFloat($i);
         |  double $yv = (double) $y.getFloat($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH signature: bit i of the result is the sign
  * of dot(vec, plane_i). Planes are plan constants (passed via
  * addReferenceObj in codegen), so the inner loop is a tight
  * primitive double loop — the expression-tree formulation rebuilt a
  * 64-literal array per element per plane.
  */
case class HyperplaneSignature(child: Expression, planes: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_sig"

  @transient private lazy val matrix: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def nullSafeEval(v: Any): Any =
    HyperplaneSignature.evalArray(v.asInstanceOf[ArrayData], matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => {
      val m = ctx.addReferenceObj("planes", matrix, "double[][]")
      s"graft.functions.HyperplaneSignature.evalArray($x, $m)"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSignature {
  /** Shared by interpreted and codegen paths. */
  def evalArray(x: ArrayData, matrix: Array[Array[Double]]): Long = {
    var sig = 0L
    var p = 0
    while (p < matrix.length) {
      val plane = matrix(p)
      val n = math.min(x.numElements(), plane.length)
      var dot = 0d
      var i = 0
      while (i < n) { dot += x.getFloat(i).toDouble * plane(i); i += 1 }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}

object VectorFunctions {
  /** Column-API entry point: cosine_similarity(a, b) over
    * array<float> columns. */
  def cosineSim(a: Column, b: Column): Column =
    Shim.toColumn(
      CosineSimilarity(Shim.toExpression(a), Shim.toExpression(b)))

  /** hyperplane_sig(vec) with constant planes — bit i is
    * sign(dot(vec, plane_i)). */
  def hyperplaneSig(vec: Column, planes: Seq[Seq[Double]]): Column =
    Shim.toColumn(HyperplaneSignature(Shim.toExpression(vec), planes))
}

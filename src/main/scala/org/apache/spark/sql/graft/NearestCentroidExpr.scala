package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid assignment against a LARGE centroid table, as one
  * compact loop over a reference-object matrix.
  *
  * The small-k IVF spelling unrolls the k centroids into k literal
  * array expressions inside an `array_max(array(struct...))` — perfect
  * codegen at k<=64, but generated-code size grows linearly with
  * k*dims, and around k in the hundreds the stage overflows janino's
  * method limit into interpreted fallback (then into compile failure).
  * Production IVF uses k in the thousands, so this expression keeps
  * the generated code O(1): the centroid matrix and its norms travel
  * as reference objects (the same mechanism broadcast scalar values
  * use), and both eval paths run the identical double loop.
  *
  * Semantics are value-identical to the literal spelling
  * (Similarity.bestCell): scores are cosine rounded HALF_UP to
  * `roundTo` decimals (Spark's `round`), the winner is the max rounded
  * score with ties taking the SMALLEST centroid id, and double
  * comparison follows Spark's total order (NaN greatest, -0 < 0) via
  * `Double.compare`. A null vector, null element, or dimension
  * mismatch yields NULL, exactly like `graft_dot`.
  *
  * Output: struct(centroid_id int, score double).
  */
case class NearestCentroidExpr(child: Expression, ids: Array[Int],
                               matrix: Array[Array[Double]],
                               norms: Array[Double], roundTo: Int)
    extends UnaryExpression {

  require(ids.length == matrix.length && ids.length == norms.length
    && ids.nonEmpty, "centroid ids/matrix/norms must align and be non-empty")

  private val numeric = Seq(ByteType, ShortType, IntegerType, LongType,
    FloatType, DoubleType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if numeric.contains(t) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroid expects a numeric array, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("centroid_id", IntegerType, nullable = false),
    StructField("score", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_centroid"

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  @transient private lazy val get: (ArrayData, Int) => Double =
    elemType match {
      case DoubleType  => (a, i) => a.getDouble(i)
      case FloatType   => (a, i) => a.getFloat(i).toDouble
      case LongType    => (a, i) => a.getLong(i).toDouble
      case IntegerType => (a, i) => a.getInt(i).toDouble
      case ShortType   => (a, i) => a.getShort(i).toDouble
      case ByteType    => (a, i) => a.getByte(i).toDouble
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val x = new Array[Double](n)
    var i = 0
    var nv = 0.0
    while (i < n) {
      if (v.isNullAt(i)) return null
      x(i) = get(v, i)
      nv += x(i) * x(i)
      i += 1
    }
    nv = math.sqrt(nv)
    var bestScore = Double.NegativeInfinity
    var bestId = Int.MaxValue
    var c = 0
    while (c < matrix.length) {
      val cc = matrix(c)
      if (cc.length != n) return null
      var dp = 0.0
      var j = 0
      while (j < n) { dp += x(j) * cc(j); j += 1 }
      val sc = NearestCentroidExpr.roundHalfUp(dp / (nv * norms(c)), roundTo)
      val cmp = java.lang.Double.compare(sc, bestScore)
      if (cmp > 0 || (cmp == 0 && ids(c) < bestId)) {
        bestScore = sc; bestId = ids(c)
      }
      c += 1
    }
    InternalRow(bestId, bestScore)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cents = ctx.addReferenceObj("cents", matrix, "double[][]")
      val cnorms = ctx.addReferenceObj("cnorms", norms, "double[]")
      val cids = ctx.addReferenceObj("cids", ids, "int[]")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val nv = ctx.freshName("nv")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val dp = ctx.freshName("dp")
      val sc = ctx.freshName("sc")
      val cmp = ctx.freshName("cmp")
      val bestScore = ctx.freshName("bestScore")
      val bestId = ctx.freshName("bestId")
      val cc = ctx.freshName("cc")
      val getElem = elemType match {
        case DoubleType  => s"$v.getDouble($i)"
        case FloatType   => s"(double)$v.getFloat($i)"
        case LongType    => s"(double)$v.getLong($i)"
        case IntegerType => s"(double)$v.getInt($i)"
        case ShortType   => s"(double)$v.getShort($i)"
        case ByteType    => s"(double)$v.getByte($i)"
      }
      s"""
         |final int $n = $v.numElements();
         |final double[] $x = new double[$n];
         |double $nv = 0.0;
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $x[$i] = $getElem;
         |  $nv += $x[$i] * $x[$i];
         |}
         |if (!${ev.isNull}) {
         |  $nv = java.lang.Math.sqrt($nv);
         |  double $bestScore = Double.NEGATIVE_INFINITY;
         |  int $bestId = Integer.MAX_VALUE;
         |  for (int $c = 0; $c < $cents.length; $c++) {
         |    final double[] $cc = $cents[$c];
         |    if ($cc.length != $n) { ${ev.isNull} = true; break; }
         |    double $dp = 0.0;
         |    for (int $j = 0; $j < $n; $j++) { $dp += $x[$j] * $cc[$j]; }
         |    final double $sc = org.apache.spark.sql.graft.NearestCentroidExpr
         |      .roundHalfUp($dp / ($nv * $cnorms[$c]), $roundTo);
         |    final int $cmp = java.lang.Double.compare($sc, $bestScore);
         |    if ($cmp > 0 || ($cmp == 0 && $cids[$c] < $bestId)) {
         |      $bestScore = $sc; $bestId = $cids[$c];
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.expressions
         |      .GenericInternalRow(new Object[] {
         |        (Object) java.lang.Integer.valueOf($bestId),
         |        (Object) java.lang.Double.valueOf($bestScore) });
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression)
      : NearestCentroidExpr = copy(child = c)
}

object NearestCentroidExpr {
  /** Spark's `round(double, s)`: decimal HALF_UP via the canonical
    * string form (BigDecimal.valueOf), shared by both eval paths. */
  def roundHalfUp(d: Double, scale: Int): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Rightmost element of a SORTED struct array whose FIRST field is at
  * or before `t` — the as-of probe of
  * [[graft.operators.AsofJoinBroadcast]] as one binary search.
  *
  * The Column spelling `element_at(filter(hist, _.rt <= t), size(...))`
  * scans the key's whole history per probe row — O(h) boxed struct
  * getField calls. Under a skewed key distribution the hot key's
  * history IS the state table (a Zipf rank-1 key holds ~10% of it),
  * and the linear probe was measured at 83.7 s on the fresh-sf1
  * fixture vs 1.4 s at sf0.1 — superlinear because history length
  * grows with the corpus. The binary search is O(log h) per row and
  * removes the operator's "for long histories use the shuffle
  * spelling" caveat.
  *
  * Semantics are identical to the filter+element_at spelling on a
  * `sort_array` history: ties on the time field resolve to the LAST
  * sorted entry (upper bound), entries with a NULL time field sort
  * first and never match, a NULL probe time or empty/absent history
  * yields NULL.
  */
case class SortedAsofPickExpr(hist: Expression, t: Expression)
    extends BinaryExpression {

  override def left: Expression = hist
  override def right: Expression = t

  @transient private lazy val elemType: StructType =
    hist.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  @transient private lazy val timeType: DataType = elemType.fields(0).dataType
  @transient private lazy val nFields: Int = elemType.fields.length
  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(timeType).asInstanceOf[Ordering[Any]]

  override def checkInputDataTypes(): TypeCheckResult = hist.dataType match {
    case ArrayType(s: StructType, _) if s.fields.nonEmpty &&
        s.fields(0).dataType.sameType(t.dataType) &&
        TypeUtils.typeWithProperEquals(s.fields(0).dataType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_asof_pick expects array<struct<time, ...>> with the probe " +
        s"matching the first field; got ${hist.dataType.catalogString} " +
        s"and ${t.dataType.catalogString}")
  }

  override def dataType: DataType = elemType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_asof_pick"

  private def timeAt(arr: ArrayData, i: Int): Any = {
    val row = arr.getStruct(i, nFields)
    if (row.isNullAt(0)) null else row.get(0, timeType)
  }

  override def nullSafeEval(histVal: Any, tVal: Any): Any = {
    val arr = histVal.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // null time fields sort FIRST (struct ordering): binary-search the
    // end of the null prefix, then upper-bound in the non-null suffix
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (timeAt(arr, mid) == null) lo = mid + 1 else hi = mid
    }
    val start = lo
    hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ord.lteq(timeAt(arr, mid), tVal)) lo = mid + 1 else hi = mid
    }
    if (lo - 1 < start) null else arr.getStruct(lo - 1, nFields)
  }

  /** Generated twin of [[nullSafeEval]]: both binary-search loops
    * emitted inline over the ArrayData, so the probe stays inside
    * whole-stage codegen instead of forcing the stage interpreted
    * (the CodegenFallback predecessor ran the search boxed per row —
    * the graft_dot playbook says the generated spelling is worth it). */
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, tv) => {
      val n = ctx.freshName("n")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val start = ctx.freshName("start")
      val mid = ctx.freshName("mid")
      val row = ctx.freshName("row")
      val mt = ctx.freshName("mt")
      val rowCls = "org.apache.spark.sql.catalyst.InternalRow"
      val timeJava = CodeGenerator.javaType(timeType)
      s"""
         |final int $n = $arr.numElements();
         |int $lo = 0;
         |int $hi = $n;
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($arr.getStruct($mid, $nFields).isNullAt(0)) {
         |    $lo = $mid + 1;
         |  } else {
         |    $hi = $mid;
         |  }
         |}
         |final int $start = $lo;
         |$hi = $n;
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  $rowCls $row = $arr.getStruct($mid, $nFields);
         |  $timeJava $mt = ${CodeGenerator.getValue(row, timeType, "0")};
         |  if (${ctx.genComp(timeType, mt, tv)} <= 0) {
         |    $lo = $mid + 1;
         |  } else {
         |    $hi = $mid;
         |  }
         |}
         |if ($lo - 1 < $start) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $arr.getStruct($lo - 1, $nFields);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SortedAsofPickExpr = copy(l, r)
}

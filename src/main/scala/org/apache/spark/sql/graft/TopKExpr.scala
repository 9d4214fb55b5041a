package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native top-k-per-group aggregate: a bounded worst-first heap per
  * group, combined MAP-SIDE like any partial aggregation.
  *
  * The window spelling (`row_number() OVER (PARTITION BY g ORDER BY
  * score DESC) <= k`) SORTS every group's full candidate set after a
  * shuffle of all rows — O(n log n) per group and all-rows shuffle
  * I/O. This aggregate keeps only k entries per group per map task
  * (O(n log k) with no pre-shuffle sort), and the shuffle moves at
  * most `k * mapTasks` entries per group instead of every candidate —
  * the difference between a 50M-row sort and a few thousand heap
  * entries at ANN candidate volumes.
  *
  * Ordering is total and deterministic: best = (score DESC, id ASC),
  * identical to the window spelling every oracle checks against, so
  * results are bit-identical. Buffer state is the heap OBJECT between
  * rows (TypedImperativeAggregate) — serialization happens only at
  * shuffle boundaries.
  */
case class TopKExpr(scoreChild: Expression, idChild: Expression, k: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(scoreChild, idChild)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  // worst entry at the head: lower score first, then HIGHER id (the
  // id tie-break is ascending-best, so the larger id is worse)
  private def cmp: java.util.Comparator[(Double, Long)] =
    new java.util.Comparator[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(b._2, a._2)
      }
    }

  override def createAggregationBuffer(): java.util.PriorityQueue[(Double, Long)] =
    new java.util.PriorityQueue[(Double, Long)](k + 1, cmp)

  override def update(buf: java.util.PriorityQueue[(Double, Long)],
                      input: InternalRow): java.util.PriorityQueue[(Double, Long)] = {
    val s = scoreChild.eval(input)
    val i = idChild.eval(input)
    if (s != null && i != null) {
      buf.add((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (buf.size > k) buf.poll()
    }
    buf
  }

  override def merge(b1: java.util.PriorityQueue[(Double, Long)],
                     b2: java.util.PriorityQueue[(Double, Long)]): java.util.PriorityQueue[(Double, Long)] = {
    val it = b2.iterator()
    while (it.hasNext) {
      b1.add(it.next())
      if (b1.size > k) b1.poll()
    }
    b1
  }

  override def eval(buf: java.util.PriorityQueue[(Double, Long)]): Any = {
    val arr = new Array[(Double, Long)](buf.size)
    buf.toArray(arr.asInstanceOf[Array[AnyRef]])
    // best-first: score desc, id asc
    java.util.Arrays.sort(arr.asInstanceOf[Array[AnyRef]],
      cmp.reversed().asInstanceOf[java.util.Comparator[AnyRef]])
    new GenericArrayData(arr.map { case (s, i) =>
      val r = new GenericInternalRow(2)
      r.setLong(0, i); r.setDouble(1, s); r
    })
  }

  override def serialize(buf: java.util.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val (s, i) = it.next()
      out.writeDouble(s); out.writeLong(i)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(Double, Long)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) {
      val s = in.readDouble(); val i = in.readLong()
      buf.add((s, i))
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TopKExpr =
    copy(scoreChild = cs(0), idChild = cs(1))
}

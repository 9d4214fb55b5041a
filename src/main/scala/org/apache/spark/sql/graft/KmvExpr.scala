package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native KMV (k-minimum-values) sketch aggregate: the k smallest
  * DISTINCT hash values per group, as a bounded ordered set combined
  * MAP-SIDE (Beyer et al., SIGMOD'07).
  *
  * The composed spelling (`distinct` then bottom-k) shuffles every
  * distinct (group, hash) pair — fine when distinct cardinality is
  * small, corpus-shaped when it isn't (the exact case this sketch
  * exists to avoid). This aggregate's state is AT MOST k longs per
  * group per task, whatever the cardinality: a TreeSet admits each
  * hash once, evicts the largest beyond k, and merges set-wise at the
  * shuffle — so a billion-key distinct count ships k·tasks longs.
  *
  * Deterministic by construction (same input set -> same k smallest
  * distinct hashes regardless of order/partitioning), which is what
  * lets a DuckDB oracle replay it exactly.
  */
case class KmvExpr(hashChild: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(hashChild)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def admit(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    // cheap reject before the log(k) insert: full sketch, hash too big
    if (buf.size < k || h < buf.last()) {
      buf.add(h)
      if (buf.size > k) buf.pollLast()
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val h = hashChild.eval(input)
    if (h != null) admit(buf, h.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
                     b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) admit(b1, it.next())
    b1
  }

  /** Ascending hash values — h_k is the last element. */
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.add(in.readLong()); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): KmvExpr =
    copy(hashChild = cs(0))
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters summary (Metwally et al. 2005) over a
  * string column, mergeable per Agarwal et al. 2012 ("Mergeable
  * Summaries"): at most `k` (item, count, err) entries of aggregation
  * state per partial — the fixed-width discipline of the HLL / GK /
  * Count-Min contract queries, completing the sketch family with
  * frequent-items.
  *
  * Guarantees (hold under ANY merge order — the only properties the
  * registered query exposes):
  *  - every item with true frequency > n/k is IN the final summary;
  *  - for each kept item, count ≥ true frequency (over-estimate only)
  *    and count − true ≤ err ≤ n/k.
  * The kept-item SET beyond the guaranteed-heavy ones, and the count
  * values themselves, ARE merge-order dependent — which is why
  * [[graft.ops.EventOps]]-style contract queries emit the exact counts
  * plus guarantee BOOLEANS, never the raw estimates.
  *
  * Merge: absent items are bounded by the other summary's minimum
  * counter (its maximum possible undercount when full), then the
  * combined entries truncate to the k largest (count desc, item asc —
  * a deterministic tie-break, though no output property depends on it).
  */
case class SpaceSavingStrings(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Array[Long]]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_spacesaving"

  override def createAggregationBuffer()
      : java.util.HashMap[String, Array[Long]] =
    new java.util.HashMap[String, Array[Long]]()

  private def minEntry(buf: java.util.HashMap[String, Array[Long]])
      : (String, Long) = {
    var mk: String = null
    var mv = Long.MaxValue
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // Deterministic min choice: smallest count, then smallest item.
      if (e.getValue()(0) < mv ||
        (e.getValue()(0) == mv && (mk == null || e.getKey < mk))) {
        mv = e.getValue()(0); mk = e.getKey
      }
    }
    (mk, mv)
  }

  override def update(buf: java.util.HashMap[String, Array[Long]],
                      input: InternalRow)
      : java.util.HashMap[String, Array[Long]] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(item)
      if (cur != null) cur(0) += 1
      else if (buf.size < k) buf.put(item, Array(1L, 0L))
      else {
        val (mk, mv) = minEntry(buf)
        buf.remove(mk)
        buf.put(item, Array(mv + 1, mv))
      }
    }
    buf
  }

  override def merge(a: java.util.HashMap[String, Array[Long]],
                     b: java.util.HashMap[String, Array[Long]])
      : java.util.HashMap[String, Array[Long]] = {
    def minIfFull(m: java.util.HashMap[String, Array[Long]]): Long =
      if (m.size() < k) 0L else minEntry(m)._2
    val minA = minIfFull(a)
    val minB = minIfFull(b)
    val keys = new java.util.TreeSet[String]()
    keys.addAll(a.keySet()); keys.addAll(b.keySet())
    val merged = new java.util.ArrayList[(String, Long, Long)](keys.size)
    val it = keys.iterator()
    while (it.hasNext) {
      val x = it.next()
      val ea = a.get(x); val eb = b.get(x)
      val cnt = (if (ea != null) ea(0) else minA) +
        (if (eb != null) eb(0) else minB)
      val err = (if (ea != null) ea(1) else minA) +
        (if (eb != null) eb(1) else minB)
      merged.add((x, cnt, err))
    }
    val arr = new Array[(String, Long, Long)](merged.size)
    merged.toArray(arr)
    scala.util.Sorting.stableSort(arr,
      (p: (String, Long, Long), q: (String, Long, Long)) =>
        p._2 > q._2 || (p._2 == q._2 && p._1 < q._1))
    val out = createAggregationBuffer()
    var i = 0
    while (i < math.min(k, arr.length)) {
      out.put(arr(i)._1, Array(arr(i)._2, arr(i)._3)); i += 1
    }
    out
  }

  override def eval(buf: java.util.HashMap[String, Array[Long]]): Any = {
    val arr = new Array[(String, Long, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      arr(i) = (e.getKey, e.getValue()(0), e.getValue()(1)); i += 1
    }
    scala.util.Sorting.stableSort(arr,
      (p: (String, Long, Long), q: (String, Long, Long)) =>
        p._2 > q._2 || (p._2 == q._2 && p._1 < q._1))
    new GenericArrayData(arr.map { case (s, c, e) =>
      InternalRow(UTF8String.fromString(s), c, e)
    })
  }

  override def serialize(buf: java.util.HashMap[String, Array[Long]])
      : Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey)
      out.writeLong(e.getValue()(0))
      out.writeLong(e.getValue()(1))
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.HashMap[String, Array[Long]] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val s = in.readUTF(); val c = in.readLong(); val e = in.readLong()
      buf.put(s, Array(c, e)); i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingStrings =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingStrings =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): SpaceSavingStrings =
    copy(child = c.head)
}

object SpaceSaving {
  /** Bind `graft_spacesaving(col, k)` for this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_spacesaving",
      args => SpaceSavingStrings(args.head,
        args(1).eval().asInstanceOf[Int]).toAggregateExpression(),
      "built-in")
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** array<long> → the sub-array whose elements MIGHT be in a Bloom
  * filter — the map-side pruning step of the bloom-decontamination
  * plan ([[graft.text.CorpusOps.decontaminateBloom]]).
  *
  * Per-DOC expression (the graft.functions CodegenFallback convention:
  * one tight JVM loop per row, the surrounding projection still
  * codegens). The filter object ships once per task via the expression's
  * serialized closure — never per row. One-sided error only: a gram the
  * filter drops is definitely absent from the benchmark set, so pruning
  * can never change the downstream exact join's result — false
  * positives just ride through to the confirm join. */
case class BloomKeepLongs(child: Expression, bf: BloomFilter)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Long](8)
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      if (bf.mightContainLong(v)) out += v
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BloomKeep {
  /** Bind `graft_bloom_keep` to a built filter for this session. */
  def register(spark: SparkSession, bf: BloomFilter): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_keep",
      args => BloomKeepLongs(args.head, bf), "built-in")
}

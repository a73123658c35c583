package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE token-count expression: normalized text → number of BPE
  * tokens under a learned merge table ([[graft.text.Bpe]]).
  *
  * Per-DOC expression, so it follows the graft.functions convention:
  * CodegenFallback with one tight JVM loop per row (the surrounding
  * projection still whole-stage-codegens); the merge ranks live in a
  * pre-hashed map shared by every row of the partition — never
  * re-parsed, never shipped per row.
  *
  * Semantics mirror graft.text.Bpe exactly: words split on the Ws
  * class, symbols are characters plus the end-of-word mark, encoding
  * repeatedly merges the LOWEST-rank adjacent pair (left-to-right,
  * non-overlapping) until no adjacent pair has a rank. Words longer
  * than [[graft.text.Bpe.MaxWordLen]] — excluded from training by the
  * same bound — count as their raw symbol length without merging. */
case class BpeEncodeCount(child: Expression,
    merges: Array[(String, String)])
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType

  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      m.put(merges(i)._1 + "\u0000" + merges(i)._2, i)
      i += 1
    }
    m
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  private def encodeWordLen(word: String): Int = {
    val syms = new java.util.ArrayList[String](word.length + 1)
    var i = 0
    while (i < word.length) { syms.add(String.valueOf(word.charAt(i))); i += 1 }
    syms.add(graft.text.Bpe.EndMark)
    if (word.length > graft.text.Bpe.MaxWordLen) return syms.size()
    var changed = true
    while (changed && syms.size() > 1) {
      // lowest-rank adjacent pair
      var best = Int.MaxValue
      var j = 0
      while (j < syms.size() - 1) {
        val r = rank.get(syms.get(j) + "\u0000" + syms.get(j + 1))
        if (r != null && r < best) best = r
        j += 1
      }
      if (best == Int.MaxValue) changed = false
      else {
        val l = merges(best)._1
        val rr = merges(best)._2
        val out = new java.util.ArrayList[String](syms.size())
        var k = 0
        while (k < syms.size()) {
          if (k + 1 < syms.size() && syms.get(k) == l &&
            syms.get(k + 1) == rr) {
            out.add(l + rr); k += 2
          } else { out.add(syms.get(k)); k += 1 }
        }
        syms.clear(); syms.addAll(out)
      }
    }
    syms.size()
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var total = 0
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(s.charAt(i))) i += 1
      if (i > start) total += encodeWordLen(s.substring(start, i))
    }
    total
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BpeEncode {
  /** Bind `graft_bpe_count` to a learned merge table for this session. */
  def register(spark: SparkSession,
               merges: Array[(String, String)]): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bpe_count",
      args => BpeEncodeCount(args.head, merges), "built-in")
}

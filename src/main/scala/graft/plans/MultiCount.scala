package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: non-overlapping occurrence counts of a
  * fixed multi-pattern blocklist in one Aho–Corasick pass over the
  * document — the phrase-blocklist filter every corpus-cleaning
  * pipeline runs (badword lists, template markers, policy phrases).
  *
  * The portable spelling is one `(length(t) - length(replace(t, p)))
  * / length(p)` per pattern — P full passes over every document, which
  * is the oracle's job, not the engine's. This expression compiles the
  * pattern set into a dense byte-level DFA ONCE (driver side, shipped
  * as a reference object) and counts all patterns in a single scan;
  * per-pattern counts are greedy non-overlapping in match-end order,
  * which is exactly the left-to-right semantics of replace() for ANY
  * pattern (self-overlapping ones included), so the two spellings are
  * value-identical and the DuckDB mirror stays in plain SQL.
  *
  * Stays inside whole-stage codegen: the generated code calls the
  * automaton through a codegen reference object, same pattern as
  * Spark's own RegExpExtract and plans.ShingleHashes.
  */
case class MultiCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "graft_multi_count needs at least one non-empty pattern")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_multi_count expects STRING, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_multi_count"

  @transient private lazy val ac = AhoCorasick.build(patterns)

  override protected def nullSafeEval(input: Any): Any =
    ac.countAll(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("graftAc", ac, classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $acRef.countAll($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiCount =
    copy(child = newChild)
}

/** Dense-DFA Aho–Corasick over raw UTF-8 bytes (exact for literal
  * byte-sequence patterns regardless of encoding). `delta` is the full
  * goto function after failure-link collapse — state transitions are
  * one array read per input byte, no per-byte hash lookups; `out*` is
  * the CSR form of each state's matched-pattern set (own + via suffix
  * links). Sized O(states x 256) ints: a 100-phrase blocklist is a few
  * hundred KiB, broadcast once inside the serialized expression. */
final class AhoCorasick private (
    delta: Array[Int], outOff: Array[Int], outPat: Array[Int],
    outLen: Array[Int], nPat: Int) extends Serializable {

  /** Per-pattern greedy non-overlapping counts; called from generated code. */
  def countAll(s: UTF8String): ArrayData = {
    val counts = new Array[Long](nPat)
    val lastEnd = new Array[Int](nPat)
    java.util.Arrays.fill(lastEnd, -1)
    val n = s.numBytes()
    var st = 0
    var i = 0
    while (i < n) {
      st = delta((st << 8) | (s.getByte(i) & 0xff))
      var o = outOff(st)
      val end = outOff(st + 1)
      while (o < end) {
        val p = outPat(o)
        if (i - outLen(o) + 1 > lastEnd(p)) { counts(p) += 1; lastEnd(p) = i }
        o += 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }
}

object AhoCorasick {
  def build(patterns: Seq[String]): AhoCorasick = {
    val pats = patterns.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // trie
    val maxNodes = pats.map(_.length).sum + 1
    val next = Array.fill(maxNodes * 256)(-1)
    val own = Array.fill(maxNodes)(List.empty[Int]) // pattern ids ending here
    var nNodes = 1
    pats.zipWithIndex.foreach { case (p, pi) =>
      var st = 0
      p.foreach { b =>
        val k = (st << 8) | (b & 0xff)
        if (next(k) == -1) { next(k) = nNodes; nNodes += 1 }
        st = next(k)
      }
      own(st) ::= pi
    }
    // BFS failure links; collapse into a dense goto DFA and merge
    // output sets down the suffix chain
    val fail = new Array[Int](nNodes)
    val outSets = Array.tabulate(nNodes)(own(_).reverse)
    val delta = new Array[Int](nNodes * 256)
    val queue = scala.collection.mutable.Queue.empty[Int]
    var c = 0
    while (c < 256) {
      val t = next(c)
      if (t == -1) delta(c) = 0
      else { delta(c) = t; fail(t) = 0; queue += t }
      c += 1
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      outSets(u) = outSets(u) ++ outSets(fail(u))
      var b = 0
      while (b < 256) {
        val t = next((u << 8) | b)
        if (t == -1) delta((u << 8) | b) = delta((fail(u) << 8) | b)
        else {
          delta((u << 8) | b) = t
          fail(t) = delta((fail(u) << 8) | b)
          queue += t
        }
        b += 1
      }
    }
    // CSR outputs with pattern lengths
    val lens = pats.map(_.length)
    val outOff = new Array[Int](nNodes + 1)
    var i = 0
    while (i < nNodes) { outOff(i + 1) = outOff(i) + outSets(i).size; i += 1 }
    val outPat = new Array[Int](outOff(nNodes))
    val outLen = new Array[Int](outOff(nNodes))
    i = 0
    while (i < nNodes) {
      var o = outOff(i)
      outSets(i).foreach { p => outPat(o) = p; outLen(o) = lens(p); o += 1 }
      i += 1
    }
    new AhoCorasick(delta, outOff, outPat, outLen, pats.size)
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The committed subword vocabulary for [[BpeTokenCount]] — a greedy
  * longest-match (WordPiece-style) tokenizer's merge table, fixed in
  * source so the Spark expression, the ScalaTest parity checks, and
  * the DuckDB oracle (which re-derives counts from this same list via
  * a recursive CTE) are provably in lockstep. Deterministic by
  * construction: no RNG, no training step at runtime.
  *
  * Composition: a layer of whole common words (longest-match makes
  * these win outright), a layer of frequent English merges (so
  * out-of-vocabulary words decompose into multi-char units, not
  * letters — e.g. `customer` → `c·us·t·om·er`), and all of
  * `[a-z0-9]` as single-character units, which makes the tokenizer
  * TOTAL over the word alphabet (the unknown-byte fallback below can
  * only fire if a letter were removed from this list). */
object BpeVocab {
  val Entries: Seq[String] = Seq(
    // whole words
    "the", "and", "data", "table", "scan", "sort", "hash", "join",
    "key", "row", "agg", "part", "line", "value", "query", "fast",
    "slow", "small", "big",
    // merges
    "er", "in", "on", "an", "re", "at", "or", "st", "ar", "al",
    "ow", "le", "ue", "ta", "om", "us", "qu", "ry", "up", "ing",
    "ion", "ter", "der", "ind", "ol", "um", "ec", "ge", "gr", "sp",
    "ba", "me", "wi", "fi", "ve", "co", "du") ++
    ('a' to 'z').map(_.toString) ++ ('0' to '9').map(_.toString)

  // ---- byte trie over the 36-letter word alphabet ([a-z0-9], with
  // ---- A-Z folding to a-z at probe time) — longest-match is one
  // ---- walk per emitted token, zero allocation per row
  private final class Node {
    val next = new Array[Node](36)
    var terminal = false
  }

  /** Alphabet index of a byte (ASCII-lowercasing A-Z), or -1. */
  private def idx(b: Int): Int =
    if (b >= 'a' && b <= 'z') b - 'a'
    else if (b >= 'A' && b <= 'Z') b - 'A'
    else if (b >= '0' && b <= '9') 26 + (b - '0')
    else -1

  private val root: Node = {
    val r = new Node
    Entries.foreach { e =>
      var n = r
      e.foreach { c =>
        val j = idx(c)
        require(j >= 0, s"BpeVocab entry '$e' outside [a-z0-9]")
        if (n.next(j) == null) n.next(j) = new Node
        n = n.next(j)
      }
      n.terminal = true
    }
    r
  }

  /** Length of the longest vocabulary entry that is a prefix of
    * `bytes[from, end)` (case-folded), or 0 if none. */
  def longestMatch(bytes: Array[Byte], from: Int, end: Int): Int = {
    var n = root
    var i = from
    var best = 0
    while (i < end) {
      val j = idx(bytes(i) & 0xff)
      if (j < 0) return best
      n = n.next(j)
      if (n == null) return best
      i += 1
      if (n.terminal) best = i - from
    }
    best
  }

  /** Receiver for [[scanWords]] — primitive arguments so the shared
    * scan stays allocation-free (a Function3 would box per word). */
  trait WordSink {
    /** One maximal `[a-zA-Z0-9]+` run: `bytes[start, end)` counting
      * `tokens` greedy vocabulary tokens. */
    def word(bytes: Array[Byte], start: Int, end: Int, tokens: Long): Unit
  }

  /** THE word-boundary + trie-count scan both expressions share: find
    * each maximal `[a-zA-Z0-9]+` run of `bytes`, greedily count its
    * vocabulary tokens (longest-match walk, unknown byte = one token),
    * and hand (start, end, count) to `sink`. Keeping this loop in one
    * place is what makes `bpe_token_count(chunk) = Σ word counts`
    * un-breakable: counter and chunker cannot drift. */
  def scanWords(bytes: Array[Byte], sink: WordSink): Unit = {
    var i = 0
    val len = bytes.length
    while (i < len) {
      val b = bytes(i)
      val alnum = (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
        (b >= '0' && b <= '9')
      if (alnum) {
        var e = i
        var go = true
        while (go && e < len) {
          val c = bytes(e)
          if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
              (c >= '0' && c <= '9')) e += 1
          else go = false
        }
        var t = 0L
        var p = i
        while (p < e) {
          val m = longestMatch(bytes, p, e)
          p += (if (m == 0) 1 else m)
          t += 1
        }
        sink.word(bytes, i, e, t)
        i = e
      } else i += 1
    }
  }

  /** Greedy tokenization of one word — the reference semantics the
    * expression's byte scan implements, used by TextSpec for parity
    * and available to callers that want the token strings. */
  def tokenizeWord(word: String): Seq[String] = {
    val bytes = word.getBytes("UTF-8")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = 0
    while (p < bytes.length) {
      val m = longestMatch(bytes, p, bytes.length)
      val step = if (m == 0) 1 else m
      out += new String(bytes, p, step, "UTF-8").toLowerCase(java.util.Locale.ROOT)
      p += step
    }
    out.toSeq
  }
}

/** `bpe_token_count(text)` → BIGINT: the number of subword tokens a
  * greedy longest-match tokenizer over [[BpeVocab]] emits for `text`
  * — the REAL token accounting for budget-driven shard packing
  * (q84), replacing the Σ⌈len/4⌉ estimator (q46) when exact budgets
  * matter.
  *
  * Semantics, kept in lockstep with the DuckDB oracle's recursive
  * CTE: words are maximal `[a-zA-Z0-9]+` runs, ASCII-lowercased —
  * exactly [[WordTokens]]'s split discipline (`lower` +
  * `[^a-z0-9]+`), so token counts compose with every other member of
  * the text family. Within a word, repeatedly emit the longest
  * vocabulary entry prefixing the remainder; a position matching no
  * entry emits one unknown token and advances one byte (unreachable
  * while the vocab contains all of [a-z0-9], but the totality
  * guarantee must not depend on the vocab's content).
  *
  * One byte scan, zero per-row allocation (the trie walk IS the
  * match), CodegenFallback like the rest of the text family — the
  * whole-stage-codegen boundary costs one virtual call per row while
  * the scan itself stays tight. */
case class BpeTokenCount(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count needs STRING input, got ${other.catalogString}")
  }

  // one mutable sink per expression copy (tasks deserialize their
  // own), reset per row — the scan itself lives in
  // BpeVocab.scanWords, shared with BpeChunks
  private final class CountSink extends BpeVocab.WordSink {
    var count = 0L
    override def word(bytes: Array[Byte], start: Int, end: Int, tokens: Long): Unit =
      count += tokens
  }
  @transient private lazy val sink = new CountSink

  override protected def nullSafeEval(input: Any): Any = {
    sink.count = 0L
    BpeVocab.scanWords(input.asInstanceOf[UTF8String].getBytes, sink)
    sink.count
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
  override def prettyName: String = "bpe_token_count"
}

object BpeTokenCount {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bpe_token_count"),
    new ExpressionInfo(classOf[BpeTokenCount].getName, "bpe_token_count"),
    (children: Seq[Expression]) => BpeTokenCount(children.head))
}

/** `bpe_chunks(text, budget)` → ARRAY<STRING>: the document split into
  * maximal pieces of at most `budget` subword tokens ([[BpeVocab]]
  * counting, word granularity) — the context-window-sized chunking a
  * training pipeline runs between token counting (q84) and packing:
  * documents longer than the model's window must be cut, and cutting
  * mid-word wastes tokens, so the greedy rule is "add whole words
  * until the next word would overflow, then start a new chunk".
  *
  * Semantics (lockstep with the DuckDB oracle's recursive
  * accumulate): words are the [[WordTokens]] discipline (maximal
  * `[a-zA-Z0-9]+` runs, ASCII-lowered); chunk text is its words
  * joined by single spaces, so `bpe_token_count(chunk)` = the sum of
  * its words' counts by construction. A single word over budget gets
  * its own chunk (never split — the oracle's base case likewise). No
  * words → empty array.
  *
  * One byte scan; the per-word token count is the same trie walk the
  * counter uses, so chunking costs one extra output buffer over
  * counting. */
case class BpeChunks(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != StringType)
      return TypeCheckResult.TypeCheckFailure(
        s"bpe_chunks needs STRING text, got ${left.dataType.catalogString}")
    if (!right.foldable || right.dataType != org.apache.spark.sql.types.IntegerType ||
        right.eval() == null || right.eval().asInstanceOf[Int] < 1)
      return TypeCheckResult.TypeCheckFailure(
        s"bpe_chunks budget must be a foldable positive INT, got ${right.sql}")
    TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val budget: Int = right.eval().asInstanceOf[Int]

  // greedy whole-word packer fed by the SAME scan the counter uses
  // (BpeVocab.scanWords) — per-word token counts cannot drift between
  // counting and chunking
  private final class ChunkSink extends BpeVocab.WordSink {
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Any]
    val cur = new java.io.ByteArrayOutputStream()
    var curTokens = 0L
    var maxTokens = 0
    def reset(b: Int): Unit = { chunks.clear(); cur.reset(); curTokens = 0L; maxTokens = b }
    def emit(): Unit = {
      if (curTokens > 0) {
        chunks += UTF8String.fromBytes(cur.toByteArray)
        cur.reset()
        curTokens = 0L
      }
    }
    override def word(bytes: Array[Byte], start: Int, end: Int, tokens: Long): Unit = {
      if (curTokens > 0 && curTokens + tokens > maxTokens) emit()
      if (curTokens > 0) cur.write(' ')
      var j = start
      while (j < end) {
        val c = bytes(j)
        cur.write(if (c >= 'A' && c <= 'Z') c + 32 else c)
        j += 1
      }
      curTokens += tokens
    }
  }
  @transient private lazy val sink = new ChunkSink

  override protected def nullSafeEval(textAny: Any, budgetAny: Any): Any = {
    sink.reset(budget)
    BpeVocab.scanWords(textAny.asInstanceOf[UTF8String].getBytes, sink)
    sink.emit()
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sink.chunks.toArray)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeChunks =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "bpe_chunks"
}

object BpeChunks {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bpe_chunks"),
    new ExpressionInfo(classOf[BpeChunks].getName, "bpe_chunks"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "bpe_chunks(text, budget) takes exactly 2 arguments")
      BpeChunks(children.head, children(1))
    })
}

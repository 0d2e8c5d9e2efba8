package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Distinct word n-gram shingles of a text column, in one pass — the
  * native replacement for the lambda formulation
  *
  *   array_distinct(transform(sequence(1, size(w) − (n−1)),
  *     i => concat_ws(" ", slice(w, i, n))))            // w = words(text)
  *
  * which is QUADRATIC in document length: higher-order functions are
  * interpreted, and the lambda body embeds the whole
  * `split(lower(trim(text)))` subtree, so every shingle re-tokenizes the
  * full document — O(tokens × doc_bytes) per row. Invisible on 50-word
  * rows; a 200k-token web document spends minutes in `Lower.nullSafeEval`
  * (caught by the q148 bytes-read spec fixture). Here the tokenize runs
  * once and each shingle is O(n): O(doc_bytes + tokens·n) per row.
  *
  * Exact semantic twin of the old expression (pinned in DedupSpec):
  * words = array_remove(split(lower(trim(text)), "\\s+"), "") via the
  * SAME UTF8String trim/toLowerCase/split kernels Spark's functions
  * call; < n words (including empty/null text) → one shingle of all
  * words space-joined; ≥ n → full windows only, first-occurrence
  * distinct. Null input yields array("") like the old when/otherwise
  * (so the expression is never null). Interpreted eval (CodegenFallback)
  * — no worse than the higher-order functions it replaces, and one call
  * per ROW instead of one lambda per shingle.
  */
case class ShingleArray(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ShingleArray needs a string argument, got $t")
    }

  private val space = UTF8String.fromString(" ")
  private val wsPattern = UTF8String.fromString("\\s+")
  private val empty = UTF8String.fromString("")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(Array[Any](empty))
    val words0 = v.asInstanceOf[UTF8String]
      .trim().toLowerCase().split(wsPattern, -1)
    val words = words0.filter(_.numChars() > 0)
    if (words.length < n)
      return new GenericArrayData(
        Array[Any](UTF8String.concatWs(space, words: _*)))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i + n <= words.length) {
      val win = new Array[UTF8String](n)
      System.arraycopy(words, i, win, 0, n)
      seen.add(UTF8String.concatWs(space, win: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray().asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleArray {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def shingle_array(text: Column, n: Int): Column =
    column(ShingleArray(expression(text), n))
}

/** Consecutive `chunkWords`-word chunks of a text column (the
  * [[graft.ops.Dedup.dropDuplicateChunks]] segmentation), one pass —
  * the same quadratic-lambda replacement as [[ShingleArray]] (the old
  * `transform(sequence, i => slice(words(text), i·cw+1, cw))` re-ran
  * the tokenizer per chunk). Last chunk may be partial; a tokenless
  * document yields one empty chunk (the lambda form emitted a
  * `sequence(0, −1)` = [0, −1] artifact pair of empty chunks there —
  * deliberately normalized, pinned in DedupSpec); NULL text stays NULL
  * (posexplode then emits no rows, as before).
  */
case class WordChunks(child: Expression, chunkWords: Int)
    extends UnaryExpression with CodegenFallback {

  require(chunkWords >= 1, s"chunk width must be >= 1, got $chunkWords")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"WordChunks needs a string argument, got $t")
    }

  private val space = UTF8String.fromString(" ")
  private val wsPattern = UTF8String.fromString("\\s+")
  private val empty = UTF8String.fromString("")

  override def nullSafeEval(v: Any): Any = {
    val words = v.asInstanceOf[UTF8String]
      .trim().toLowerCase().split(wsPattern, -1)
      .filter(_.numChars() > 0)
    if (words.isEmpty) return new GenericArrayData(Array[Any](empty))
    val m = (words.length + chunkWords - 1) / chunkWords
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val from = i * chunkWords
      val win = java.util.Arrays.copyOfRange(
        words, from, math.min(from + chunkWords, words.length))
      out(i) = UTF8String.concatWs(space, win: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordChunks {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def word_chunks(text: Column, chunkWords: Int): Column =
    column(WordChunks(expression(text), chunkWords))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword segmentation — WordPiece-style tokenizer
  * INFERENCE as a native codegen expression.
  *
  * `greedy_piece_count(word, vocab)` returns how many pieces the word
  * splits into under the rule every production WordPiece encoder uses:
  * at each position consume the LONGEST vocabulary piece that matches,
  * falling back to a single character when none does (single characters
  * are implicitly in-vocabulary — the fallback, not a lookup). The
  * segmentation is total (always advances ≥1 char), lossless by
  * construction (pieces concatenate back to the word), and deterministic
  * (the longest match at a position is unique).
  *
  * Scale shape: the expression runs over the distinct-WORD dictionary,
  * not the corpus — the corpus sees only a broadcast (word → piece
  * count) join, exactly the tx29 BPE-encode posture. The vocabulary
  * rides the plan as a bounded literal array (the BPE merge-table
  * artifact posture); per-vocab parsing into a hash set is memoized so
  * a dictionary of n words probes hash lookups, not array scans.
  */
case class GreedyPieceCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def prettyName: String = "greedy_piece_count"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, ArrayType(StringType, _)) =>
        // the parse memo keys on the ArrayData instance; a non-foldable
        // vocab would hand it mutable row-buffer views (silently wrong
        // segmentations) — the vocabulary is an index artifact, not data
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a FOLDABLE vocabulary (a literal array " +
            "artifact), not a per-row column")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, array<string>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(word: Any, vocab: Any): Any =
    GreedySegment.pieceCount(word.asInstanceOf[UTF8String],
      vocab.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (w, v) => s"graft.functions.GreedySegment.pieceCount($w, $v)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GreedyPieceCount =
    copy(left = newLeft, right = newRight)
}

/** [[GreedyPieceCount]]'s round-trip twin: the total CODE-POINT length
  * of the word's greedy segmentation — Σ |piece| over the SAME walk. By
  * construction (the walk always advances and every piece is a slice of
  * the word) this equals the word's own code-point length; emitting it
  * through the real segmentation is what gives the tx34 round-trip
  * certificate teeth: a walk that skipped or double-consumed characters
  * would break the equality, and the oracle sums RAW token lengths with
  * no segmentation machinery at all. */
case class GreedyDecodedLen(left: Expression, right: Expression)
  extends BinaryExpression {

  override def prettyName: String = "greedy_decoded_len"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, ArrayType(StringType, _)) =>
        // same foldable-vocab precondition as greedy_piece_count: the
        // parse memo keys on the ArrayData instance
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a FOLDABLE vocabulary (a literal array " +
            "artifact), not a per-row column")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, array<string>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(word: Any, vocab: Any): Any =
    GreedySegment.decodedLen(word.asInstanceOf[UTF8String],
      vocab.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (w, v) => s"graft.functions.GreedySegment.decodedLen($w, $v)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GreedyDecodedLen =
    copy(left = newLeft, right = newRight)
}

object GreedySegment {

  def pieceCountCol(word: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(GreedyPieceCount(
      ColumnBridge.expression(word),
      Literal.create(vocab, ArrayType(StringType))))

  def decodedLenCol(word: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(GreedyDecodedLen(
      ColumnBridge.expression(word),
      Literal.create(vocab, ArrayType(StringType))))

  /** Vocab parse memo: one literal array instance per plan, probed per
    * row — parse once. Each task deserializes its own codegen-reference
    * copy of the literal, so the map sees several content-equal (or
    * representation-heterogeneous) keys per vocabulary and must stay
    * bounded. The hot-path get is a plain lock-free ConcurrentHashMap
    * probe — an access-ordered LinkedHashMap would turn every get into
    * a structural write under one global monitor, serializing all
    * executor threads on the codegen hot path — with LRU order kept
    * SEPARATELY as a per-entry logical access stamp (one lazySet per
    * get). Eviction is a rare sweep on insert overflow: drop the
    * lowest-stamped entries back to the budget, keeping hot
    * vocabularies resident. */
  private val MaxVocabs = 64
  private val accessClock = new java.util.concurrent.atomic.AtomicLong(0L)
  private final class Entry(val set: java.util.HashSet[String], val maxLen: Int) {
    val stamp = new java.util.concurrent.atomic.AtomicLong(accessClock.incrementAndGet())
  }
  private val parsed =
    new java.util.concurrent.ConcurrentHashMap[ArrayData, Entry]()

  private def vocabSet(vocab: ArrayData): (java.util.HashSet[String], Int) = {
    var hit = parsed.get(vocab)
    if (hit == null) {
      val set = new java.util.HashSet[String]()
      var maxLen = 1
      var i = 0
      while (i < vocab.numElements()) {
        val p = vocab.getUTF8String(i).toString
        set.add(p)
        val cp = p.codePointCount(0, p.length) // code points, like the walk
        if (cp > maxLen) maxLen = cp
        i += 1
      }
      hit = new Entry(set, maxLen)
      val prev = parsed.putIfAbsent(vocab, hit)
      if (prev != null) hit = prev
      // EVERY inserting thread checks the budget (not just the
      // putIfAbsent winner): concurrent losers could otherwise each race
      // past a single winner-side check and leave the map above the cap
      // until the next overflowing insert. evictCold recomputes the
      // overshoot under its lock, so concurrent calls never over-evict.
      if (parsed.size() > MaxVocabs) evictCold()
    } else hit.stamp.lazySet(accessClock.incrementAndGet())
    (hit.set, hit.maxLen)
  }

  /** Drop the least-recently-stamped entries back to the budget. Runs
    * only when an insert overflows the cap (vocabularies are artifacts,
    * not per-row data — overflow is rare), under a lock so concurrent
    * overflowing inserts don't sweep twice; gets stay lock-free
    * throughout. */
  private def evictCold(): Unit = parsed.synchronized {
    val over = parsed.size() - MaxVocabs
    if (over > 0) {
      val it = parsed.entrySet().iterator()
      val all = new java.util.ArrayList[(Long, ArrayData)]()
      while (it.hasNext) { val e = it.next(); all.add((e.getValue.stamp.get(), e.getKey)) }
      all.sort((a, b) => java.lang.Long.compare(a._1, b._1))
      var i = 0
      while (i < over && i < all.size()) { parsed.remove(all.get(i)._2); i += 1 }
    }
  }

  /** Number of greedy longest-match pieces (called from codegen). */
  def pieceCount(word: UTF8String, vocab: ArrayData): Long =
    segment(word.toString, vocab).length.toLong

  /** Total code-point length of the greedy segmentation (called from
    * codegen) — the decode side of the tx34 round-trip certificate. */
  def decodedLen(word: UTF8String, vocab: ArrayData): Long = {
    val pieces = segment(word.toString, vocab)
    var i = 0
    var n = 0L
    while (i < pieces.length) {
      n += pieces(i).codePointCount(0, pieces(i).length)
      i += 1
    }
    n
  }

  /** The segmentation itself — spec/debug surface; the catalog path only
    * ships counts. */
  def segment(word: String, vocab: ArrayData): Array[String] = {
    val (set, maxLen) = vocabSet(vocab)
    segmentWith(word, set, maxLen)
  }

  /** Greedy walk over CODE POINTS, not UTF-16 code units — Spark's
    * `substring`/`length` (vocab fit) and DuckDB's `substr` (oracle
    * replay) both count code points, so the matcher must too or a
    * non-BMP character (astral-plane CJK, emoji) would misalign the
    * piece boundaries between the three implementations. */
  def segmentWith(word: String, vocab: java.util.HashSet[String],
                  maxLen: Int): Array[String] = {
    val cps = word.codePoints().toArray
    def slice(from: Int, until: Int): String =
      new String(cps, from, until - from)
    val out = Array.newBuilder[String]
    var i = 0
    val n = cps.length
    while (i < n) {
      var l = math.min(maxLen, n - i)
      var adv = 1
      var found = false
      while (!found && l >= 2) {
        if (vocab.contains(slice(i, i + l))) { adv = l; found = true }
        l -= 1
      }
      out += slice(i, i + adv)
      i += adv
    }
    out.result()
  }

  /** Spec helper: segment against a plain Seq vocab. */
  def segmentSeq(word: String, vocab: Seq[String]): Seq[String] = {
    val arr = new GenericArrayData(
      vocab.map(UTF8String.fromString).toArray[Any])
    segment(word, arr).toSeq
  }
}

/* Lives under org.apache.spark.sql because Catalyst's expression SPI
 * (AbstractDataType, ExpectsInputTypes) is private[sql] — the standard
 * packaging for third-party native expressions. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static call target for generated code ([[NfcNormalize.doGenCode]]):
  * Scala objects compile with static forwarders, so the generated Java
  * can invoke `TextNormStatics.nfc(...)` directly. */
object TextNormStatics {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // Fast path: Normalizer.isNormalized is a cheap scan and true for
    // all-ASCII text, skipping the allocate-and-rebuild entirely — at
    // corpus scale most documents are already NFC.
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Codegen'd Unicode NFC normalization (canonical composition) — the
  * first step of a training-corpus text-normalization pipeline: "é" as
  * U+0065 U+0301 (decomposed) and U+00E9 (precomposed) must fingerprint
  * identically or exact-dedup silently misses visually identical
  * documents. Oracle-replicable: DuckDB's `nfc_normalize(s)` implements
  * the same Unicode canonical composition. Null in → null out. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(s: Any): Any =
    TextNormStatics.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"org.apache.spark.sql.graft.TextNormStatics.nfc($s)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Static call targets for [[SubwordCount]]/[[PunctCount]]: one
  * straight-line UTF-8 byte walk per row, replacing the regex engine.
  * Multi-byte codepoints are skipped via their lead byte (continuation
  * bytes never re-enter the loop), counting one piece per CODEPOINT —
  * the same unit java.util.regex and RE2 character classes match on, so
  * parity with the regex formulations is exact. */
object TextCountStatics {
  /** Matches of `[A-Za-z0-9]+|[^A-Za-z0-9 ]` (TextStats.SubwordPattern):
    * each ASCII-alphanumeric run counts once, every other non-space
    * codepoint counts by itself. */
  def subwords(s: UTF8String): Int = {
    val n = s.numBytes; var i = 0; var count = 0; var inRun = false
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 0) { // ASCII
        val alnum = (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
          (b >= '0' && b <= '9')
        if (alnum) { if (!inRun) { count += 1; inRun = true } }
        else { inRun = false; if (b != ' ') count += 1 }
        i += 1
      } else {
        inRun = false; count += 1
        i += UTF8String.numBytesForFirstByte(b)
      }
    }
    count
  }

  /** Codepoints matching `[^a-z0-9 ]` — the numerator of
    * TextStats.punctRatio's regex_replace formulation (which lowercases
    * first, hence no A-Z arm). */
  def punct(s: UTF8String): Int = {
    val n = s.numBytes; var i = 0; var count = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 0) {
        val keep = (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || b == ' '
        if (!keep) count += 1
        i += 1
      } else {
        count += 1
        i += UTF8String.numBytesForFirstByte(b)
      }
    }
    count
  }
}

/** Codegen'd subword count — `regexp_count(text, SubwordPattern)`
  * semantics at byte-walk speed (the regex NFA was q46's whole cost;
  * the suite's most data-linear query is exactly the one that should
  * run at scan speed). Null in → null out. */
case class SubwordCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "subword_count"
  override protected def nullSafeEval(s: Any): Any =
    TextCountStatics.subwords(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"org.apache.spark.sql.graft.TextCountStatics.subwords($s)")
  override protected def withNewChildInternal(newChild: Expression): SubwordCount =
    copy(child = newChild)
}

/** Codegen'd count of codepoints outside `[a-z0-9 ]` — the punct-ratio
  * numerator without materializing a stripped copy of the string. */
case class PunctCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "punct_count"
  override protected def nullSafeEval(s: Any): Any =
    TextCountStatics.punct(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"org.apache.spark.sql.graft.TextCountStatics.punct($s)")
  override protected def withNewChildInternal(newChild: Expression): PunctCount =
    copy(child = newChild)
}

/** Static call target for [[MinhashSig.doGenCode]]. Bit-identical to the
  * column pipeline `minhashFromHashes(hashedShingles(text, n), numPerm)`
  * (graft.dedup.Dedup) and to the aggregate shape `withMinhashSignature`
  * — pinned by DedupSpec — but one straight-line JVM pass per row:
  *
  * A shingle (n consecutive words joined by single spaces) of a text
  * split on `" "` is EXACTLY a byte range of the original UTF-8 text
  * (0x20 never occurs inside a multi-byte UTF-8 sequence, and joining
  * split words with single spaces reconstructs the original bytes, empty
  * words included), so each shingle hashes with one `md5(bytes, from,
  * len)` — no string materialization, no per-permutation re-evaluation.
  * The interpreted higher-order-lambda column form re-evaluates its
  * lambdas element-by-element outside whole-stage codegen and measured
  * 10-50x slower per row (SCALE.md). */
object MinhashStatics {
  /** Modulus of the universal-hash permutation family —
    * same constant as `graft.dedup.Dedup.Prime`. */
  final val Prime = 4294967311L

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** MinHash signature of `text`: `numPerm` permutations
    * `(2i+1)*h + 7919i+1 mod P` minimized over the 32-bit md5-prefix
    * hashes of all word `n`-gram shingles (duplicate shingles cannot
    * change a min, so no dedup pass is needed). */
  def sig(text: UTF8String, n: Int, numPerm: Int): ArrayData = {
    val bytes = text.getBytes
    // word start offsets: a split(" ") word k>0 starts after the k-th
    // space byte; starts(w) is a virtual space past the last word
    var spaces = 0
    var p = 0
    while (p < bytes.length) { if (bytes(p) == ' ') spaces += 1; p += 1 }
    val w = spaces + 1
    val starts = new Array[Int](w + 1)
    var k = 1
    p = 0
    while (p < bytes.length) {
      if (bytes(p) == ' ') { starts(k) = p + 1; k += 1 }
      p += 1
    }
    starts(w) = bytes.length + 1
    val out = new Array[Long](numPerm)
    java.util.Arrays.fill(out, Long.MaxValue)
    val md = digests.get()
    // start positions 0..max(w-n, 0) inclusive — the column pipeline's
    // sequence(0, greatest(size(words)-n, 0)); a tail shorter than n
    // words (or w < n entirely) still yields its joined-words shingle
    val nStarts = math.max(w - n, 0) + 1
    var i = 0
    while (i < nStarts) {
      val from = starts(i)
      val to = starts(math.min(i + n, w)) - 1
      md.reset()
      md.update(bytes, from, to - from)
      val d = md.digest()
      // h32: first 8 md5 hex digits = first 4 digest bytes, unsigned
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var q = 0
      while (q < numPerm) {
        val v = ((2L * q + 1) * h + 7919L * q + 1) % Prime
        if (v < out(q)) out(q) = v
        q += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Greedy longest-match subword matcher over a fixed piece vocabulary —
  * the apply half of WordPiece-style tokenization (Wu et al. 2016; the
  * greedy encode of Sennrich et al. 2016's learned-subword scheme). One
  * instance is built per plan from the (small) vocabulary and shipped to
  * executors inside the expression, like a tokenizer file rides a model.
  *
  * Matching: within each space-split word, at each position take the
  * LONGEST vocab piece that prefixes the remainder; a position no piece
  * covers counts one UNK piece and advances one char (cannot happen when
  * the vocab contains every corpus character, as
  * [[graft.text.Selection.subwordVocab]] guarantees). Positions are
  * UTF-16 code units; for BMP text this equals codepoints, which is what
  * the DuckDB oracle's `substr`/`len` count. Pieces never span the space
  * separator, matching the per-word oracle recursion. */
final class SubwordEncoder(vocab: Seq[String]) extends Serializable {
  private val pieces: Array[String] = vocab.toArray
  @transient private lazy val maxLen: Int =
    if (pieces.isEmpty) 0 else pieces.iterator.map(_.length).max
  @transient private lazy val byLen: Array[java.util.HashSet[String]] = {
    val sets = new Array[java.util.HashSet[String]](maxLen + 1)
    pieces.foreach { p =>
      if (p.nonEmpty) {
        if (sets(p.length) == null) sets(p.length) = new java.util.HashSet[String]()
        sets(p.length).add(p)
      }
    }
    sets
  }

  /** Total greedy piece count over all space-split words of `text`.
    * Empty words (consecutive spaces) contribute zero pieces. */
  def pieceCount(text: UTF8String): Long = {
    val s = text.toString
    val n = s.length
    var total = 0L
    var i = 0
    while (i < n) {
      if (s.charAt(i) == ' ') i += 1
      else {
        var j = i
        while (j < n && s.charAt(j) != ' ') j += 1
        var p = i
        while (p < j) {
          var len = math.min(maxLen, j - p)
          var matched = 0
          while (len >= 1 && matched == 0) {
            if (byLen(len) != null && byLen(len).contains(s.substring(p, p + len)))
              matched = len
            len -= 1
          }
          total += 1
          p += (if (matched == 0) 1 else matched)
        }
        i = j
      }
    }
    total
  }
}

/** Codegen'd `subword_piece_count(text, vocab)` — total greedy
  * longest-match pieces of all words of `text` under the piece
  * `vocab` (a foldable string-array literal: the vocabulary is a plan
  * constant, like a tokenizer file). One scan-fused pass per row — the
  * per-doc piece count costs zero shuffles regardless of how often
  * words repeat (the join-back-per-distinct-word shape the oracle uses
  * would shuffle the corpus token stream). Null in → null out. */
case class SubwordPieces(child: Expression, vocab: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "subword_piece_count"

  @transient private lazy val encoder = new SubwordEncoder(vocab)

  override protected def nullSafeEval(s: Any): Any =
    encoder.pieceCount(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("subwordEnc", encoder,
      classOf[SubwordEncoder].getName)
    defineCodeGen(ctx, ev, s => s"$ref.pieceCount($s)")
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordPieces =
    copy(child = newChild)
}

/** Codegen'd MinHash signature `minhash_sig(text, n, numPerm)` — the
  * hot-path form of the dedup family's signature for projections where
  * the aggregate shape cannot go (a streaming stateless projection before
  * a stateful op; any single-pass scoring scan). Values are bit-identical
  * to `Dedup.withMinhashSignature` (spec-pinned), so batch and streaming
  * passes agree on every signature and the DuckDB oracle replays both.
  * Null in → null out. */
case class MinhashSig(child: Expression, n: Int, numPerm: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  require(numPerm >= 1, s"numPerm must be >= 1, got $numPerm")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(s: Any): Any =
    MinhashStatics.sig(s.asInstanceOf[UTF8String], n, numPerm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"org.apache.spark.sql.graft.MinhashStatics.sig($s, $n, $numPerm)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

/** Static call target for [[WinnowSelect]]: the whole winnowing kernel
  * — tokenize, k-gram h60 hashes over byte ranges, sliding rightmost-
  * min selection with a monotonic deque, adjacent-run dedup — as ONE
  * compiled O(tokens) pass per row. The Column-DSL formulation of the
  * same algorithm (transform + slice/array_min/reverse/array_position
  * lambdas) runs through Catalyst's INTERPRETED higher-order-function
  * path, where every lambda occurrence of a subexpression re-evaluates
  * it per element with ArrayData allocations — measured 5-20x slower
  * on q134 depending on how many times the window slice appears in the
  * expression tree. */
object WinnowStatics {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Deduped winnowing selection of `text`: array of (pos, fp) structs,
    * pos = 0-based k-gram index selected by some window (rightmost
    * minimal h60 of each w-window), fp = that k-gram's h60 — one entry
    * per contiguous selection run (exactly the distinct selected set;
    * equal selections are provably adjacent, see
    * graft.text.Winnowing.fingerprints). Bit-identical to the Column
    * formulation `h60(concat_ws(" ", slice(split(text," "), i+1, k)))`:
    * k-grams are hashed over byte ranges of the original UTF-8 text
    * (words joined by single spaces reproduce the source bytes), h60 =
    * first 15 md5 hex digits as a signed-positive long. Short docs
    * (< k tokens) hash their whole token run; < w+k−1 tokens means one
    * window over what exists — every doc yields >= 1 entry. */
  def select(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    // word start offsets (split(" ") semantics: empty words kept)
    var spaces = 0
    var p = 0
    while (p < bytes.length) { if (bytes(p) == ' ') spaces += 1; p += 1 }
    val wc = spaces + 1
    val starts = new Array[Int](wc + 1)
    var idx = 1
    p = 0
    while (p < bytes.length) {
      if (bytes(p) == ' ') { starts(idx) = p + 1; idx += 1 }
      p += 1
    }
    starts(wc) = bytes.length + 1
    // k-gram h60 hashes, positions 0..max(wc-k, 0)
    val nGrams = math.max(wc - k, 0) + 1
    val hs = new Array[Long](nGrams)
    val md = digests.get()
    var i = 0
    while (i < nGrams) {
      val from = starts(i)
      val to = starts(math.min(i + k, wc)) - 1
      md.reset()
      md.update(bytes, from, to - from)
      val d = md.digest()
      // h60: first 15 md5 hex digits = top 60 bits of the digest
      hs(i) = ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) |
        ((d(2) & 0xffL) << 36) | ((d(3) & 0xffL) << 28) |
        ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
        ((d(6) & 0xffL) << 4) | ((d(7) & 0xf0L) >>> 4)
      i += 1
    }
    // sliding windows j = 0..max(nGrams-w, 0), each selecting its
    // RIGHTMOST minimal hash; monotonic deque keeps values strictly
    // increasing (>= popped on push), so the front is automatically the
    // latest index among equal minima — the rightmost-min in O(1)
    // amortized per window
    val nWin = math.max(nGrams - w, 0) + 1
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0
    val poss = new Array[Long](nWin)
    val fps = new Array[Long](nWin)
    var emitted = 0
    var lastPos = -1
    var next = 0
    var j = 0
    while (j < nWin) {
      val windowEnd = math.min(j + w - 1, nGrams - 1)
      while (next <= windowEnd) {
        val v = hs(next)
        while (tail > head && hs(deque(tail - 1)) >= v) tail -= 1
        deque(tail) = next
        tail += 1
        next += 1
      }
      while (deque(head) < j) head += 1
      val sel = deque(head)
      if (sel != lastPos) { // adjacent-run dedup = exact distinct
        poss(emitted) = sel.toLong
        fps(emitted) = hs(sel)
        emitted += 1
        lastPos = sel
      }
      j += 1
    }
    val rows = new Array[Any](emitted)
    var e = 0
    while (e < emitted) {
      rows(e) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](poss(e), fps(e)))
      e += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }
}

/** Codegen'd `winnow_select(text, k, w)` — the deduped winnowing
  * fingerprint selection (Schleimer/Wilkerson/Aiken 2003) of a document
  * in one scan-fused pass: array<struct<pos:long, fp:long>>. See
  * [[WinnowStatics.select]] for semantics and the equivalence contract
  * with the Column formulation (CorpusOpsSpec pins both against an
  * independent JVM replay). Null in → null out. */
case class WinnowSelect(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1 && w >= 1, s"need k >= 1 and w >= 1, got k=$k w=$w")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pos", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("fp", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "winnow_select"

  override protected def nullSafeEval(s: Any): Any =
    WinnowStatics.select(s.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"org.apache.spark.sql.graft.WinnowStatics.select($s, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
}

/** Determinism-opaque passthrough: evaluates exactly its child, but
  * reports `deterministic = false` so the optimizer will not substitute
  * it past a Project (PushPredicateThroughProject / CollapseProject).
  * The JVM twin of the guide's "mark expensive UDFs non-deterministic"
  * remedy (§4.4): editVerifiedPairs' bounded-Levenshtein column was
  * inlined into the downstream filters and pushed into the text-attach
  * JOIN CONDITION — evaluated up to 3× per candidate pair, inside an
  * AQE-coalesced single-task stage BELOW the verify repartition (16×
  * q130: 12 s serial — OPTIMIZATION_r17.md). Wrapped, the DP stays in
  * its own projection, above the repartition, computed once per pair.
  * Values and nullability are the child's; only optimizer moves are
  * disabled, so results are bit-identical. */
/** Static call target for [[ShingleGen]]: all word n-gram shingles of a
  * text in ONE pass over its UTF-8 bytes, each shingle a ZERO-COPY view
  * (`UTF8String.fromBytes(bytes, from, len)`) of the original byte
  * array. Bit-identical to the Column form
  * `transform(sequence(0, greatest(size(words)-n, 0)), i =>
  * concat_ws(" ", slice(words, i+1, n)))` with `words = split(text, " ")`:
  * `split(" ")` keeps empty words, so word starts are exactly the
  * positions after each 0x20 byte, and k consecutive words joined by
  * single spaces reproduce the source byte range verbatim (the
  * [[WinnowStatics]] byte-range argument; UTF-8 continuation bytes
  * cannot alias 0x20). Short texts (< n words) yield their whole word
  * run as the single shingle, matching `slice`'s clamping. The Column
  * form allocates a word array, two array slices and a joined string
  * per shingle; this kernel allocates only the view headers. */
object ShingleStatics {
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    var spaces = 0
    var p = 0
    while (p < bytes.length) { if (bytes(p) == ' ') spaces += 1; p += 1 }
    val wc = spaces + 1
    val starts = new Array[Int](wc + 1)
    var idx = 1
    p = 0
    while (p < bytes.length) {
      if (bytes(p) == ' ') { starts(idx) = p + 1; idx += 1 }
      p += 1
    }
    starts(wc) = bytes.length + 1
    val nGrams = math.max(wc - n, 0) + 1
    val out = new Array[Any](nGrams)
    var i = 0
    while (i < nGrams) {
      val from = starts(i)
      val to = starts(math.min(i + n, wc)) - 1
      out(i) = UTF8String.fromBytes(bytes, from, to - from)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Codegen'd `shingle_gen(text, n)` — word n-gram shingle strings of a
  * document as one compiled pass ([[ShingleStatics.shingles]] has the
  * equivalence contract with the split/slice/concat_ws Column form;
  * DedupSpec pins both). Feeds `explode(...)` in every posting-list
  * builder. Null in → null out. */
case class ShingleGen(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_gen"

  override protected def nullSafeEval(s: Any): Any =
    ShingleStatics.shingles(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"org.apache.spark.sql.graft.ShingleStatics.shingles($s, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleGen =
    copy(child = newChild)
}

/** Static call target for [[GramH60]]: the h60 (first 15 md5 hex
  * digits as a signed-positive long) of every word k-gram of a text, in
  * ONE compiled pass over its UTF-8 bytes — md5 runs over the byte
  * range of each k-gram directly (the [[WinnowStatics]] argument:
  * split(" ") word starts are the positions after each 0x20 byte, and k
  * words joined by single spaces reproduce the source byte range
  * verbatim). Bit-identical to the Column form
  * `transform(sequence(0, greatest(size(ws)-k, 0)), i =>
  * h60(concat_ws(" ", slice(ws, i+1, k))))` — which runs through
  * Catalyst's INTERPRETED higher-order-function path and allocates a
  * slice, a joined string and a 32-char hex string per position. Texts
  * shorter than k words hash their whole word run as the single entry
  * (slice clamping). */
object GramStatics {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def h60grams(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    var spaces = 0
    var p = 0
    while (p < bytes.length) { if (bytes(p) == ' ') spaces += 1; p += 1 }
    val wc = spaces + 1
    val starts = new Array[Int](wc + 1)
    var idx = 1
    p = 0
    while (p < bytes.length) {
      if (bytes(p) == ' ') { starts(idx) = p + 1; idx += 1 }
      p += 1
    }
    starts(wc) = bytes.length + 1
    val nGrams = math.max(wc - k, 0) + 1
    val hs = new Array[Long](nGrams)
    val md = digests.get()
    var i = 0
    while (i < nGrams) {
      val from = starts(i)
      val to = starts(math.min(i + k, wc)) - 1
      md.reset()
      md.update(bytes, from, to - from)
      val d = md.digest()
      // first 15 md5 hex digits = top 60 bits of the digest
      hs(i) = ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) |
        ((d(2) & 0xffL) << 36) | ((d(3) & 0xffL) << 28) |
        ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
        ((d(6) & 0xffL) << 4) | ((d(7) & 0xf0L) >>> 4)
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(hs)
  }
}

/** Codegen'd `gram_h60(text, k)` — h60 hash of every word k-gram
  * (positions implicit by array index; [[GramStatics.h60grams]] has the
  * equivalence contract with the interpreted transform it replaces;
  * SelectionSpec pins both). Null in → null out. */
case class GramH60(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, s"gram size must be >= 1, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_h60"

  override protected def nullSafeEval(s: Any): Any =
    GramStatics.h60grams(s.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"org.apache.spark.sql.graft.GramStatics.h60grams($s, $k)")

  override protected def withNewChildInternal(newChild: Expression): GramH60 =
    copy(child = newChild)
}

/** Static call target for [[BpePairs]]: adjacent symbol pairs of a
  * U+0001-separated symbol string in one pass, each symbol a zero-copy
  * byte-range view. Bit-identical to the Column form
  * `arrays_zip(slice(y, 1, size(y)-1), slice(y, 2, size(y)-1))` over
  * `y = split(s, sep)`: symbols are the 0x01-delimited byte ranges
  * (split keeps empties), pair j = (symbol j, symbol j+1), and a
  * single-symbol string yields no pairs (slice length `size-1 = 0`). */
object BpePairStatics {
  def pairs(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    var seps = 0
    var p = 0
    while (p < n) { if (bytes(p) == 1) seps += 1; p += 1 }
    val wc = seps + 1
    if (wc < 2) return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0))
    val starts = new Array[Int](wc + 1)
    var idx = 1
    p = 0
    while (p < n) {
      if (bytes(p) == 1) { starts(idx) = p + 1; idx += 1 }
      p += 1
    }
    starts(wc) = n + 1
    val out = new Array[Any](wc - 1)
    var j = 0
    while (j < wc - 1) {
      val a = UTF8String.fromBytes(bytes, starts(j), starts(j + 1) - 1 - starts(j))
      val b = UTF8String.fromBytes(bytes, starts(j + 1), starts(j + 2) - 1 - starts(j + 1))
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](a, b))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Codegen'd `bpe_pairs(s)` — adjacent symbol pairs
  * `array<struct<l:string, r:string>>` of a symbol string
  * ([[BpePairStatics.pairs]] has the equivalence contract with the
  * arrays_zip/slice Column form; CorpusOpsSpec pins both). The Column
  * form materializes the split array plus two slice copies plus a
  * zipped struct array per word per merge round. Null in → null out. */
case class BpePairs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("l", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("r", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "bpe_pairs"

  override protected def nullSafeEval(s: Any): Any =
    BpePairStatics.pairs(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"org.apache.spark.sql.graft.BpePairStatics.pairs($s)")

  override protected def withNewChildInternal(newChild: Expression): BpePairs =
    copy(child = newChild)
}

/** Static call target for [[BpeMergeFold]]: one BPE merge (left, right)
  * folded through a U+0001-separated symbol string in ONE compiled
  * O(bytes) pass — the exact greedy left-to-right semantics of
  * [[graft.text.Bpe]]'s original `aggregate` HOF fold, byte-for-byte:
  *
  *   - the accumulator-empty branch (`acc === ""`) maps to `outLen == 0`
  *     — it keeps firing while the output is still empty (a leading
  *     empty symbol is swallowed), not just for element 1;
  *   - the fuse test `(acc === left || acc.endsWith(Sep+left)) && x ===
  *     right` is exactly "last emitted symbol == left && next == right"
  *     (symbols never contain the separator, so endsWith(Sep+left) ⇔
  *     the last symbol is left);
  *   - a fused symbol becomes left+right ≠ left (right is non-empty in
  *     every caller), so it cannot re-fuse as LEFT in the same pass —
  *     greedy scan-after-merge, the Sennrich reference behavior.
  *
  * The HOF fold is INTERPRETED (Catalyst higher-order functions don't
  * codegen) and builds the accumulator by immutable string concat —
  * O(len²) bytes copied per word plus per-element lambda dispatch. This
  * kernel writes each output byte once into a right-sized buffer
  * (output ≤ input: fusing drops a separator, nothing grows).
  * CorpusOpsSpec pins it against the HOF fold on randomized words. */
object BpeStatics {
  private def regionEq(a: Array[Byte], aFrom: Int, b: Array[Byte]): Boolean = {
    var i = 0
    while (i < b.length) {
      if (a(aFrom + i) != b(i)) return false
      i += 1
    }
    true
  }

  def merge(s: UTF8String, left: UTF8String, right: UTF8String): UTF8String = {
    val b = s.getBytes
    val lb = left.getBytes
    val rb = right.getBytes
    val n = b.length
    val out = new Array[Byte](n)
    var outLen = 0
    var lastStart = 0
    var i = 0
    while (i <= n) {
      var to = i
      while (to < n && b(to) != 1) to += 1
      val symLen = to - i
      if (outLen == 0) { // fold's `acc === ""` branch
        System.arraycopy(b, i, out, 0, symLen)
        outLen = symLen
        lastStart = 0
      } else {
        val fuse = (outLen - lastStart) == lb.length && symLen == rb.length &&
          regionEq(out, lastStart, lb) && regionEq(b, i, rb)
        if (fuse) {
          // append right to the last symbol — it becomes left+right
          System.arraycopy(b, i, out, outLen, symLen)
          outLen += symLen
        } else {
          out(outLen) = 1
          outLen += 1
          lastStart = outLen
          System.arraycopy(b, i, out, outLen, symLen)
          outLen += symLen
        }
      }
      i = to + 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, outLen))
  }
}

/** Codegen'd `bpe_merge(s, left, right)` — one BPE merge round applied
  * to a U+0001-separated symbol string (see [[BpeStatics.merge]] for
  * the equivalence contract with the `aggregate` HOF fold it replaces).
  * `left`/`right` are per-round constants (the argmax pair), passed as
  * literal children so one generated class serves every round. Null in
  * → null out. */
case class BpeMergeFold(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType, StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_merge"

  override protected def nullSafeEval(s: Any, l: Any, r: Any): Any =
    BpeStatics.merge(s.asInstanceOf[UTF8String],
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, l, r) =>
      s"org.apache.spark.sql.graft.BpeStatics.merge($s, $l, $r)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BpeMergeFold =
    copy(first = newFirst, second = newSecond, third = newThird)
}

case class OptimizerOpaque(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "opaque"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): OptimizerOpaque =
    copy(child = newChild)
}

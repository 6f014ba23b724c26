package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the hot loops where Spark's
  * higher-order array functions fall back to per-element interpreted
  * evaluation with boxing (transform/aggregate/zip_with are
  * CodegenFallback per ELEMENT through lambda variables).
  *
  * These evaluate once per ROW with a tight primitive loop inside —
  * the preference order of SURVEY §4B: compose built-ins first, then a
  * custom Expression, before ever reaching for mapPartitions.
  * CodegenFallback at ROW granularity is cheap; the win is removing
  * per-element lambda interpretation.
  */
object Native {

  /** FNV-1a 64-bit over a byte array, chained across words with a
    * separator feed — deterministic, engine-local (self-checked ops
    * only; no oracle needs to reproduce it). */
  @inline private[functions] def fnv1a(h0: Long, bytes: Array[Byte]): Long = {
    var h = h0
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    h
  }

  /** splitmix64 finalizer — decorrelates permutation streams. */
  @inline private[functions] def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def minhashSig(words: Column, perms: Int): Column =
    column(MinHashSig(expression(words), perms))

  def winnowStats(text: Column, k: Int, w: Int): Column =
    column(WinnowStats(expression(text), k, w))

  def repetitionStats(text: Column): Column =
    column(RepetitionStats(expression(text)))

  def entropyStats(text: Column): Column =
    column(EntropyStats(expression(text)))

  def dotF32(a: Column, b: Column): Column =
    column(DotProductF32(expression(a), expression(b)))

  def dotI64(a: Column, b: Column): Column =
    column(DotProductI64(expression(a), expression(b)))

  /** Size-bounded collect_list over an int64 column — see
    * [[CollectCappedLong]]. For collect-then-filter-by-size shapes
    * only: which elements survive in a group that HIT the cap is
    * arrival-order-dependent. */
  def collectCappedLong(c: Column, cap: Int): Column =
    column(CollectCappedLong(expression(c), cap).toAggregateExpression())
}

/** One-pass MinHash kernel, shared VERBATIM by MinHashSig's interpreted
  * eval and its generated code (the generated Java calls the static
  * forwarder) — the two paths are bit-exact by construction.
  * Returns null for <3 words (no 3-shingles). */
object MinHashKernel {
  def sig(words: ArrayData, perms: Int): Array[Long] = {
    val n = words.numElements()
    if (n < 3) return null
    // pre-hash each word once, then chain triples
    val wh = new Array[Long](n)
    var i = 0
    while (i < n) {
      wh(i) = Native.fnv1a(0xcbf29ce484222325L,
        words.getUTF8String(i).getBytes)
      i += 1
    }
    val mins = Array.fill(perms)(Long.MaxValue)
    i = 0
    while (i < n - 2) {
      val h = Native.mix(wh(i) * 31L + wh(i + 1)) * 31L + wh(i + 2)
      var p = 0
      while (p < perms) {
        val hp = Native.mix(h + p * 0x9E3779B97F4A7C15L)
        if (hp < mins(p)) mins(p) = hp
        p += 1
      }
      i += 1
    }
    mins
  }
}

/** MinHash signature of a word array: 3-word shingles hashed FNV-1a,
  * `perms` permutation minima via splitmix64(h + seed_p), one pass.
  * Returns null for docs with <3 words (no shingles).
  *
  * Round 1 shipped this as CodegenFallback — per-row interpreted
  * dispatch with an InternalRow copy inside the whole-stage loop made
  * dedup_minhash the one genuinely slow bench row (VERDICT §perf).
  * `doGenCode` keeps the projection inside whole-stage codegen. */
case class MinHashSig(child: Expression, perms: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = {
    val mins = MinHashKernel.sig(input.asInstanceOf[ArrayData], perms)
    if (mins == null) null else new GenericArrayData(mins)
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val mins = ctx.freshName("mhMins")
      s"""
         |long[] $mins = graft.functions.MinHashKernel.sig($c, $perms);
         |if ($mins == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** One-pass winnowing kernel shared VERBATIM by WinnowStats's
  * interpreted eval and its generated code — bit-exact by construction
  * with the exploded-window SQL formulation (and the DuckDB oracle):
  * gram hash = first 12 hex digits of md5(k-char-gram) read as BIGINT,
  * fingerprints = minima of each w-gram sliding window, stats over the
  * DISTINCT fingerprint set.
  */
object WinnowKernel {
  /** Returns {n_fp, min_fp, max_fp, fp_sum} over the distinct window
    * minima, or null when the doc has fewer than w grams (the exploded
    * formulation's `pos >= w` filter leaves no rows for such docs). */
  def stats(text: org.apache.spark.unsafe.types.UTF8String, k: Int, w: Int): Array[Long] = {
    val nChars = text.numChars()
    val m = nChars - k + 1 // gram count
    if (m < w) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    val bytes = text.getBytes
    val ascii = bytes.length == nChars
    val str = if (ascii) null else text.toString
    val h = new Array[Long](m)
    var p = 0
    while (p < m) {
      // md5 of the UTF-8 bytes of the k-CHAR gram; for the (asserted-
      // ASCII) corpus this is a zero-copy byte-range update
      if (ascii) md.update(bytes, p, k)
      else md.update(str.substring(p, p + k)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val d = md.digest() // resets the digest for the next gram
      h(p) = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
        ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
        ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
      p += 1
    }
    // w is tiny (4): the naive O(m·w) window min beats a deque here
    val mins = new Array[Long](m - w + 1)
    p = w - 1
    while (p < m) {
      var lo = h(p)
      var j = p - w + 1
      while (j < p) { if (h(j) < lo) lo = h(j); j += 1 }
      mins(p - w + 1) = lo
      p += 1
    }
    java.util.Arrays.sort(mins)
    var n = 0L; var sum = 0L; var i = 0; var prev = 0L
    while (i < mins.length) {
      if (i == 0 || mins(i) != prev) { n += 1; sum += mins(i) }
      prev = mins(i)
      i += 1
    }
    Array(n, mins(0), mins(mins.length - 1), sum)
  }
}

/** Per-row winnowing fingerprint stats over a text column — the
  * zero-shuffle formulation of text_winnow. The exploded alternative
  * (one row per character position through a partitionBy(doc_id)
  * window) shuffles (doc_id, pos, hash) triples — ~24 bytes per corpus
  * CHARACTER through the exchange, a ~24× amplification that becomes
  * the bottleneck long before CPU at 100 TB. Every input the selection
  * needs lives in ONE source row, so this computes the whole
  * hash→window-min→distinct→stats chain in a tight per-row loop inside
  * whole-stage codegen; the only remaining exchange in the query is
  * the final presentation orderBy. Returns a struct
  * {n_fp, min_fp, max_fp, fp_sum}; null when the doc has < w grams. */
case class WinnowStats(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_fp", LongType, nullable = false),
    StructField("min_fp", LongType, nullable = false),
    StructField("max_fp", LongType, nullable = false),
    StructField("fp_sum", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val st = WinnowKernel.stats(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)
    if (st == null) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](st(0), st(1), st(2), st(3)))
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val st = ctx.freshName("wnSt")
      s"""
         |long[] $st = graft.functions.WinnowKernel.stats($c, $k, $w);
         |if ($st == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{ $st[0], $st[1], $st[2], $st[3] });
         |}
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): WinnowStats = copy(child = c)
}

/** One-pass repetition-signal kernel shared VERBATIM by
  * RepetitionStats's interpreted eval and its generated code. Counts
  * are exact integers over the split-on-space word sequence (split
  * semantics replicate Spark's `split(text, ' ')` / Java
  * `String.split(" ", -1)`, which DuckDB's `string_split` matches):
  *   n_words, top_word_n (count of the most frequent word),
  *   n_3grams (= max(n_words−2, 0)),
  *   dup3_pos (word-3-gram POSITIONS whose gram occurs ≥ 2× in-doc).
  */
object RepetitionKernel {
  def stats(text: org.apache.spark.unsafe.types.UTF8String): Array[Long] = {
    val ws = text.toString.split(" ", -1)
    val n = ws.length
    val wc = new java.util.HashMap[String, Integer](n * 2)
    var i = 0
    while (i < n) { wc.merge(ws(i), 1, (a, b) => a + b); i += 1 }
    var top = 0
    val it = wc.values().iterator()
    while (it.hasNext) { val c = it.next(); if (c > top) top = c }
    val m = math.max(n - 2, 0)
    val gc = new java.util.HashMap[String, Integer](m * 2)
    i = 0
    while (i < m) {
      gc.merge(ws(i) + " " + ws(i + 1) + " " + ws(i + 2), 1, (a, b) => a + b)
      i += 1
    }
    var dup = 0L
    val git = gc.values().iterator()
    while (git.hasNext) { val c = git.next(); if (c >= 2) dup += c }
    Array(n.toLong, top.toLong, m.toLong, dup)
  }
}

/** Per-row repetition quality signals (the Gopher/C4 repetition
  * filters): an excessively repetitive document — one word dominating,
  * or a large fraction of repeated 3-grams — is boilerplate or spam
  * and gets dropped before training. Both signals need per-document
  * frequency maps; the groupBy formulation shuffles every WORD of the
  * corpus, while this computes the maps in one per-row pass inside
  * whole-stage codegen (the WinnowStats pattern) — zero shuffle.
  * Returns {n_words, top_word_n, n_3grams, dup3_pos}, all exact
  * integers an external engine can replay. */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("top_word_n", LongType, nullable = false),
    StructField("n_3grams", LongType, nullable = false),
    StructField("dup3_pos", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val st = RepetitionKernel.stats(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](st(0), st(1), st(2), st(3)))
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val st = ctx.freshName("repSt")
      s"""
         |long[] $st = graft.functions.RepetitionKernel.stats($c);
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{ $st[0], $st[1], $st[2], $st[3] });
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): RepetitionStats = copy(child = c)
}

/** One-pass character-distribution kernel shared VERBATIM by
  * EntropyStats's interpreted eval and its generated code. Exact
  * integer signals over the document's character sequence:
  *   n_chars (code points), distinct_chars, top_char_n (count of the
  *   most frequent character), distinct_bigrams (distinct adjacent
  *   character pairs — a crude LZ/compressibility proxy: text that
  *   compresses too well is boilerplate).
  * All counts are replayable relationally (unnest chars → group), so
  * the DuckDB oracle hash-checks every field. */
object EntropyKernel {
  def stats(text: org.apache.spark.unsafe.types.UTF8String): Array[Long] = {
    val s = text.toString
    val n = s.length
    val cc = new java.util.HashMap[Character, Integer](128)
    var i = 0
    while (i < n) { cc.merge(s.charAt(i), 1, (a, b) => a + b); i += 1 }
    var top = 0
    val it = cc.values().iterator()
    while (it.hasNext) { val c = it.next(); if (c > top) top = c }
    val bg = new java.util.HashSet[Integer](if (n > 0) n * 2 else 8)
    i = 0
    while (i < n - 1) { bg.add((s.charAt(i) << 16) | s.charAt(i + 1)); i += 1 }
    Array(n.toLong, cc.size.toLong, top.toLong, bg.size.toLong)
  }
}

/** Per-row character-entropy quality signals for LLM-data curation —
  * the character-level sibling of RepetitionStats (word level): a
  * document dominated by one character, or with too few distinct
  * adjacent pairs, is ASCII art / separator spam / degenerate output
  * and gets dropped before training. The naive formulation explodes
  * one row per CHARACTER through a groupBy — a corpus-sized shuffle;
  * every input lives in one source row, so this builds the frequency
  * map and bigram set in a tight per-row pass inside whole-stage
  * codegen (the WinnowStats pattern) — zero shuffle. Returns
  * {n_chars, distinct_chars, top_char_n, distinct_bigrams}. */
case class EntropyStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("distinct_chars", LongType, nullable = false),
    StructField("top_char_n", LongType, nullable = false),
    StructField("distinct_bigrams", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val st = EntropyKernel.stats(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](st(0), st(1), st(2), st(3)))
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val st = ctx.freshName("entSt")
      s"""
         |long[] $st = graft.functions.EntropyKernel.stats($c);
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{ $st[0], $st[1], $st[2], $st[3] });
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): EntropyStats = copy(child = c)
}

/** Dot product of two float arrays accumulated in double, sequential
  * index order — numerically identical to the zip_with/aggregate
  * formulation (and to the oracle's per-index sum), ~50× cheaper. */
case class DotProductF32(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  @inline private def elemAt(arr: ArrayData, et: DataType, i: Int): Double = et match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case _ => throw new IllegalArgumentException(s"dot over $et")
  }
  private lazy val leftEt = left.dataType.asInstanceOf[ArrayType].elementType
  private lazy val rightEt = right.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += elemAt(a, leftEt, i) * elemAt(b, rightEt, i); i += 1 }
    acc
  }

  // Generated form keeps the expression inside whole-stage codegen —
  // same sequential double accumulation as nullSafeEval.
  private def accessor(et: DataType, arr: String, i: String): String = et match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case other => throw new IllegalArgumentException(s"dot over $other")
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("dotN")
      val acc = ctx.freshName("dotAcc")
      val i = ctx.freshName("dotI")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (${accessor(leftEt, a, i)}) * (${accessor(rightEt, b, i)});
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductF32 =
    copy(left = l, right = r)
}

/** Integer dot product over two `array<bigint>` columns — the hot loop
  * of quantized ANN scoring (IVF cluster assignment, LSH sign
  * hashing). A `zip_with`+`aggregate` formulation interprets a lambda
  * per ELEMENT (with boxing); this evaluates once per row with a tight
  * primitive long loop, and `doGenCode` keeps it inside whole-stage
  * codegen. Integer multiplication/addition are associative, so the
  * value is identical to the higher-order formulation bit-for-bit
  * (asserted in ExtensionsSpec). */
case class DotProductI64(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("dotN")
      val acc = ctx.freshName("dotAcc")
      val i = ctx.freshName("dotI")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductI64 =
    copy(left = l, right = r)
}

/** `collect_list` with a HARD per-group buffer bound: stops appending
  * once `cap` elements are held (merge re-caps the same way), so a
  * skew-hub group costs O(cap) aggregation memory instead of O(deg).
  *
  * Built for the collect-then-filter-by-size shape (graph_jaccard's
  * hub cut, r12 — the r11 single-shuffle reshape filtered
  * `size(ps) <= JacMaxDeg` AFTER collect_list had already materialized
  * a mega-hub's whole neighbor list in the buffer): with
  * `cap = JacMaxDeg + 1`, every group that reaches cap is one the
  * size-filter drops anyway, and every surviving group was collected
  * in full — semantics identical, memory bounded. WHICH cap elements
  * survive in an over-cap group is arrival-order-dependent (fine:
  * those groups must be filtered out, never read).
  *
  * Long-specialized: the buffer serializes as a tight 8-byte-packed
  * run, and all graph node/key columns here are int64. Same
  * TypedImperativeAggregate → ObjectHashAggregateExec path as
  * collect_list itself — this is a memory bound, not a plan change
  * (the r11 mode() lesson: never move an |edges|-scale aggregate off
  * its codegen/hash path for a job-count win). */
case class CollectCappedLong(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[Long]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  require(cap > 0, "cap must be positive")

  // int64 children only (AbstractDataType/ExpectsInputTypes is
  // private[sql], so the contract is enforced via checkInputDataTypes
  // — the public type-check hook, so misuse reports the actual
  // problem instead of an opaque "unresolved operator" analysis
  // failure, which is what an overridden `resolved` produced
  // (r12 ADVICE)) — every graph node/key column here is int64
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"collect_capped_long requires BIGINT input, got " +
          child.dataType.catalogString)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "collect_capped_long"

  override def createAggregationBuffer(): scala.collection.mutable.ArrayBuffer[Long] =
    new scala.collection.mutable.ArrayBuffer[Long](8)

  override def update(
      buf: scala.collection.mutable.ArrayBuffer[Long],
      input: InternalRow): scala.collection.mutable.ArrayBuffer[Long] = {
    if (buf.length < cap) {
      val v = child.eval(input)
      if (v != null) buf += v.asInstanceOf[Long]
    }
    buf
  }

  override def merge(
      b1: scala.collection.mutable.ArrayBuffer[Long],
      b2: scala.collection.mutable.ArrayBuffer[Long])
      : scala.collection.mutable.ArrayBuffer[Long] = {
    val room = cap - b1.length
    if (room >= b2.length) b1 ++= b2
    else if (room > 0) b1 ++= b2.view.slice(0, room)
    b1
  }

  override def eval(buf: scala.collection.mutable.ArrayBuffer[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: scala.collection.mutable.ArrayBuffer[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong(_): Unit)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.ArrayBuffer[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new scala.collection.mutable.ArrayBuffer[Long](bytes.length / 8)
    while (bb.remaining() >= 8) out += bb.getLong()
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): CollectCappedLong =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CollectCappedLong =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CollectCappedLong =
    copy(child = c)
}

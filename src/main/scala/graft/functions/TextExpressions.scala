package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text-hashing expressions for the dedup hot paths: one pass
  * per document, no intermediate string materialization, no explode.
  *
  * Hash family: a 31-polynomial rolling char hash finalized with
  * splitmix64 — self-consistent within this library (LSH needs
  * uniformity, not cross-engine compatibility). Tokenization is
  * whitespace-run splitting, matching `TextStats.tokens` semantics.
  *
  * Both expressions carry full `doGenCode` (a static call into the
  * shared eval helper), so they stay inside whole-stage codegen spans
  * instead of falling back to interpreted `eval` per row.
  */
object TextExpressions {

  @inline private def splitmix(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Per-token 64-bit hashes of a text (whitespace tokenization). */
  private def tokenHashes(s: String): Array[Long] = {
    val out = new scala.collection.mutable.ArrayBuffer[Long](64)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      if (i < n) {
        var h = 1125899906842597L
        while (i < n && !Character.isWhitespace(s.charAt(i))) {
          h = h * 31 + s.charAt(i)
          i += 1
        }
        out += splitmix(h)
      }
    }
    out.toArray
  }

  /** Distinct, sorted hashes of the w-token shingles of `child` —
    * the single-pass replacement for
    * split → transform(sequence) → concat_ws → xxhash64 →
    * array_distinct (which allocated a string per shingle).
    */
  /** Shared eval body — also the static call target of the generated
    * code (Scala object methods surface as Java statics).
    */
  def shingleHashesEval(v: UTF8String, w: Int): ArrayData = {
    val toks = tokenHashes(v.toString)
    val nSh = math.max(toks.length - w + 1, 0)
    if (nSh == 0) return new GenericArrayData(Array.empty[Long])
    val sh = new Array[Long](nSh)
    var i = 0
    while (i < nSh) {
      var h = 0L
      var j = 0
      while (j < w) { h = h * 0x100000001B3L + toks(i + j); j += 1 }
      sh(i) = splitmix(h)
      i += 1
    }
    java.util.Arrays.sort(sh)
    // in-place dedup of the sorted array
    var out = 1
    var k = 1
    while (k < nSh) {
      if (sh(k) != sh(k - 1)) { sh(out) = sh(k); out += 1 }
      k += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(sh, out))
  }

  /** POSITION-ORDERED w-token window hashes — same fold as
    * [[shingleHashesEval]] (FNV-prime over the token hashes, splitmix
    * finalize) but WITHOUT the sort/dedup: element i is the hash of
    * tokens [i, i+w). Sub-document substring dedup needs the position
    * to map a duplicated window back to the token span it covers.
    */
  def positionalShingleHashesEval(v: UTF8String, w: Int): ArrayData = {
    val toks = tokenHashes(v.toString)
    val nSh = math.max(toks.length - w + 1, 0)
    val sh = new Array[Long](nSh)
    var i = 0
    while (i < nSh) {
      var h = 0L
      var j = 0
      while (j < w) { h = h * 0x100000001B3L + toks(i + j); j += 1 }
      sh(i) = splitmix(h)
      i += 1
    }
    new GenericArrayData(sh)
  }

  case class PositionalShingleHashes(child: Expression, w: Int)
      extends UnaryExpression {
    require(w >= 1)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      positionalShingleHashesEval(v.asInstanceOf[UTF8String], w)
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextExpressions.positionalShingleHashesEval($c, $w);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class ShingleHashes(child: Expression, w: Int)
      extends UnaryExpression {
    require(w >= 1)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      shingleHashesEval(v.asInstanceOf[UTF8String], w)
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextExpressions.shingleHashesEval($c, $w);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** 64-bit SimHash of a text in one row-local pass: token hashes →
    * signed per-bit counts → sign bits. Replaces the
    * explode + 64-column aggregation formulation — no shuffle at all;
    * simhash becomes a projection.
    */
  /** Shared eval body / static codegen target, like
    * [[shingleHashesEval]].
    */
  def simhash64Eval(v: UTF8String): Long = {
    val toks = tokenHashes(v.toString)
    val counts = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = toks(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }

  case class SimHash64(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      simhash64Eval(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextExpressions.simhash64Eval($c);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Term-frequency hash embedding (the "hashing trick"): a
    * `dim`-bucket integer vector where v[b] counts the tokens whose
    * hash lands in bucket b. One row-local pass, no vocabulary, no
    * model — the deterministic text-side twin of the embeddings
    * table, good enough for coarse similarity/clustering and exactly
    * replayable by any engine that can reproduce the token hashes
    * (the DuckDB oracle does, via the splitmix CTEs).
    *
    * `dim` must be a power of two: bucket = hash & (dim-1), which
    * equals the UNSIGNED hash mod dim — the form the oracle's
    * UBIGINT arithmetic computes.
    */
  def hashEmbedEval(v: UTF8String, dim: Int): ArrayData = {
    val toks = tokenHashes(v.toString)
    val counts = new Array[Int](dim)
    var i = 0
    while (i < toks.length) {
      counts((toks(i) & (dim - 1)).toInt) += 1
      i += 1
    }
    new GenericArrayData(counts)
  }

  case class HashEmbed(child: Expression, dim: Int)
      extends UnaryExpression {
    require(dim >= 2 && (dim & (dim - 1)) == 0,
      s"dim must be a power of two, got $dim")
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      hashEmbedEval(v.asInstanceOf[UTF8String], dim)
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextExpressions.hashEmbedEval($c, $dim);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Count-min-sketch cell ids of a text's tokens: for every token
    * and every hash row i ∈ [0, d), the PACKED cell `i·w + bucket_i`
    * where `bucket_i = splitmix(tokenHash + i·γ) & (w−1)` — the
    * independent-hash-family recipe the minhash permutations already
    * use, replayable as UBIGINT arithmetic by the oracle. One array
    * per text (d · nTokens ints); a single-token text yields a
    * probe key's d cells.
    */
  def cmsCellsEval(v: UTF8String, d: Int, w: Int): ArrayData = {
    val toks = tokenHashes(v.toString)
    val out = new Array[Int](toks.length * d)
    var j = 0
    var o = 0
    while (j < toks.length) {
      var i = 0
      while (i < d) {
        out(o) = i * w +
          (splitmix(toks(j) + i * 0x9E3779B97F4A7C15L) & (w - 1)).toInt
        i += 1
        o += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  case class CmsCells(child: Expression, d: Int, w: Int)
      extends UnaryExpression {
    require(d >= 1 && w >= 2 && (w & (w - 1)) == 0,
      s"need d >= 1 and power-of-two w, got d=$d w=$w")
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      cmsCellsEval(v.asInstanceOf[UTF8String], d, w)
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextExpressions.cmsCellsEval($c, $d, $w);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Unicode NFC normalization (canonical composition) — the standard
    * first step of training-corpus text cleaning (é as e+U+0301 and é
    * as U+00E9 must dedup/tokenize identically). Row-local; the
    * already-normalized fast path (the overwhelming majority of real
    * text) costs one `Normalizer.isNormalized` scan and zero
    * allocation.
    */
  def nfcNormalizeEval(v: UTF8String): UTF8String = {
    val s = v.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) v
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  case class NfcNormalize(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      nfcNormalizeEval(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextExpressions.nfcNormalizeEval($c);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** One greedy left-to-right non-overlapping BPE merge pass: every
    * adjacent (w1, w2) symbol pair becomes the concatenated symbol; a
    * consumed position cannot open the next match (Sennrich
    * semantics — (a,a) over "aaa" merges positions 1–2 and leaves the
    * 3rd). Single O(n) pass with a flat output buffer.
    *
    * Exists because the same fold phrased as `functions.aggregate`
    * with an array accumulator is O(n²) AND interpreted
    * (ArrayAggregate has no codegen; every array_append copies the
    * accumulator row) — measured: the 100× scaled corpus, whose pad
    * words reach ~5,200 chars, drove one merge round from seconds to
    * tens of minutes. Real corpora contain such tokens (base64 blobs,
    * DNA strings, minified JS), so the tokenizer hot path must be
    * linear in word length, not quadratic.
    */
  def bpeMergeEval(syms: ArrayData, w1: UTF8String,
                   w2: UTF8String): ArrayData = {
    val n = syms.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](n)
    val merged = UTF8String.concat(w1, w2)
    var i = 0
    while (i < n) {
      val s = if (syms.isNullAt(i)) null else syms.getUTF8String(i)
      if (s != null && i + 1 < n && s.equals(w1) && !syms.isNullAt(i + 1)
          && syms.getUTF8String(i + 1).equals(w2)) {
        out += merged
        i += 2
      } else {
        out += s
        i += 1
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Code-point split of a string into single-character strings —
    * equivalent to `transform(sequence(1, length(s)), i ->
    * substring(s, i, 1))` but one linear byte walk instead of an
    * interpreted ArrayTransform whose per-char Substring seeks from
    * the string start (O(n²) on long words — the same pathological-
    * token hazard as the merge fold, and the other interpreted HOF on
    * the BPE path).
    */
  def charsEval(v: UTF8String): ArrayData = {
    val bytes = v.getBytes
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](bytes.length)
    var i = 0
    while (i < bytes.length) {
      val n = UTF8String.numBytesForFirstByte(bytes(i))
      out += UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, i, math.min(i + n, bytes.length)))
      i += n
    }
    new GenericArrayData(out.toArray[Any])
  }

  case class Chars(child: Expression) extends UnaryExpression
      with ExpectsInputTypes {
    // Seq[DataType] refines Seq[AbstractDataType] covariantly
    // (AbstractDataType itself is private[sql] in Spark 4)
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      charsEval(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextExpressions.charsEval($c);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class BpeMergeFold(first: Expression, second: Expression,
                          third: Expression) extends TernaryExpression
      with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(StringType), StringType, StringType)
    override def dataType: DataType =
      ArrayType(StringType, containsNull = true)
    override def nullSafeEval(s: Any, a: Any, b: Any): Any =
      bpeMergeEval(s.asInstanceOf[ArrayData],
        a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (s, a, b) =>
        s"${ev.value} = graft.functions.TextExpressions.bpeMergeEval($s, $a, $b);")
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Expression =
      copy(first = f, second = s, third = t)
  }

  // ----- Column API -----
  def chars(s: Column): Column =
    ColumnBridge.column(Chars(ColumnBridge.expression(s)))

  /** One greedy merge pass over a symbol array (see [[bpeMergeEval]]).
    * NULL ARRAY ELEMENTS are preserved in place and never participate
    * in a merge (a null is an opaque non-symbol: neither `(w1, null)`
    * nor `(null, w2)` matches). The trainer path never produces them
    * (`chars()` has containsNull=false), but the behavior is part of
    * this public Column API's contract and pinned by
    * BpeExpressionsSpec.
    */
  def bpe_merge(syms: Column, w1: Column, w2: Column): Column =
    ColumnBridge.column(BpeMergeFold(ColumnBridge.expression(syms),
      ColumnBridge.expression(w1), ColumnBridge.expression(w2)))

  def shingle_hashes(text: Column, w: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), w))

  def positional_shingle_hashes(text: Column, w: Int): Column =
    ColumnBridge.column(
      PositionalShingleHashes(ColumnBridge.expression(text), w))

  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))

  def nfc_normalize(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))

  def hash_embed(text: Column, dim: Int): Column =
    ColumnBridge.column(HashEmbed(ColumnBridge.expression(text), dim))

  def cms_cells(text: Column, d: Int, w: Int): Column =
    ColumnBridge.column(CmsCells(ColumnBridge.expression(text), d, w))
}

// Lives under org.apache.spark.sql so the private[sql] expression plumbing
// (AbstractDataType, ExpressionUtils) is reachable — the standard shim
// pattern for out-of-tree native expressions.
package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expressions (brief preference order: built-in functions
  * > custom codegen'd `Expression` > UDF). These two are the hot-path
  * kernels of the LLM-pipeline operators; as expressions they run inside
  * whole-stage codegen with zero boxing, vs. the higher-order-function
  * formulations which evaluate interpreted lambda trees per element
  * (simhash was 64 array passes per row as HOFs).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var j = 0
        while (j < 64) {
          votes(j) += (if (((h >> j) & 1L) == 1L) 1 else -1); j += 1
        }
      }
      i += 1
    }
    var res = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) res |= (1L << j); j += 1 }
    res
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("votes")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      s"""
         |int[] $votes = new int[64];
         |final int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$c.isNullAt($i)) {
         |    long $h = $c.getLong($i);
         |    for (int $j = 0; $j < 64; $j++) {
         |      $votes[$j] += ((($h >> $j) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |${ev.value} = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($votes[$j] > 0) ${ev.value} |= (1L << $j);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : SimHash64 = copy(child = newChild)
}

/** Cosine similarity of two float vectors in ONE fused pass (dot and both
  * norms accumulated together in doubles, matching the documented oracle
  * semantics). Null if either side is null; 0-vectors guarded by 1e-12. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    dot / math.max(math.sqrt(nx) * math.sqrt(ny), 1e-12)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = $dot / Math.max(Math.sqrt($nx) * Math.sqrt($ny), 1e-12);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** k-permutation MinHash signature over a string-array column in one
  * compiled pass: sig[j] = min over elements of XXH64(bytes, seed=j).
  * The HOF formulation (`transform(sequence(0,k-1), j -> array_min(
  * transform(sh, s -> xxhash64(s, j))))`) walks interpreted lambda trees
  * per element × per seed — measured ~20s for 10k docs × 64 seeds at
  * sf0.1; this loop does the same hashes in compiled code. Codegen emits a
  * single call into the compiled companion kernel (the TextStats pattern) —
  * the per-row virtual call is noise next to the k×|sh| inner loop, and it
  * keeps the surrounding operator inside whole-stage codegen. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("minhashSigKernel", MinHashSignature,
      MinHashSignature.getClass.getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c, $numHashes)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashSignature = copy(child = newChild)
}

object MinHashSignature {
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        var j = 0
        while (j < numHashes) {
          val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
            s.getBaseObject, s.getBaseOffset, s.numBytes, j)
          if (h < out(j)) out(j) = h
          j += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Word-n-gram shingles as 64-bit HASHES, straight from the token array —
  * no per-shingle string allocation (the `concat_ws` string shingles were
  * the dominant cost of LSH dedup after the minhash fix). shingle hash =
  * XXH64 chained over the n member tokens' hashes. Jaccard over hashed
  * shingles equals string-shingle Jaccard modulo 2^-64 collisions. */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n > 0)

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashKernel", ShingleHashes,
      ShingleHashes.getClass.getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : ShingleHashes = copy(child = newChild)
}

object ShingleHashes {
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    // per-token hashes once
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = arr.getUTF8String(i)
      th(i) =
        if (s == null) 0L
        else org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      i += 1
    }
    val count = if (m >= n) m - n + 1 else 1
    val out = new Array[Long](count)
    if (m >= n) {
      var start = 0
      while (start <= m - n) {
        var h = 42L
        var j = 0
        while (j < n) { h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(th(start + j), h); j += 1 }
        out(start) = h
        start += 1
      }
    } else {
      // shorter than n: single shingle of all tokens (matches
      // TextFunctions.shingles' whole-text fallback)
      var h = 42L
      var j = 0
      while (j < m) { h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(th(j), h); j += 1 }
      out(0) = h
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** MinHash over an array<long> of shingle hashes: sig[j] = min over
  * shingles of the j-th PERMUTATION h_j(x) = a_j·x + b_j (a_j odd, so
  * each h_j is a bijection on Z/2^64). The shingle hashes are already
  * uniform 64-bit XXH64 outputs, so the 2-universal multiply-add family
  * gives the standard MinHash collision guarantee at one fused
  * multiply-add per (shingle, j) — ~10× fewer ALU ops than the previous
  * k-seeded-XXH64-rounds formulation (64 full hash rounds per shingle);
  * end-to-end LSH timing at sf0.1 is shuffle/cache-variance-dominated,
  * the kernel gain shows at larger shingle counts.
  * Note the FAMILY defines the signature values: batch and streaming
  * near-dup share this one expression, so their band keys stay
  * identical; pair-level output is family-independent anyway because
  * the verify step recomputes exact Jaccard. */
case class MinHashFromLongs(child: Expression, numHashes: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_from_longs"

  // deterministic per-slot coefficients, derived once per plan instance
  @transient private lazy val coefA: Array[Long] =
    Array.tabulate(numHashes)(j => org.apache.spark.sql.catalyst.expressions
      .XXH64.hashLong(j.toLong, 0xA5A5A5A5A5A5A5A5L) | 1L)
  @transient private lazy val coefB: Array[Long] =
    Array.tabulate(numHashes)(j => org.apache.spark.sql.catalyst.expressions
      .XXH64.hashLong(j.toLong, 0x5A5A5A5A5A5A5A5AL))

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val (a, b) = (coefA, coefB)
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val v = arr.getLong(i)
      var j = 0
      while (j < numHashes) {
        val h = a(j) * v + b(j)
        if (h < out(j)) out(j) = h
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  // The k×|shingles| multiply-add loop is the hot kernel of LSH dedup —
  // inlined into the generated Java (not a kernel call) so JIT sees one
  // flat loop nest; coefficient arrays ride along as plan references.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val a = ctx.addReferenceObj("minhashCoefA", coefA, "long[]")
    val b = ctx.addReferenceObj("minhashCoefB", coefB, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      val h = ctx.freshName("h")
      s"""
         |long[] $out = new long[$numHashes];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |final int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $v = $c.getLong($i);
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $h = $a[$j] * $v + $b[$j];
         |    if ($h < $out[$j]) $out[$j] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashFromLongs = copy(child = newChild)
}

/** One-pass text statistics for quality scoring / language ID: codepoint
  * count, ASCII-punctuation count, token count, token-length sum, and
  * per-language stopword hits — everything the quality/lang-id formulas
  * need, in a single scan of the UTF-8 bytes. Replaces four regex passes
  * plus interpreted higher-order `filter`/`aggregate` lambdas per row
  * (HOFs are CodegenFallback — they evaluate an interpreted expression
  * tree per element).
  *
  * Token semantics match `lower(c)` + `split("\\W+")` + drop-empties for
  * any input whose lowercase mapping stays within ASCII (Java `\w` is
  * ASCII-only, so tokens are maximal `[a-z0-9_]` runs after lowercasing
  * A-Z). Exotic lowercase expansions (e.g. U+0130) differ — documented,
  * and irrelevant for `\w`-tokenized corpora.
  */
case class TextStats(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = TextStats.schema
  override def prettyName: String = "text_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    // single virtual call into the compiled companion kernel — keeps the
    // operator inside whole-stage codegen without inlining the scanner
    val ref = ctx.addReferenceObj("textStatsKernel", TextStats,
      TextStats.getClass.getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : TextStats = copy(child = newChild)
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("chars", IntegerType, nullable = false),
    StructField("punct", IntegerType, nullable = false),
    StructField("ntok", IntegerType, nullable = false),
    StructField("wlen", LongType, nullable = false),
    StructField("en", IntegerType, nullable = false),
    StructField("de", IntegerType, nullable = false),
    StructField("fr", IntegerType, nullable = false),
    StructField("es", IntegerType, nullable = false)))

  // stopwords packed as little-endian longs (all are <= 5 ASCII bytes);
  // a token longer than 8 bytes can never match and skips the lookup
  private def pack(w: String): Long = {
    require(w.length <= 8)
    var v = 0L
    var i = w.length - 1
    while (i >= 0) { v = (v << 8) | (w.charAt(i) & 0xffL); i -= 1 }
    v
  }
  private val en = Array("the", "a", "an", "and", "or", "of", "to", "in",
    "is", "it", "that", "for", "on", "with", "as", "at", "by", "from").map(pack)
  private val de = Array("der", "die", "das", "und", "oder", "von", "zu",
    "im", "ist", "es", "dass", "für", "auf", "mit", "als", "bei", "aus")
    .filter(_.forall(_ < 128)).map(pack)
  private val fr = Array("le", "la", "les", "et", "ou", "de", "du", "en",
    "est", "il", "que", "pour", "sur", "avec", "comme", "au", "par", "des").map(pack)
  private val es = Array("el", "la", "los", "las", "y", "o", "de", "del",
    "en", "es", "que", "para", "sobre", "con", "como", "al", "por", "un").map(pack)

  private def hits(set: Array[Long], v: Long): Int = {
    var i = 0
    while (i < set.length) { if (set(i) == v) return 1; i += 1 }
    0
  }

  def compute(u: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val n = u.numBytes()
    var punct = 0
    var ntok = 0
    var wlen = 0L
    var enH = 0; var deH = 0; var frH = 0; var esH = 0
    var runLen = 0
    var runPacked = 0L
    var runFits = true
    def endRun(): Unit = {
      if (runLen > 0) {
        ntok += 1
        wlen += runLen
        if (runFits && runLen <= 8) {
          enH += hits(en, runPacked); deH += hits(de, runPacked)
          frH += hits(fr, runPacked); esH += hits(es, runPacked)
        }
        runLen = 0; runPacked = 0L; runFits = true
      }
    }
    var i = 0
    while (i < n) {
      val b = u.getByte(i) & 0xff
      // ASCII \p{Punct}: 33-47, 58-64, 91-96, 123-126
      if ((b >= 33 && b <= 47) || (b >= 58 && b <= 64) ||
          (b >= 91 && b <= 96) || (b >= 123 && b <= 126)) punct += 1
      // word char after ASCII lowercasing: [a-z0-9_]
      val lc = if (b >= 'A' && b <= 'Z') b + 32 else b
      val isWord = (lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9') ||
        lc == '_'
      if (isWord) {
        if (runLen < 8) runPacked |= (lc.toLong << (8 * runLen))
        else runFits = false
        runLen += 1
      } else endRun()
      i += 1
    }
    endRun()
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](u.numChars(), punct, ntok, wlen, enH, deH, frH, esH))
  }
}

/** Unicode NFC normalization (compose decomposed sequences: 'e'+U+0301 →
  * 'é'). The corpus-ingest canonicalization step — exact-dedup keys and
  * shingle hashes treat canonically-equal strings as distinct unless the
  * text is NFC'd first. Two fast paths keep the 100 TB scan cheap: pure
  * ASCII (numBytes == numChars) returns the input buffer untouched, and
  * already-normalized text (the overwhelming majority) skips the rewrite
  * via `Normalizer.isNormalized`. Oracle: DuckDB `nfc_normalize`.
  */
case class NormalizeNFC(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_nfc"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeNFC.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("nfcKernel", NormalizeNFC,
      NormalizeNFC.getClass.getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : NormalizeNFC = copy(child = newChild)
}

object NormalizeNFC {
  import java.text.Normalizer
  def compute(u: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    // ASCII is closed under NFC; numBytes == numChars ⇔ all single-byte
    if (u.numBytes() == u.numChars()) return u
    val s = u.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) u
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      Normalizer.normalize(s, Normalizer.Form.NFC))
  }
}

/** Column-level entry points for the native expressions. */
/** Dot product of two double-array columns in one fused codegen'd pass
  * (left-to-right accumulation — the same order as the HOF
  * `aggregate(zip_with(...))` formulation it replaces in hot paths like
  * [[graft.ops.Similarity.pcaProject]], where k interpreted lambda-tree
  * walks per row would dominate the scan). Inputs implicit-cast to
  * array&lt;double&gt;, so float embeddings promote element-wise. Null if
  * either side is null; length = min of the two (the CosineSimilarity
  * convention). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** DEFLATE-compressed size of the string's UTF-8 bytes (zlib level 6,
  * raw stream, default strategy) — the classic compression-ratio
  * quality heuristic: templated/boilerplate/repetitive text compresses
  * far below prose, and the ratio needs no model, no language and no
  * tokenizer. Deterministic for a fixed JDK zlib: the consumer
  * ([[graft.functions.TextFunctions.compressionStats]]) pins its
  * oracle on in-plan INVARIANTS (repetition compresses strictly
  * better), never on engine-replayed byte counts. Per-thread Deflater
  * reuse keeps the 100 TB scan allocation-free. */
case class DeflateSize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_size"

  override protected def nullSafeEval(input: Any): Any =
    DeflateSize.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("deflateKernel", DeflateSize,
      DeflateSize.getClass.getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : DeflateSize = copy(child = newChild)
}

object DeflateSize {
  private final class Scratch {
    val deflater = new java.util.zip.Deflater(6, true)
    val buf = new Array[Byte](8192)
  }
  private val local = new ThreadLocal[Scratch] {
    override def initialValue(): Scratch = new Scratch
  }
  def compute(u: org.apache.spark.unsafe.types.UTF8String): Int = {
    val s = local.get()
    val d = s.deflater
    d.reset()
    d.setInput(u.getBytes)
    d.finish()
    var total = 0
    while (!d.finished()) total += d.deflate(s.buf)
    total
  }
}

/** HTML → visible text extraction — the step that runs BEFORE every
  * text-quality/dedup operator when the corpus arrives as raw crawl HTML.
  * Single forward pass (no DOM, no backtracking), with exactly-specified
  * "constrained extractor" semantics so a DuckDB regex chain can replay
  * it verbatim (oracle `text_html_extract`):
  *
  *  1. `<!--` … `-->` comments removed (unterminated → to end of input);
  *  2. `<script`/`<style` blocks (tag name at a word boundary) removed
  *     through the matching `</script[ws]*>` / `</style[ws]*>` close
  *     (unterminated → to end), case-insensitive;
  *  3. remaining tags `<[/!?]?[A-Za-z]…>` dropped (unclosed → to end);
  *     BLOCK-level tags (p, div, br, h1-h6, li, table cells, …) emit a
  *     newline so paragraph boundaries survive; inline tags emit nothing;
  *  4. entities decoded in text content only: the named set `&amp; &lt;
  *     &gt; &quot; &apos; &nbsp;` (case-sensitive, `&amp;` resolved in
  *     the same left-to-right pass so `&amp;lt;` → literal `&lt;`) plus
  *     numeric `&#NNN;`/`&#xHH;` (valid scalar values only; invalid or
  *     unterminated → literal `&`); decoded `<` is literal text, never
  *     re-parsed as a tag;
  *  5. whitespace collapsed: runs containing a newline (including
  *     block-tag newlines) → one `\n`, other runs → one space; trimmed.
  *
  * A bare `<` not opening a tag (`a < b`) is literal text. No nesting is
  * tracked — a constrained extractor, not a browser; hostile shapes
  * (tags split by comments, CDATA) degrade per the rules above and are
  * pinned by unit. Pure scan-side, one kernel call per document —
  * 100 TB-safe as a plain projection.
  */
case class HtmlExtractText(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "html_extract_text"

  override protected def nullSafeEval(input: Any): Any =
    HtmlExtractText.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("htmlKernel", HtmlExtractText,
      HtmlExtractText.getClass.getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : HtmlExtractText = copy(child = newChild)
}

object HtmlExtractText {
  import org.apache.spark.unsafe.types.UTF8String

  /** Tags treated as block boundaries (emit '\n'). Kept in sync with the
    * alternation in the `text_html_extract` oracle SQL. */
  private val blockTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("p", "div", "br", "hr", "h1", "h2", "h3", "h4", "h5", "h6", "li",
      "ul", "ol", "dl", "dt", "dd", "table", "thead", "tbody", "tfoot",
      "tr", "td", "th", "caption", "blockquote", "pre", "section",
      "article", "aside", "header", "footer", "nav", "form", "figure",
      "figcaption", "main", "address", "title").foreach(s.add)
    s
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private def lower(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  /** s starts with lit (ASCII, lit lowercase) at i, case-insensitively. */
  private def startsCi(s: String, i: Int, lit: String): Boolean = {
    if (i + lit.length > s.length) return false
    var k = 0
    while (k < lit.length) {
      if (lower(s.charAt(i + k)) != lit.charAt(k)) return false
      k += 1
    }
    true
  }

  /** Index just past the next `</name[ws]*>` (case-insensitive) at or
    * after i; length of s if none (unterminated block → removed to end). */
  private def findClose(s: String, i: Int, name: String): Int = {
    val lit = "</" + name
    var j = i
    while (j <= s.length - lit.length - 1) {
      if (startsCi(s, j, lit)) {
        var m = j + lit.length
        while (m < s.length && isWs(s.charAt(m))) m += 1
        if (m < s.length && s.charAt(m) == '>') return m + 1
      }
      j += 1
    }
    s.length
  }

  def compute(u: UTF8String): UTF8String = {
    val s = u.toString
    val n = s.length
    val out = new java.lang.StringBuilder(math.min(n, 1 << 16))
    // pending whitespace between emitted text runs: collapse to '\n' if
    // the run contained a newline (or block tag), else to one ' '; a run
    // before the first text char or after the last is dropped (trim).
    var pendSp = false
    var pendNl = false

    def flushWs(): Unit = {
      if (out.length > 0) {
        if (pendNl) out.append('\n') else if (pendSp) out.append(' ')
      }
      pendSp = false; pendNl = false
    }
    def emit(c: Char): Unit =
      if (isWs(c)) { pendSp = true; if (c == '\n') pendNl = true }
      else { flushWs(); out.append(c) }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (startsCi(s, i, "<!--")) {
          val k = s.indexOf("-->", i + 4)
          i = if (k < 0) n else k + 3
        } else if (startsCi(s, i, "<script") &&
            (i + 7 >= n || !isWordChar(s.charAt(i + 7)))) {
          i = findClose(s, i + 7, "script")
        } else if (startsCi(s, i, "<style") &&
            (i + 6 >= n || !isWordChar(s.charAt(i + 6)))) {
          i = findClose(s, i + 6, "style")
        } else {
          var j = i + 1
          val marker = if (j < n) s.charAt(j) else ' '
          if (j < n && (marker == '/' || marker == '!' || marker == '?'))
            j += 1
          if (j < n && isAsciiLetter(s.charAt(j))) {
            // tag: name = maximal [A-Za-z0-9] run; body to '>' (or end)
            val nameStart = j
            while (j < n && { val cj = s.charAt(j)
              isAsciiLetter(cj) || (cj >= '0' && cj <= '9') }) j += 1
            val isBlock = marker != '!' && marker != '?' &&
              blockTags.contains(
                s.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT))
            val k = s.indexOf('>', j)
            if (isBlock) emit('\n')
            i = if (k < 0) n else k + 1
          } else {
            emit('<'); i += 1
          }
        }
      } else if (c == '&') {
        if (s.startsWith("&lt;", i)) { emit('<'); i += 4 }
        else if (s.startsWith("&gt;", i)) { emit('>'); i += 4 }
        else if (s.startsWith("&quot;", i)) { emit('"'); i += 6 }
        else if (s.startsWith("&apos;", i)) { emit('\''); i += 6 }
        else if (s.startsWith("&nbsp;", i)) { emit(' '); i += 6 }
        else if (s.startsWith("&amp;", i)) { emit('&'); i += 5 }
        else if (s.startsWith("&#", i)) {
          // numeric scalar: &#123; or &#x1F600; — invalid/unterminated
          // stays a literal '&' (oracle HTML never generates these;
          // pinned by unit)
          var j = i + 2
          val hex = j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')
          if (hex) j += 1
          val digStart = j
          var cp = 0L
          var ok = true
          while (j < n && ok && {
            val d = s.charAt(j)
            val v =
              if (d >= '0' && d <= '9') d - '0'
              else if (hex && d >= 'a' && d <= 'f') d - 'a' + 10
              else if (hex && d >= 'A' && d <= 'F') d - 'A' + 10
              else -1
            if (v >= 0) { cp = cp * (if (hex) 16 else 10) + v; true }
            else false
          }) { if (cp > 0x10FFFFL) ok = false; j += 1 }
          val nd = j - digStart
          if (ok && nd > 0 && j < n && s.charAt(j) == ';' &&
              cp > 0 && cp <= 0x10FFFFL &&
              !(cp >= 0xD800L && cp <= 0xDFFFL)) {
            Character.toChars(cp.toInt).foreach(emit)
            i = j + 1
          } else { emit('&'); i += 1 }
        } else { emit('&'); i += 1 }
      } else { emit(c); i += 1 }
    }
    UTF8String.fromString(out.toString)
  }
}

object NativeFunctions {
  def textStats(c: Column): Column =
    ExpressionUtils.column(TextStats(ExpressionUtils.expression(c)))

  def normalizeNfc(c: Column): Column =
    ExpressionUtils.column(NormalizeNFC(ExpressionUtils.expression(c)))

  def minhashSignature(shingles: Column, numHashes: Int): Column =
    ExpressionUtils.column(MinHashSignature(
      ExpressionUtils.expression(shingles), numHashes))

  def shingleHashes(tokens: Column, n: Int): Column =
    ExpressionUtils.column(ShingleHashes(
      ExpressionUtils.expression(tokens), n))

  def minhashFromLongs(shingleHashes: Column, numHashes: Int): Column =
    ExpressionUtils.column(MinHashFromLongs(
      ExpressionUtils.expression(shingleHashes), numHashes))

  def simhash64(tokenHashes: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(tokenHashes)))

  def deflateSize(c: Column): Column =
    ExpressionUtils.column(DeflateSize(ExpressionUtils.expression(c)))

  def htmlExtractText(c: Column): Column =
    ExpressionUtils.column(HtmlExtractText(ExpressionUtils.expression(c)))

  def cosineSimilarity(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def dotProduct(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Per-document distinct 3-gram shingle hashes as ONE per-row kernel —
  * `array<long>` of `xxhash64(seed 42)` values, exactly the longs the
  * relational formulation (posexplode → lead window → concat_ws → xxhash64
  * → distinct) produces, but with ZERO shuffles: no window exchange, no
  * distinct exchange. Shingling becomes an embarrassingly parallel
  * projection — at 100 TB the postings build is a map-only stage.
  *
  * Byte-identity argument: tokens are split on the single space character,
  * so between consecutive tokens there is exactly one 0x20 byte — the raw
  * byte slice from the start of token i to the end of token i+2 IS the
  * `concat_ws(" ", tok_i, tok_i+1, tok_i+2)` string (empty tokens from
  * repeated spaces included), and UTF-8 continuation bytes can never be
  * 0x20, so byte-level splitting is multi-byte safe. Docs with <3 tokens
  * hash their whole text as the one shingle (the oracle's CASE).
  * Per-doc dedup is sort+unique over the (doc-length-bounded) local array.
  *
  * The generated code is one call into [[ShingleHashes.compute]] — a tiny
  * method, so whole-stage codegen stays intact and JIT-compiled (see
  * [[HyperplaneSignature]] for why giant generated methods go interpreted).
  */
case class ShingleHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    ShingleHashes.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  private val seed = 42L // Spark's xxhash64 default seed

  def compute(text: UTF8String): UnsafeArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    // token start offsets (a token starts at 0 and after every space)
    var nTokens = 1
    var i = 0
    while (i < n) { if (bytes(i) == ' ') nTokens += 1; i += 1 }
    if (nTokens < 3)
      return UnsafeArrayData.fromPrimitiveArray(
        Array(XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, n, seed)))
    val starts = new Array[Int](nTokens)
    val ends = new Array[Int](nTokens)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < n) {
      if (bytes(i) == ' ') { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = n
    val hashes = new Array[Long](nTokens - 2)
    var s = 0
    while (s < nTokens - 2) {
      val from = starts(s)
      val len = ends(s + 2) - from
      hashes(s) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + from, len, seed)
      s += 1
    }
    // per-doc distinct: sort + unique in place (doc-length-bounded)
    java.util.Arrays.sort(hashes)
    var w = 1
    var r = 1
    while (r < hashes.length) {
      if (hashes(r) != hashes(w - 1)) { hashes(w) = hashes(r); w += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (w == hashes.length) hashes else java.util.Arrays.copyOf(hashes, w))
  }
}

/** Frequency-weighted 64-bit SimHash of a document as ONE per-row kernel:
  * every space-split token occurrence (empty tokens included — exactly the
  * `explode(split(text, ' '))` row set) votes `xxhash64(token, seed 42)`'s
  * bits +1/-1 into 64 counters; bit b of the result is set when its vote
  * sum >= 0. Bit-identical to the relational formulation (explode → 64
  * conditional sums → when-chain pack) but with no explode and no
  * aggregate exchange — a map-only projection, like [[ShingleHashes]].
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override protected def nullSafeEval(v: Any): Any =
    SimHash64.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.SimHash64.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  private val seed = 42L

  def compute(text: UTF8String): Long = {
    val bytes = text.getBytes
    val n = bytes.length
    val votes = new Array[Int](64)
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + start, i - start, seed)
        var b = 0
        while (b < 64) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** All overlapping character trigrams of a document (with duplicates, in
  * order) as ONE per-row kernel — the rows `explode(transform(sequence(1,
  * length(text) - 2), i -> substring(text, i, 3)))` produces, but in one
  * O(n) pass: the HOF formulation is interpreted (no codegen) AND each
  * codepoint-indexed `substring` rescans the string from the start, going
  * quadratic per document (measured 3× the whole lm_score query). ASCII
  * fast path slices bytes directly; otherwise codepoint starts are
  * indexed once and windows are substring'd surrogate-aware, matching
  * Spark's codepoint `substring` semantics. Docs with <3 codepoints
  * return an empty array (the SQL guard `length >= 3` keeps parity).
  */
case class CharTrigrams(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.StringType,
    containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    CharTrigrams.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.CharTrigrams.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharTrigrams {
  def compute(text: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    var ascii = true
    var i = 0
    while (ascii && i < n) { if (bytes(i) < 0) ascii = false; i += 1 }
    val out: Array[Any] =
      if (ascii) {
        if (n < 3) Array.empty
        else {
          val arr = new Array[Any](n - 2)
          var k = 0
          while (k < n - 2) {
            arr(k) = UTF8String.fromBytes(bytes, k, 3)
            k += 1
          }
          arr
        }
      } else {
        val str = text.toString
        val cps = str.codePointCount(0, str.length)
        if (cps < 3) Array.empty
        else {
          // one pass to index every codepoint start (UTF-16 offsets)
          val starts = new Array[Int](cps + 1)
          var off = 0
          var c = 0
          while (c < cps) {
            starts(c) = off
            off += Character.charCount(str.codePointAt(off))
            c += 1
          }
          starts(cps) = str.length
          val arr = new Array[Any](cps - 2)
          var k = 0
          while (k < cps - 2) {
            arr(k) = UTF8String.fromString(str.substring(starts(k), starts(k + 3)))
            k += 1
          }
          arr
        }
      }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Raw-DEFLATE compressed byte length of a document as ONE per-row kernel
  * — the compression-ratio quality signal (Common Crawl-lineage heuristic:
  * text that deflates far below ~1:3 is boilerplate/repetition; far above
  * is high-entropy noise — both are low-quality tails worth filtering
  * before training). Level 9, no zlib header, single `setInput` +
  * `finish` pass; output length for a fixed input/level/strategy is a
  * deterministic function of the bundled zlib, making per-corpus
  * aggregates pinnable constants (the CMS/HLL pinned-oracle convention —
  * no SQL engine exposes deflate). Map-only projection; the ~8 KB scratch
  * buffer is reused across rows via a thread-local, and the Deflater is
  * `reset` rather than re-allocated (native zlib streams are expensive to
  * create per row).
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(v: Any): Any =
    DeflateLen.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.DeflateLen.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateLen {
  private final class Scratch {
    val deflater = new java.util.zip.Deflater(
      java.util.zip.Deflater.BEST_COMPRESSION, /* nowrap = */ true)
    val buf = new Array[Byte](8192)
  }
  private val scratch = ThreadLocal.withInitial[Scratch](() => new Scratch)

  def compute(text: UTF8String): Long = {
    val s = scratch.get()
    val d = s.deflater
    d.reset()
    d.setInput(text.getBytes)
    d.finish()
    var total = 0L
    while (!d.finished()) total += d.deflate(s.buf)
    total
  }
}

/** Average-hash band signature for perceptual near-dup — the whole
  * [[graft.operators.Multimodal.mmPhashNeardup]] hashing stage (8×8
  * strided sampling → double mean → four 16-bit threshold bands) as ONE
  * per-row O(n) kernel, `array<int>` of the 4 band values. Bit-identical
  * to the HOF formulation it replaces (`transform(sequence(0,63), i ->
  * ascii(substring(text, floor(i*length/64.0)+1, 1)))` → fold mean →
  * per-band bit pack): positions use the same int-multiply-then-
  * double-divide floor, the mean is the same exact ≤64×255 integer sum
  * over 64.0, and ties (px == mean) set the bit on both paths. The HOF
  * cascade was interpreted AND needed a repartition materialization
  * barrier to stop CollapseProject re-inlining the 64-substring
  * projection into every consumer (~128 re-evaluations per row without
  * it — see the measurement note in Multimodal); the kernel is one
  * codegen'd call, so the barrier and the posexplode_outer
  * InferFiltersFromConstraints workaround both become unnecessary.
  *
  * `ascii()` parity: Spark's ascii returns the FIRST CODE POINT of the
  * 1-char substring. The all-ASCII fast path reads the byte directly;
  * non-ASCII docs take the indexed-codepoint slow path ([[CharTrigrams]]'
  * approach) so the kernel stays correct beyond the ASCII fixture.
  * Empty text yields px = 0s, mean 0.0, and 0 >= 0.0 sets every bit —
  * exactly the HOF/oracle behavior.
  */
case class PhashBands(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    PhashBands.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.PhashBands.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PhashBands {
  def compute(text: UTF8String): UnsafeArrayData = {
    val bytes = text.getBytes
    val nBytes = bytes.length
    var ascii = true
    var i = 0
    while (ascii && i < nBytes) { if (bytes(i) < 0) ascii = false; i += 1 }
    val px = new Array[Int](64)
    if (ascii) {
      // char count == byte count; px[i] = byte at floor(i*n/64.0), 0 past end
      var k = 0
      while (k < 64) {
        val pos = math.floor((k * nBytes).toDouble / 64.0).toInt
        px(k) = if (pos < nBytes) bytes(pos).toInt else 0
        k += 1
      }
    } else {
      val nChars = text.numChars()
      var k = 0
      while (k < 64) {
        val pos = math.floor((k * nChars).toDouble / 64.0).toInt
        px(k) =
          if (pos < nChars) {
            val one = text.substring(pos, pos + 1).toString
            if (one.isEmpty) 0 else one.codePointAt(0)
          } else 0
        k += 1
      }
    }
    var sum = 0.0
    var k = 0
    while (k < 64) { sum += px(k); k += 1 }
    val mean = sum / 64.0
    val bands = new Array[Int](4)
    var b = 0
    while (b < 4) {
      var acc = 0
      var j = 0
      while (j < 16) {
        if (px(b * 16 + j) >= mean) acc += (1 << j)
        j += 1
      }
      bands(b) = acc
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(bands)
  }
}

object TextKernels {
  val shingleHashesName = "graft_shingle_hashes"
  val simhashName = "graft_simhash"
  val nfcName = "graft_nfc"
  val charTrigramsName = "graft_char_trigrams"
  val deflateLenName = "graft_deflate_len"
  val phashBandsName = "graft_phash_bands"

  /** Idempotent per-session registration; afterwards
    * `expr("graft_shingle_hashes(text)")` / `expr("graft_simhash(text)")`
    * resolve like built-ins. Guarded so query builders calling this on
    * every construction don't re-replace the functions (each replace
    * logged a "replaced a previously registered function" warning and
    * mutated the registry from otherwise-pure builders — ADVICE r3);
    * sessions created through [[graft.GraftExtensions]] already have both
    * and never hit the replace path.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(shingleHashesName)))
      reg.createOrReplaceTempFunction(
        shingleHashesName, exprs => ShingleHashes(exprs(0)), "built-in")
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(simhashName)))
      reg.createOrReplaceTempFunction(
        simhashName, exprs => SimHash64(exprs(0)), "built-in")
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(nfcName)))
      reg.createOrReplaceTempFunction(
        nfcName, exprs => NfcNormalize(exprs(0)), "built-in")
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(charTrigramsName)))
      reg.createOrReplaceTempFunction(
        charTrigramsName, exprs => CharTrigrams(exprs(0)), "built-in")
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(PairCombinations.name)))
      reg.createOrReplaceTempFunction(
        PairCombinations.name, exprs => PairCombinations(exprs(0)), "built-in")
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(deflateLenName)))
      reg.createOrReplaceTempFunction(
        deflateLenName, exprs => DeflateLen(exprs(0)), "built-in")
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(phashBandsName)))
      reg.createOrReplaceTempFunction(
        phashBandsName, exprs => PhashBands(exprs(0)), "built-in")
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(CdcCuts.name)))
      reg.createOrReplaceTempFunction(
        CdcCuts.name, exprs => CdcCuts(exprs(0)), "built-in")
  }
}

/** Content-defined-chunking cut positions as ONE per-row O(n) kernel —
  * `array<long>` of 1-based char positions where the trailing
  * [[CdcCuts.win]]-char window's md5 divides by [[CdcCuts.div]], with
  * the doc end always appended (every doc chunks completely). Replaces
  * the position-grid formulation (explode `sequence(8, length)` →
  * per-position `substring` + `md5` + `conv` filter) that materialized
  * one row PER CHARACTER of the corpus, each carrying the full text
  * through two projections — the boundary scan now happens inside the
  * row it came from, and only the ~len/div cut rows ever explode.
  *
  * Parity with the DuckDB oracle (which still recomputes boundaries
  * from `substr`+`md5` first principles — the gate independently
  * verifies this kernel): windows are CHAR-based like both engines'
  * substring, so char start byte offsets are tracked explicitly
  * (UTF-8 lead-byte detection — multi-byte text stays correct beyond
  * the ASCII fixture; `ChunkOpsSpec` pins a multibyte example); the
  * boundary value is the first 3 digest bytes as a 24-bit int, exactly
  * `CAST('0x' || substr(md5(w), 1, 6) AS BIGINT)`. MessageDigest is
  * thread-local ([[DeflateLen]]'s scratch discipline).
  */
case class CdcCuts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    CdcCuts.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.CdcCuts.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcCuts {
  val name = "graft_cdc_cuts"
  val win = 8
  val div = 32

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def compute(text: UTF8String): UnsafeArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    // char start byte offsets (+ sentinel n): UTF-8 lead-byte detection
    var nc = 0
    var i = 0
    while (i < n) { if ((bytes(i) & 0xC0) != 0x80) nc += 1; i += 1 }
    if (nc < win)
      return UnsafeArrayData.fromPrimitiveArray(Array(nc.toLong))
    val starts = new Array[Int](nc + 1)
    var c = 0
    i = 0
    while (i < n) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(nc) = n
    val md = md5.get()
    val cuts = new Array[Long](nc - win + 2)
    var k = 0
    c = win - 1
    while (c < nc) {
      val from = starts(c - win + 1)
      md.reset()
      md.update(bytes, from, starts(c + 1) - from)
      val d = md.digest()
      val v = ((d(0) & 0xFF) << 16) | ((d(1) & 0xFF) << 8) | (d(2) & 0xFF)
      if (v % div == 0) { cuts(k) = (c + 1).toLong; k += 1 }
      c += 1
    }
    if (k == 0 || cuts(k - 1) != nc.toLong) { cuts(k) = nc.toLong; k += 1 }
    UnsafeArrayData.fromPrimitiveArray(
      if (k == cuts.length) cuts else java.util.Arrays.copyOf(cuts, k))
  }
}

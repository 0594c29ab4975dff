package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup signatures.
  *
  * The pure-`functions._` forms in [[Dedup]] ([[Dedup.simhash64]],
  * [[Dedup.minhash]]) are the executable spec, but higher-order array
  * functions evaluate one interpreted lambda per element — 64 bit-votes ×
  * words × docs was ~12 s of the sf0.1 bench. These expressions compute
  * the identical values (asserted in DedupSpec) in one tight JVM pass per
  * row. `CodegenFallback` is fine: the cost is inside eval, not in
  * per-row dispatch.
  */

/** 64-bit SimHash of the word multiset of a string; bit-for-bit equal to
  * [[Dedup.simhash64]] (same `xxhash64` word hashes, seed 42). Fused
  * byte-walk: words are hashed straight off their text byte regions
  * (split-on-single-space ⇒ word string == byte region, as in
  * [[ShingleKernel]]) — no String[] split, no per-word allocation. */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(v: Any): Any =
    SimHash64Expr.simhash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.dedup.SimHash64Expr.simhash($t);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object SimHash64Expr {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  /** One pass: walk word byte regions, hash each (seed 42 — identical
    * to `xxhash64(word)` on the word string), vote per bit. */
  def simhash(text: UTF8String): Long = {
    val nb = text.numBytes()
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val votes = new Array[Int](64)
    var s = 0 // current word start
    var i = 0
    while (i <= nb) {
      if (i == nb || text.getByte(i) == 0x20) {
        val h = XXH64.hashUnsafeBytes(base, off + s, i - s, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        s = i + 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** MinHash signature (k seeded min-hashes) of a string-array column;
  * element-for-element equal to [[Dedup.minhash]] for non-empty input:
  * mh[i] = min over shingles of xxhash64(shingle, i) — i.e. seed-42 chain
  * hash(string) then hash(int i). Empty-input divergence (benign:
  * `Dedup.shingles` never yields an empty array): this expression returns
  * null, while the Column spec returns an array of k nulls (array_min of
  * an empty array is null per element). */
case class MinHashSignatureExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  // an empty shingle set has no signature (null), never k sentinels
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val h1 = XxHash64Function.hash(arr.getUTF8String(j), StringType, 42L)
      var i = 0
      while (i < k) {
        val hi = XxHash64Function.hash(i, IntegerType, h1)
        if (hi < mins(i)) mins(i) = hi
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Zero-allocation word-n-gram hash kernel. A shingle's string form
  * (`array_join(slice(split(text, " "), i+1, n), " ")`) is byte-for-byte
  * the original text region from word i's start to word i+n-1's end —
  * split-on-single-space loses exactly one separator byte between
  * consecutive words, and a space can never occur inside a UTF-8
  * multi-byte sequence. So each shingle's xxhash64 can be computed
  * straight off the text's bytes: no word array, no n-gram string, no
  * per-shingle allocation. At the sf1 rehearsal the string-building form
  * materialized ~20M shingle strings per corpus pass on the hottest
  * query of the suite (the shared exact-Jaccard pair build). */
object ShingleKernel {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  /** Distinct seed-42 xxhash64 values of the word `n`-grams of `text`,
    * first-occurrence order — element-identical to
    * `transform(Dedup.shingles(text, n), xxhash64)` (asserted in
    * DedupSpec), including the short-text edge (fewer than n words →
    * one shingle of all words) and empty-word runs. */
  def hashes(text: UTF8String, n: Int): ArrayData = {
    val nb = text.numBytes()
    var m = 1 // word count = separators + 1 (split keeps trailing empties)
    var i = 0
    while (i < nb) { if (text.getByte(i) == 0x20) m += 1; i += 1 }
    val ws = new Array[Int](m + 1) // word start offsets; ws(m) sentinel
    var w = 1
    i = 0
    while (i < nb) { if (text.getByte(i) == 0x20) { ws(w) = i + 1; w += 1 }; i += 1 }
    ws(m) = nb + 1 // virtual start just past a trailing separator
    val cnt = math.max(m - n, 0) + 1 // sequence(0, greatest(m - n, 0))
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val out = new Array[Long](cnt)
    val seen = new LongSet(cnt) // primitive open-addressing: no boxing
    var k = 0
    i = 0
    while (i < cnt) {
      val s = ws(i)
      val last = math.min(i + n, m) - 1 // slice() stops at the last word
      val e = ws(last + 1) - 1
      val h = XXH64.hashUnsafeBytes(base, off + s, e - s, 42L)
      if (seen.add(h)) { out(k) = h; k += 1 }
      i += 1
    }
    new GenericArrayData(
      if (k == cnt) out else java.util.Arrays.copyOf(out, k))
  }
}

/** Codegen'd distinct shingle-hash set of a text column: the fused form
  * of `transform(array_distinct(<n-gram strings>), xxhash64)` used by the
  * n-gram Jaccard and MinHash pipelines. Distinctness commutes with
  * hashing up to 2⁻⁶⁴ collisions — the same contract those pipelines
  * already carry for their join keys. */
case class ShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"shingle_hashes: n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes requires a string argument, got ${other.simpleString}")
    }
  }

  override protected def nullSafeEval(v: Any): Any =
    ShingleKernel.hashes(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.dedup.ShingleKernel.hashes($t, $n);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** MinHash signature straight from a shingle-HASH array: mh[i] = min over
  * hashes h of xxhash64(i, seed = h) — the identical chain
  * [[MinHashSignatureExpr]] computes after hashing the string (h is its
  * h1), so `minhashFromHashes(shingleHashes(text, n), k)` is
  * element-identical to `minhashFast(shingles(text, n), k)` (asserted in
  * DedupSpec) while skipping the string materialization entirely. */
case class MinHashFromHashesExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_from_hashes"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_from_hashes requires array<bigint>, got ${other.simpleString}")
    }
  }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h1 = arr.getLong(j)
      var i = 0
      while (i < k) {
        val hi = XxHash64Function.hash(i, IntegerType, h1)
        if (hi < mins(i)) mins(i) = hi
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Sign-random-projection band-key kernel, shared by interpreted eval and
  * generated code. Plane p's component for dimension i is ±1 from the
  * parity of `xxhash64(i, p)` (seed-42 chain: hash(p, hash(i, 42))) —
  * bit-identical to the Column spec [[graft.ann.Similarity.srpKey]]
  * (asserted in SimilaritySpec). The sign matrix is deterministic, so a
  * process-wide cache keyed by (planes, dim) is safe and makes the hot
  * loop a pure multiply-add over primitive arrays. */
object SrpKernel {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def signs(planes: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((planes, dim), { case (p0, d0) =>
      Array.tabulate(p0, d0) { (p, i) =>
        val h = XxHash64Function.hash(p, IntegerType,
          XxHash64Function.hash(i, IntegerType, 42L))
        // pmod(h, 2) == 0  ⇔  h is even
        if ((h & 1L) == 0L) 1.0 else -1.0
      }
    })

  /** The deterministic ±1 plane matrix (plane p, dim i ↦ parity of
    * xxhash64(p, xxhash64(i, 42))) — exposed so oracle-SQL builders can
    * embed the EXACT matrix the kernels use as a literal. */
  def signMatrix(planes: Int, dim: Int): Array[Array[Double]] =
    signs(planes, dim)

  /** Integer-grid variant of [[bandKeys]] for `array<long>` quantized
    * embeddings: the projection Σ qe(i)·s(p,i) accumulates in LONG, so
    * the sign bit is order-independent and replays exactly in SQL — the
    * construction that graduates SRP-LSH queries to hash-checked
    * oracles (same plane matrix, same key packing as the float path). */
  def bandKeysFp(a: ArrayData, bands: Int, bits: Int): ArrayData = {
    val v = a.toLongArray()
    val m = signs(bands * bits, v.length)
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var j = 0
      while (j < bits) {
        val s = m(b * bits + j)
        var proj = 0L
        var i = 0
        while (i < v.length) {
          proj += (if (s(i) > 0) v(i) else -v(i)); i += 1
        }
        if (proj > 0) key |= (1L << j)
        j += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }

  /** `bands` keys; band b's key packs the signs of planes
    * [b·bits, (b+1)·bits) into bits [0, bits). Band 0 with bits = 8 is
    * exactly the legacy single-key [[graft.ann.Similarity.srpKey]]. */
  def bandKeys(a: ArrayData, bands: Int, bits: Int): ArrayData = {
    val v = a.toDoubleArray()
    val m = signs(bands * bits, v.length)
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var j = 0
      while (j < bits) {
        val s = m(b * bits + j)
        var proj = 0.0
        var i = 0
        while (i < v.length) { proj += v(i) * s(i); i += 1 }
        if (proj > 0) key |= (1L << j)
        j += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }

  /** One 64-bit SRP fingerprint from planes [offset, offset+64). With
    * `offset` = the banding pass's plane count, the fingerprint bits
    * are INDEPENDENT of bucket membership — the property the in-bucket
    * hamming prune's miss bound relies on (conditioning on a band
    * collision must not tilt the fingerprint distribution). */
  def fpKey(a: ArrayData, offset: Int): Long = {
    val v = a.toDoubleArray()
    val m = signs(offset + 64, v.length)
    var key = 0L
    var j = 0
    while (j < 64) {
      val s = m(offset + j)
      var proj = 0.0
      var i = 0
      while (i < v.length) { proj += v(i) * s(i); i += 1 }
      if (proj > 0) key |= (1L << j)
      j += 1
    }
    key
  }
}

/** Codegen'd SRP banding of an `array<double>` embedding: `bands` 64-bit
  * keys of `bitsPerBand` sign bits each. This is the bucketing pass of the
  * LSH similarity/dedup operators — it runs once over the WHOLE corpus, so
  * unlike the per-pair scorer it must be scan-speed: the interpreted HOF
  * formulation (8 planes × dim boxed lambdas per row) measured ~100× slower
  * on the same shape. */
case class SrpBandsExpr(child: Expression, bands: Int, bitsPerBand: Int)
    extends UnaryExpression {
  require(bands > 0 && bitsPerBand > 0 && bitsPerBand <= 63,
    s"srp_bands: need 1..n bands of 1..63 bits, got $bands×$bitsPerBand")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_bands"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"srp_bands requires an array<double> argument, got ${other.simpleString}")
    }
  }

  override protected def nullSafeEval(v: Any): Any =
    SrpKernel.bandKeys(v.asInstanceOf[ArrayData], bands, bitsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.dedup.SrpKernel.bandKeys($a, $bands, $bitsPerBand);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** All ordered pairs of a sorted id array, PACKED one per long
  * ((id_a << 31) | id_b — ids must fit 31 bits, checked): the pair
  * generator of the exact-Jaccard postings self-join. One output array
  * allocation per posting row instead of the posexplode + per-position
  * `slice` copy chain (which allocated |ids| arrays per row), and the
  * packed key halves the bytes the pair-count shuffle moves — the
  * dominant wire volume of the ngram build at the ×100 rehearsal. */
case class PackedPairsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "packed_pairs"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"packed_pairs requires an array<bigint> argument, got ${other.simpleString}")
    }
  }

  override protected def nullSafeEval(v: Any): Any =
    PairKernel.packedPairs(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.dedup.PairKernel.packedPairs($a);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PairKernel {
  /** Max id representable in a packed pair (31 bits per side). The
    * fail-fast mirrors the broadcast guard convention: at a corpus
    * whose id space outgrows 31 bits, switch the pair key to the
    * two-column (id_a, id_b) form — wider wire, same plan shape. */
  val MaxId: Long = (1L << 31) - 1

  /** Max members per bucket BEFORE pair generation. Both kernels
    * materialize the bucket's n(n−1)/2 pairs in one allocation, so a
    * hot bucket — thousands of identical docs, the core dedup case —
    * must fail FAST and NAMED here rather than as a
    * NegativeArraySizeException (int sizing overflows at ~65k members)
    * or a silent task OOM (16k members is already a 1 GiB pair array).
    * The fix at that scale is upstream, not a bigger buffer: df-cap the
    * bucket like the ngram path's maxShingleDf, or salt the bucket key
    * — a bucket that hot is all-duplicates and needs no exact verify. */
  val MaxBucketMembers: Int = 1 << 14

  private def checkBucket(n: Int, kernel: String): Unit =
    if (n > MaxBucketMembers)
      throw new IllegalStateException(
        s"$kernel: bucket of $n members exceeds MaxBucketMembers=" +
          s"$MaxBucketMembers (the n(n-1)/2 pair array would be " +
          s"${n.toLong * (n - 1) / 2} entries); df-cap or salt the " +
          "bucket key upstream (see Dedup maxShingleDf)")

  def hammingPairs(a: ArrayData, maxDist: Int): ArrayData = {
    val n = a.numElements()
    checkBucket(n, "hamming_pairs")
    val ids = new Array[Long](n)
    val sigs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = a.getStruct(i, 2)
      ids(i) = row.getLong(0); sigs(i) = row.getLong(1)
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val d = java.lang.Long.bitCount(sigs(i) ^ sigs(j))
        if (d <= maxDist)
          out += new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(Array[Any](ids(i), ids(j), d))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** levenshtein(a, b) == 1, the two-pointer specialization: equal
    * lengths → exactly one substitution position; lengths off by one →
    * the shorter embeds in the longer with one skip. Identical strings
    * (distance 0) return false. O(min-len) per call. Takes JVM Strings:
    * the caller decodes each bucket member ONCE (O(B) decodes), not
    * once per pair (O(B²) — up to ~268M allocations at the 16k cap). */
  private def oneEditApart(x: String, y: String): Boolean = {
    val lx = x.length; val ly = y.length
    if (math.abs(lx - ly) > 1) return false
    if (lx == ly) {
      var diff = 0
      var i = 0
      while (i < lx) {
        if (x.charAt(i) != y.charAt(i)) { diff += 1; if (diff > 1) return false }
        i += 1
      }
      diff == 1
    } else {
      val (s, t) = if (lx < ly) (x, y) else (y, x)
      var i = 0; var j = 0; var skipped = false
      while (i < s.length) {
        if (s.charAt(i) == t.charAt(j)) { i += 1; j += 1 }
        else {
          if (skipped) return false
          skipped = true; j += 1
        }
      }
      true
    }
  }

  def editPairs(a: ArrayData): ArrayData = {
    val n = a.numElements()
    checkBucket(n, "edit_pairs")
    val ids = new Array[Long](n)
    val strs = new Array[UTF8String](n)
    // decode each member to a JVM String ONCE here — the pair loop
    // compares j chars per candidate, and a per-pair toString would be
    // O(B²) decodes/allocations on a B-member bucket
    val jstrs = new Array[String](n)
    var i = 0
    while (i < n) {
      val row = a.getStruct(i, 2)
      ids(i) = row.getLong(0); strs(i) = row.getUTF8String(1)
      jstrs(i) = strs(i).toString
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        // ids(i) == ids(j) (two rows, same id, different strings) must
        // not self-pair: the variant-join formulation this kernel
        // replaced filtered a_id < b_id, and input sorted by (id, s)
        // guarantees ids(i) <= ids(j) here, so != is exactly <
        if (ids(i) != ids(j) && oneEditApart(jstrs(i), jstrs(j)))
          out += new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(Array[Any](ids(i), strs(i), ids(j), strs(j)))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Packed pairs of a sorted (id, fp) bucket with the fingerprint
    * hamming verify fused into the emit loop — see
    * [[FpPackedPairsExpr]]. */
  def fpPackedPairs(a: ArrayData, maxDist: Int): ArrayData = {
    val n = a.numElements()
    checkBucket(n, "fp_packed_pairs")
    val ids = new Array[Long](n)
    val fps = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = a.getStruct(i, 2)
      ids(i) = row.getLong(0); fps(i) = row.getLong(1)
      if (ids(i) < 0 || ids(i) > MaxId)
        throw new IllegalArgumentException(
          s"fp_packed_pairs: ids must be in [0, $MaxId], got ${ids(i)} at $i")
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    i = 0
    while (i < n) {
      val hi = ids(i) << 31
      val fi = fps(i)
      var j = i + 1
      while (j < n) {
        if (java.lang.Long.bitCount(fi ^ fps(j)) <= maxDist)
          out += (hi | ids(j))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.result())
  }

  def packedPairs(a: ArrayData): ArrayData = {
    val v = a.toLongArray()
    val n = v.length
    checkBucket(n, "packed_pairs")
    // validate EVERY id, not just the endpoints: endpoint-only checking
    // is sound only for sorted input, and an unsorted caller with one
    // mid-array out-of-range id would silently bleed bits into id_a.
    // One compare per element — negligible next to the O(n²) emit.
    var c = 0
    while (c < n) {
      if (v(c) < 0 || v(c) > MaxId)
        throw new IllegalArgumentException(
          s"packed_pairs: ids must be in [0, $MaxId], got ${v(c)} at $c")
      c += 1
    }
    val out = new Array[Long](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val hi = v(i) << 31
      var j = i + 1
      while (j < n) { out(k) = hi | v(j); k += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** All edit-distance-1 pairs of one deletion-neighborhood bucket:
  * input `array<struct<id:long, s:string>>` sorted by id, output
  * `array<struct<a_id, a_name, b_id, b_name>>` holding ONLY the pairs
  * at levenshtein == 1. The verify moves INSIDE the generator (the
  * [[HammingPairsExpr]] pattern): a bucket of B members costs B²/2
  * two-pointer one-edit checks — each O(len), the distance-1
  * specialization of the banded DP — and emits just its true pairs, so
  * no candidate row stream ever hits the pair-distinct exchange. The
  * check compares UTF-16 units (exact for BMP text; the corpus and the
  * SQL oracles are ASCII). id order gives a_id < b_id for free. */
case class EditPairsExpr(child: Expression) extends UnaryExpression {
  private val outStruct = StructType(Seq(
    StructField("a_id", LongType, nullable = false),
    StructField("a_name", StringType, nullable = false),
    StructField("b_id", LongType, nullable = false),
    StructField("b_name", StringType, nullable = false)))
  override def dataType: DataType = ArrayType(outStruct, containsNull = false)
  override def prettyName: String = "edit_pairs"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(st: StructType, _)
          if st.fields.length == 2 &&
            st.fields(0).dataType == LongType &&
            st.fields(1).dataType == StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"edit_pairs requires array<struct<bigint, string>>, got ${other.simpleString}")
    }
  }

  override protected def nullSafeEval(v: Any): Any =
    PairKernel.editPairs(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.dedup.PairKernel.editPairs($a);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** All near pairs of one LSH bucket: input `array<struct<id:long,
  * sig:long>>` sorted by id, output `array<struct<id_a, id_b,
  * dist:int>>` holding ONLY the pairs at hamming(sig_a, sig_b) ≤
  * `maxDist`. The hamming verify moves INSIDE the generator kernel, so
  * a bucket of B members costs B²/2 register-level popcounts and emits
  * just its near pairs — no candidate row stream, no post-filter. The
  * emitted set is exactly what the explode + `bit_count(xor)` ≤ d
  * filter chain it replaces produced (id_a < id_b from the sort). */
case class HammingPairsExpr(child: Expression, maxDist: Int)
    extends UnaryExpression {
  require(maxDist >= 0 && maxDist <= 64, s"hamming_pairs: bad maxDist $maxDist")

  private val outStruct = StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("dist", IntegerType, nullable = false)))
  override def dataType: DataType = ArrayType(outStruct, containsNull = false)
  override def prettyName: String = "hamming_pairs"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(st: StructType, _)
          if st.fields.length == 2 &&
            st.fields(0).dataType == LongType &&
            st.fields(1).dataType == LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hamming_pairs requires array<struct<bigint, bigint>>, got ${other.simpleString}")
    }
  }

  override protected def nullSafeEval(v: Any): Any =
    PairKernel.hammingPairs(v.asInstanceOf[ArrayData], maxDist)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.dedup.PairKernel.hammingPairs($a, $maxDist);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** [[SrpBandsExpr]] on the 2⁻¹⁰ fixed-point grid (`array<long>` input):
  * integer projections, so band keys are exactly SQL-replayable. */
case class SrpBandsFpExpr(child: Expression, bands: Int, bitsPerBand: Int)
    extends UnaryExpression {
  require(bands > 0 && bitsPerBand > 0 && bitsPerBand <= 63,
    s"srp_bands_fp: need 1..n bands of 1..63 bits, got $bands×$bitsPerBand")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_bands_fp"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"srp_bands_fp requires an array<bigint> argument, got ${other.simpleString}")
    }
  }

  override protected def nullSafeEval(v: Any): Any =
    SrpKernel.bandKeysFp(v.asInstanceOf[ArrayData], bands, bitsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.dedup.SrpKernel.bandKeysFp($a, $bands, $bitsPerBand);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** 64-bit SRP fingerprint of an `array<double>` embedding from planes
  * [planeOffset, planeOffset+64) — the extra-signature companion to
  * [[SrpBandsExpr]] for in-bucket candidate pruning (pass the banding
  * pass's plane count as the offset so the two sign sets are disjoint). */
case class SrpFpExpr(child: Expression, planeOffset: Int)
    extends UnaryExpression {
  require(planeOffset >= 0, s"srp_fp: bad plane offset $planeOffset")

  override def dataType: DataType = LongType
  override def prettyName: String = "srp_fp"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"srp_fp requires an array<double> argument, got ${other.simpleString}")
    }
  }

  override protected def nullSafeEval(v: Any): Any =
    SrpKernel.fpKey(v.asInstanceOf[ArrayData], planeOffset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.dedup.SrpKernel.fpKey($a, $planeOffset);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Packed candidate pairs of one LSH bucket, pre-filtered INSIDE the
  * generator to fingerprint hamming ≤ `maxDist` (the
  * [[HammingPairsExpr]] verify-in-kernel pattern composed with
  * [[PackedPairsExpr]]'s one-long-per-pair wire shape): input a sorted
  * `array<struct<id, fp>>`, output `array<bigint>` of (id_a<<31)|id_b
  * for the surviving pairs only. The point is what never leaves the
  * bucket: sub-threshold junk candidates (the vast majority at scale —
  * band collisions of near-orthogonal vectors) are killed by one
  * XOR+popcount before the pair-distinct exchange and the two
  * embedding-array scorer joins, the wire-dominant stages of the
  * cosine dedup path. Same named fail-fasts as the sibling kernels. */
case class FpPackedPairsExpr(child: Expression, maxDist: Int)
    extends UnaryExpression {
  require(maxDist >= 0 && maxDist <= 64, s"fp_packed_pairs: bad maxDist $maxDist")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "fp_packed_pairs"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(st: StructType, _)
          if st.fields.length == 2 &&
            st.fields(0).dataType == LongType &&
            st.fields(1).dataType == LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"fp_packed_pairs requires array<struct<bigint, bigint>>, got ${other.simpleString}")
    }
  }

  override protected def nullSafeEval(v: Any): Any =
    PairKernel.fpPackedPairs(v.asInstanceOf[ArrayData], maxDist)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.dedup.PairKernel.fpPackedPairs($a, $maxDist);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object SignatureExprs {
  def simhash64Fast(text: Column): Column =
    CatalystBridge.column(SimHash64Expr(CatalystBridge.expression(text)))
  def minhashFast(shingles: Column, k: Int): Column =
    CatalystBridge.column(
      MinHashSignatureExpr(CatalystBridge.expression(shingles), k))
  def shingleHashes(text: Column, n: Int): Column =
    CatalystBridge.column(
      ShingleHashesExpr(CatalystBridge.expression(text), n))
  def minhashFromHashes(hashes: Column, k: Int): Column =
    CatalystBridge.column(
      MinHashFromHashesExpr(CatalystBridge.expression(hashes), k))
  def srpBands(emb: Column, bands: Int, bitsPerBand: Int): Column =
    CatalystBridge.column(
      SrpBandsExpr(CatalystBridge.expression(emb), bands, bitsPerBand))
  def srpBandsFp(qe: Column, bands: Int, bitsPerBand: Int): Column =
    CatalystBridge.column(
      SrpBandsFpExpr(CatalystBridge.expression(qe), bands, bitsPerBand))
  def packedPairs(ids: Column): Column =
    CatalystBridge.column(PackedPairsExpr(CatalystBridge.expression(ids)))
  def srpFp(emb: Column, planeOffset: Int): Column =
    CatalystBridge.column(SrpFpExpr(CatalystBridge.expression(emb), planeOffset))
  def fpPackedPairs(members: Column, maxDist: Int): Column =
    CatalystBridge.column(
      FpPackedPairsExpr(CatalystBridge.expression(members), maxDist))
  def hammingPairs(members: Column, maxDist: Int): Column =
    CatalystBridge.column(
      HammingPairsExpr(CatalystBridge.expression(members), maxDist))
  def editPairs(members: Column): Column =
    CatalystBridge.column(EditPairsExpr(CatalystBridge.expression(members)))
}

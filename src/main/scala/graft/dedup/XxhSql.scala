package graft.dedup

import java.util.concurrent.atomic.AtomicInteger

/** Emits DuckDB SQL that replays Spark's XXH64 (seed-42 `xxhash64`)
  * BIT-FOR-BIT — the machinery that graduates the signature-based dedup
  * queries (`dedup_minhash`, `dedup_simhash`) from rows-only checks to
  * full hash-checked oracles, the same methodology the sketch oracles
  * ([[graft.sketch.Bloom]] etc.) use for their arithmetic.
  *
  * Construction notes:
  *  - All values live in the UNSIGNED 2⁶⁴ domain as DuckDB HUGEINTs;
  *    [[toI64]]/[[toU64]] cross to/from Spark's signed longs. A 64×64
  *    multiply exceeds HUGEINT range, so [[mulmod]] splits the left
  *    operand at 2³² (products stay < 2⁹⁷ < 2¹²⁷).
  *  - Naive expression nesting duplicates subtrees exponentially (an
  *    avalanche alone copies its input 32×). Single-element
  *    `list_transform` lambdas act as LET-BINDINGS ([[let]]), keeping
  *    every emitted expression linear in the number of hash steps
  *    (~13 KB for the full string hash).
  *  - [[hashString]] assumes ASCII text (byte == code point, so
  *    `unicode(t[i:i])` extracts bytes) — true of the corpus by
  *    generation; the emitted SQL replays both XXH64 paths (≥ 32-byte
  *    stripes with four lanes + merge, and the short path) plus the
  *    8/4/1-byte tail rounds via one `list_reduce` fold each.
  *
  * Verified against Spark's values for: 1/3/11/33/50-byte strings, the
  * empty string, ints, longs, and the array⊕int chained form (the
  * MinHash band key) — and end-to-end by the dedup_minhash /
  * dedup_simhash oracle gates.
  */
object XxhSql {
  private val M64 = BigInt(1) << 64
  private val P1 = BigInt("9E3779B185EBCA87", 16)
  private val P2 = BigInt("C2B2AE3D27D4EB4F", 16)
  private val P3 = BigInt("165667B19E3779F9", 16)
  private val P4 = BigInt("85EBCA77C2B2AE63", 16)
  private val P5 = BigInt("27D4EB2F165667C5", 16)

  private val ctr = new AtomicInteger(0)

  /** LET: bind `expr` (a HUGEINT-domain scalar) to a fresh lambda var. */
  private def let(expr: String)(body: String => String): String = {
    val v = s"lv${ctr.incrementAndGet()}"
    s"list_transform([CAST(($expr) AS HUGEINT)], $v -> ${body(v)})[1]"
  }

  /** LET for a list-typed value (the byte array, the lane vector). */
  private def letList(expr: String)(body: String => String): String = {
    val v = s"ll${ctr.incrementAndGet()}"
    s"list_transform([$expr], $v -> ${body(v)})[1]"
  }

  /** (a·b) mod 2⁶⁴; splits `a` at 2³² so HUGEINT never overflows. */
  private def mulmod(a: String, b: String): String =
    let(a) { av => let(b) { bv =>
      s"((($av) % 4294967296) * ($bv) + ((($av) // 4294967296) * ($bv) % 4294967296) * 4294967296) % $M64"
    } }

  private def addmod(xs: String*): String =
    xs.map(x => s"($x)").mkString("(", " + ", s") % $M64")

  private def rotl(x: String, r: Int): String =
    let(x) { xv =>
      s"(($xv) * ${BigInt(1) << r} % $M64 + ($xv) // ${BigInt(1) << (64 - r)})"
    }

  private def xorU(a: String, b: String): String =
    s"xor(CAST(($a) AS HUGEINT), CAST(($b) AS HUGEINT))"

  private def shr(x: String, s: Int): String = s"(($x) // ${BigInt(1) << s})"

  /** XXH64 finalization avalanche. */
  private def fmix(h: String): String =
    let(h) { h0 =>
      let(mulmod(xorU(h0, shr(h0, 33)), P2.toString)) { h1 =>
        let(mulmod(xorU(h1, shr(h1, 29)), P3.toString)) { h2 =>
          xorU(h2, shr(h2, 32))
        }
      }
    }

  /** round(acc, input) = rotl31(acc + input·P2) · P1. */
  private def round(acc: String, inp: String): String =
    mulmod(rotl(addmod(acc, mulmod(inp, P2.toString)), 31), P1.toString)

  private def mergeRound(h: String, v: String): String =
    addmod(mulmod(xorU(h, round("0", v)), P1.toString), P4.toString)

  /** Signed-BIGINT expr → unsigned 2⁶⁴ HUGEINT domain. */
  def toU64(x: String): String =
    s"(CAST(($x) AS HUGEINT) % $M64 + $M64) % $M64"

  /** Unsigned 2⁶⁴ HUGEINT-domain expr → signed BIGINT (two's complement). */
  def toI64(x: String): String =
    let(x) { v =>
      s"CAST(CASE WHEN ($v) >= 9223372036854775808 THEN ($v) - $M64 ELSE ($v) END AS BIGINT)"
    }

  /** Spark `XXH64.hashInt(i, seed)`: `i` an int expr, `seed` in the
    * HUGEINT domain. This is the element hash of the MinHash chain
    * (`xxhash64(i)` seeded with the shingle hash). */
  def hashInt(i: String, seed: String): String =
    let(seed) { s =>
      let(xorU(addmod(s, ((P5 + 4) % M64).toString),
               mulmod(s"(($i) % 4294967296 + 4294967296) % 4294967296", P1.toString))) { h0 =>
        fmix(addmod(mulmod(rotl(h0, 23), P2.toString), P3.toString))
      }
    }

  /** Spark `XXH64.hashLong(l, seed)`, both in the HUGEINT domain. */
  def hashLong(l: String, seed: String): String =
    let(seed) { s =>
      let(xorU(addmod(s, ((P5 + 8) % M64).toString), round("0", l))) { h0 =>
        fmix(addmod(mulmod(rotl(h0, 27), P1.toString), P4.toString))
      }
    }

  /** Little-endian integer from `nbytes` bytes of list var `bsv`
    * starting at 0-based offset expr `start`. */
  private def leChunk(bsv: String, start: String, nbytes: Int): String =
    (0 until nbytes).map { j =>
      s"($bsv)[($start) + ${j + 1}] * ${BigInt(1) << (8 * j)}"
    }.mkString("(", " + ", ")")

  /** Spark `xxhash64(t)` (seed 42) of an ASCII string expr `t`, result
    * in the HUGEINT domain. Full XXH64: 32-byte stripes over four lanes
    * with rotl-merge when len ≥ 32, else seed + P5; then the 8-, 4- and
    * 1-byte tail rounds; then the avalanche. */
  def hashString(t: String, seed: Long = 42L): String = {
    val v1 = (seed + P1 + P2) % M64
    val v2 = (seed + P2) % M64
    val v3 = BigInt(seed) % M64
    val v4 = ((BigInt(seed) - P1) % M64 + M64) % M64
    val bytes =
      s"list_transform(range(1, length($t) + 1), bi -> CAST(unicode(($t)[bi:bi]) AS HUGEINT))"
    letList(bytes) { bsv =>
      val n = s"len($bsv)"
      val nstripes = s"(($n) // 32)"
      val stripes =
        s"list_transform(range(0, $nstripes), si -> ($bsv)[CAST(si*32 + 1 AS BIGINT) : CAST(si*32 + 32 AS BIGINT)])"
      val stripeLambda = "(a, x) -> [" + (0 until 4).map { k =>
        round(s"a[${k + 1}]", leChunk("x", (8 * k).toString, 8))
      }.mkString(", ") + "]"
      val lanes =
        s"list_reduce([[CAST($v1 AS HUGEINT), $v2, $v3, $v4]] || $stripes, $stripeLambda)"
      def merged(lv: String): String = {
        var h = addmod(rotl(s"($lv)[1]", 1), rotl(s"($lv)[2]", 7),
          rotl(s"($lv)[3]", 12), rotl(s"($lv)[4]", 18))
        for (k <- 0 until 4) h = mergeRound(h, s"($lv)[${k + 1}]")
        h
      }
      val h0 = addmod(
        s"CASE WHEN ($n) >= 32 THEN ${letList(lanes)(merged)} " +
          s"ELSE CAST(${(seed + P5) % M64} AS HUGEINT) END",
        s"CAST(($n) AS HUGEINT)")
      val p = s"(($n) // 32 * 32)"
      val n8 = s"((($n) % 32) // 8)"
      val chunks8 =
        s"list_transform(range(0, $n8), ci -> ($bsv)[CAST($p + ci*8 + 1 AS BIGINT) : CAST($p + ci*8 + 8 AS BIGINT)])"
      val q = s"($p + $n8 * 8)"
      val chunk4 =
        s"CASE WHEN ($n) - $q >= 4 THEN [($bsv)[CAST($q + 1 AS BIGINT) : CAST($q + 4 AS BIGINT)]] " +
          "ELSE CAST([] AS HUGEINT[][]) END"
      val q2 = s"($q + CASE WHEN ($n) - $q >= 4 THEN 4 ELSE 0 END)"
      val singles =
        s"list_transform(range(CAST($q2 AS BIGINT), CAST($n AS BIGINT)), si2 -> [($bsv)[si2 + 1]])"
      val tailLambda = "(a, x) -> CASE len(x) WHEN 8 THEN [" +
        addmod(mulmod(rotl(xorU("a[1]", round("0", leChunk("x", "0", 8))), 27),
          P1.toString), P4.toString) +
        "] WHEN 4 THEN [" +
        addmod(mulmod(rotl(xorU("a[1]", mulmod(leChunk("x", "0", 4), P1.toString)), 23),
          P2.toString), P3.toString) +
        "] ELSE [" +
        mulmod(rotl(xorU("a[1]", mulmod("x[1]", P5.toString)), 11), P1.toString) +
        "] END"
      val tail = let(h0) { h =>
        s"list_reduce([[$h]] || $chunks8 || $chunk4 || $singles, $tailLambda)[1]"
      }
      fmix(tail)
    }
  }
}

package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  * [[Dedup.simhash64]] (same `xxhash64` word hashes, seed 42). */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(v: Any): Any = {
    // same tokenization as split(text, " "): Java regex, keep empties
    val words = v.asInstanceOf[UTF8String].toString.split(" ", -1)
    val votes = new Array[Int](64)
    var wi = 0
    while (wi < words.length) {
      val h = XxHash64Function.hash(
        UTF8String.fromString(words(wi)), StringType, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      wi += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
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

object SignatureExprs {
  def simhash64Fast(text: Column): Column =
    CatalystBridge.column(SimHash64Expr(CatalystBridge.expression(text)))
  def minhashFast(shingles: Column, k: Int): Column =
    CatalystBridge.column(
      MinHashSignatureExpr(CatalystBridge.expression(shingles), k))
}

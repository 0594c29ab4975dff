package graft.dedup

/** Open-addressed primitive hash structures for the per-row text
  * kernels. The java.util boxed forms allocate one Long per insert —
  * measurable on kernels that run once per document over the whole
  * corpus ([[ShingleKernel]], [[graft.text.NgramRepStatsExpr]]). Keys
  * are already xxhash64 outputs, so the identity-fold index is as good
  * as a rehash. Linear probing, power-of-2 capacity, load ≤ 0.5; 0 is
  * the empty sentinel with an explicit has-zero slot.
  */
final class LongSet(expected: Int) {
  private[this] var cap = LongHash.capacityFor(expected)
  private[this] var mask = cap - 1
  private[this] var keys = new Array[Long](cap)
  private[this] var n = 0
  private[this] var hasZero = false

  /** True iff `k` was newly added. */
  def add(k: Long): Boolean = {
    if (k == 0L) {
      if (hasZero) false else { hasZero = true; n += 1; true }
    } else {
      var i = LongHash.fold(k) & mask
      while (keys(i) != 0L) {
        if (keys(i) == k) return false
        i = (i + 1) & mask
      }
      keys(i) = k
      n += 1
      if ((n - (if (hasZero) 1 else 0)) * 2 > cap) grow()
      true
    }
  }

  def size: Int = n

  private def grow(): Unit = {
    val old = keys
    cap <<= 1; mask = cap - 1
    keys = new Array[Long](cap)
    var j = 0
    while (j < old.length) {
      val k = old(j)
      if (k != 0L) {
        var i = LongHash.fold(k) & mask
        while (keys(i) != 0L) i = (i + 1) & mask
        keys(i) = k
      }
      j += 1
    }
  }
}

/** long → count map that only ever needs increment-and-report-max. */
final class LongCounter(expected: Int) {
  private[this] var cap = LongHash.capacityFor(expected)
  private[this] var mask = cap - 1
  private[this] var keys = new Array[Long](cap)
  private[this] var cnts = new Array[Int](cap)
  private[this] var n = 0
  private[this] var zeroCnt = 0

  /** Increment `k`'s count and return the new count. */
  def inc(k: Long): Int = {
    if (k == 0L) { zeroCnt += 1; zeroCnt }
    else {
      var i = LongHash.fold(k) & mask
      while (keys(i) != 0L && keys(i) != k) i = (i + 1) & mask
      if (keys(i) == 0L) {
        if ((n + 1) * 2 > cap) { // grow BEFORE inserting so i stays valid
          grow()
          i = LongHash.fold(k) & mask
          while (keys(i) != 0L) i = (i + 1) & mask
        }
        keys(i) = k; n += 1
      }
      cnts(i) += 1
      cnts(i)
    }
  }

  private def grow(): Unit = {
    val ok = keys; val oc = cnts
    cap <<= 1; mask = cap - 1
    keys = new Array[Long](cap); cnts = new Array[Int](cap)
    var j = 0
    while (j < ok.length) {
      val k = ok(j)
      if (k != 0L) {
        var i = LongHash.fold(k) & mask
        while (keys(i) != 0L) i = (i + 1) & mask
        keys(i) = k; cnts(i) = oc(j)
      }
      j += 1
    }
  }
}

object LongHash {
  /** Smallest power of two ≥ max(2·expected, 16). */
  def capacityFor(expected: Int): Int = {
    var c = 16
    val target = math.max(expected, 8)
    while ((c >> 1) < target) c <<= 1
    c
  }

  /** Index fold for already-mixed (xxhash64) keys. */
  @inline def fold(k: Long): Int = (k ^ (k >>> 32)).toInt
}

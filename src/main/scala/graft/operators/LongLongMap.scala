package graft.operators

/** Minimal primitive-long open-addressing hash map (linear probing,
  * power-of-two capacity, ≤ 0.5 load factor) for the per-partition
  * union-find in [[Dedup.connectedComponents]].
  *
  * The boxed `java.util.HashMap[Long, Long]` it replaces costs
  * ~50–90 bytes per entry (two boxes + an Entry node, all GC-visible);
  * at the operator's 2M-rows-per-partition design point that is
  * hundreds of MB of heap per concurrently running task. This map is
  * two long arrays plus an occupancy byte — ~34 bytes per entry at the
  * steady-state load factor, zero per-entry allocation — so the
  * documented "2·rowsPerPartition entries" memory note is an honest
  * heap bound again.
  *
  * Not thread-safe; single-task use only. Updating an EXISTING key
  * never moves slots or resizes, so interleaving updates with slot
  * iteration (the contraction's path-compress-while-emitting pattern)
  * is safe; inserting a new key during iteration is not.
  */
private[operators] final class LongLongMap(initialCapacity: Int = 1 << 12) {
  // capacity arithmetic in Long, clamped at 2^30 slots (2^29 entries —
  // far past any sane rowsPerPartition): Int-doubling past 2^30 would
  // go negative and throw NegativeArraySizeException mid-task
  private var cap = Integer.highestOneBit(math.min(1L << 30,
    math.max(16L, initialCapacity.toLong) * 2 - 1).toInt)
  private var mask = cap - 1
  private var keys = new Array[Long](cap)
  private var vals = new Array[Long](cap)
  private var used = new Array[Boolean](cap)
  private var n = 0

  def size: Int = n

  // Fibonacci mixing: sequential ids spread uniformly across slots
  private def slot(k: Long, m: Int): Int =
    (((k * 0x9E3779B97F4A7C15L) >>> 40) ^ k).toInt & m

  def getOrDefault(k: Long, default: Long): Long = {
    var i = slot(k, mask)
    while (used(i)) {
      if (keys(i) == k) return vals(i)
      i = (i + 1) & mask
    }
    default
  }

  def put(k: Long, v: Long): Unit = {
    var i = slot(k, mask)
    while (used(i)) {
      if (keys(i) == k) { vals(i) = v; return }
      i = (i + 1) & mask
    }
    keys(i) = k; vals(i) = v; used(i) = true; n += 1
    if (n * 2 > cap) grow()
  }

  private def grow(): Unit = {
    if (cap == (1 << 30))
      throw new IllegalStateException(
        "LongLongMap exceeded 2^29 entries in one partition — lower " +
          "rowsPerPartition so per-partition state fits in memory")
    val oldKeys = keys; val oldVals = vals; val oldUsed = used
    cap <<= 1; mask = cap - 1
    keys = new Array[Long](cap); vals = new Array[Long](cap)
    used = new Array[Boolean](cap)
    var i = 0
    while (i < oldKeys.length) {
      if (oldUsed(i)) {
        var j = slot(oldKeys(i), mask)
        while (used(j)) j = (j + 1) & mask
        keys(j) = oldKeys(i); vals(j) = oldVals(i); used(j) = true
      }
      i += 1
    }
  }

  /** Lazy iterator over the current keys. Safe to interleave with
    * value UPDATES (slots never move); not with inserts. */
  def keysIterator: Iterator[Long] = new Iterator[Long] {
    private var i = advance(0)
    private def advance(from: Int): Int = {
      var j = from
      while (j < cap && !used(j)) j += 1
      j
    }
    def hasNext: Boolean = i < cap
    def next(): Long = { val k = keys(i); i = advance(i + 1); k }
  }
}

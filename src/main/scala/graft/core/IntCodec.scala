package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** Posting-list integer compression: VByte varints + FOR bit-packing.
  *
  * Same roles as Lucene 8.11's codecs
  * [B lucene/core/src/java/org/apache/lucene/store/DataOutput.java#writeVInt]
  * [B lucene/core/src/java/org/apache/lucene/codecs/lucene84/ForUtil.java]
  * but a self-describing Scala layout: byte 0 is a header — `0` means VByte
  * payload, `1..32` means FOR at that bit width (values packed LSB-first
  * into little-endian longs). Full 128-doc blocks compress with FOR; tail
  * blocks and skewed-value arrays fall back to VByte (SURVEY.md §2.4).
  * Runs entirely inside mapPartitions/flatMapGroups — bytes in a BinaryType
  * column, invisible to Catalyst by design.
  */
object IntCodec {

  val ForHeaderMax = 32

  // ---- VByte -------------------------------------------------------------

  def vbyteEncode(values: Array[Int], out: ByteBuffer): Unit = {
    var i = 0
    while (i < values.length) {
      var v = values(i)
      require(v >= 0, s"vbyte supports non-negative ints only: $v")
      while ((v & ~0x7f) != 0) {
        out.put(((v & 0x7f) | 0x80).toByte)
        v >>>= 7
      }
      out.put(v.toByte)
      i += 1
    }
  }

  def vbyteDecode(in: ByteBuffer, count: Int, dst: Array[Int]): Unit = {
    var i = 0
    while (i < count) {
      var b = in.get()
      var v = b & 0x7f
      var shift = 7
      while ((b & 0x80) != 0) {
        b = in.get()
        v |= (b & 0x7f) << shift
        shift += 7
      }
      dst(i) = v
      i += 1
    }
  }

  // ---- FOR (fixed bit-width packing) --------------------------------------

  def bitsRequired(maxValue: Int): Int = {
    require(maxValue >= 0)
    math.max(1, 32 - Integer.numberOfLeadingZeros(maxValue))
  }

  /** Pack `values` at `bits` bits each, LSB-first into little-endian longs. */
  def forEncode(values: Array[Int], bits: Int, out: ByteBuffer): Unit = {
    var acc = 0L
    var accBits = 0
    var i = 0
    while (i < values.length) {
      val v = values(i).toLong & 0xffffffffL
      acc |= v << accBits
      accBits += bits
      if (accBits >= 64) {
        out.order(ByteOrder.LITTLE_ENDIAN).putLong(acc)
        accBits -= 64
        acc = if (accBits == 0) 0L else v >>> (bits - accBits)
      }
      i += 1
    }
    if (accBits > 0) out.order(ByteOrder.LITTLE_ENDIAN).putLong(acc)
  }

  def forDecode(in: ByteBuffer, bits: Int, count: Int, dst: Array[Int]): Unit = {
    in.order(ByteOrder.LITTLE_ENDIAN)
    val mask = if (bits == 32) 0xffffffffL else (1L << bits) - 1L
    var acc = 0L
    var accBits = 0
    var i = 0
    while (i < count) {
      if (accBits < bits) {
        val next = in.getLong()
        val v = (acc | (next << accBits)) & mask
        dst(i) = v.toInt
        acc = next >>> (bits - accBits)
        accBits = 64 - (bits - accBits)
      } else {
        dst(i) = (acc & mask).toInt
        acc >>>= bits
        accBits -= bits
      }
      i += 1
    }
  }

  // ---- Self-describing array codec ----------------------------------------

  /** Max exception share patched FOR will tolerate: the patch width is the
    * smallest b whose exception count is <= max(7, n/16) — Lucene's
    * PForUtil allows at most 7 exceptions per 128-value block; the n/16
    * term generalizes that density to this codec's variable-length arrays
    * [B lucene/core/src/java/org/apache/lucene/codecs/lucene84/PForUtil.java].
    */
  @inline private def maxExceptions(n: Int): Int = math.max(7, n / 16)

  @inline private def vbyteLen(v: Int): Int =
    math.max(1, (38 - Integer.numberOfLeadingZeros(v)) / 7)

  /** Encode an int array: plain FOR, PATCHED FOR (header 33..64 = patched
    * at b = header-32: low bits packed for every value, the few outliers
    * patched from a VByte exception list), or VByte — whichever is
    * smallest. A single skewed value no longer forces the whole array to
    * its bit width (the 10-25%% postings-size tax the r4 verdict measured
    * against Lucene's PForUtil). Sizes are computed up front so exactly
    * ONE buffer of exact size is allocated (this runs per posting block
    * across the whole merge shuffle).
    */
  def encode(values: Array[Int]): Array[Byte] = {
    if (values.isEmpty) return Array(0.toByte)
    val n = values.length
    var maxV = 0
    var minV = 0
    var vbBytes = 1
    val widthCounts = new Array[Int](33)
    var i = 0
    while (i < n) {
      val v = values(i)
      if (v > maxV) maxV = v
      if (v < minV) minV = v
      vbBytes += vbyteLen(v)
      widthCounts(if (v == 0) 1 else 32 - Integer.numberOfLeadingZeros(v)) += 1
      i += 1
    }
    // a negative value would silently truncate under FOR bit-packing
    // (bitsRequired sees only maxV) — fail loudly instead
    require(minV >= 0, s"IntCodec.encode supports non-negative ints only: $minV")
    val bits = bitsRequired(maxV)
    val forBytes = 1 + 8 * ((n.toLong * bits + 63) / 64).toInt

    // patched candidate: smallest width whose outlier count fits the cap
    var pforBytes = Int.MaxValue
    var pb = 0
    if (bits > 1) {
      var covered = 0
      var b = 1
      var chosen = -1
      while (b < bits && chosen < 0) {
        covered += widthCounts(b)
        if (n - covered <= maxExceptions(n)) chosen = b
        else b += 1
      }
      if (chosen > 0) {
        // exact size: header + vbyte(excCount) + packed base + exceptions
        // as (vbyte posDelta, vbyte highBits)
        var exc = 0
        var excBytes = 0
        var prevPos = 0
        i = 0
        while (i < n) {
          if ((values(i) >>> chosen) != 0) {
            excBytes += vbyteLen(i - prevPos) + vbyteLen(values(i) >>> chosen)
            prevPos = i
            exc += 1
          }
          i += 1
        }
        pforBytes = 1 + vbyteLen(exc) +
          8 * ((n.toLong * chosen + 63) / 64).toInt + excBytes
        pb = chosen
      }
    }

    if (pforBytes < forBytes && pforBytes < vbBytes) {
      val out = ByteBuffer.allocate(pforBytes)
      out.put((32 + pb).toByte)
      var exc = 0
      i = 0
      while (i < n) { if ((values(i) >>> pb) != 0) exc += 1; i += 1 }
      vbyteEncode(Array(exc), out)
      // base payload: low pb bits of EVERY value
      val mask = (1 << pb) - 1
      val base = new Array[Int](n)
      i = 0
      while (i < n) { base(i) = values(i) & mask; i += 1 }
      forEncode(base, pb, out)
      var prevPos = 0
      i = 0
      while (i < n) {
        val high = values(i) >>> pb
        if (high != 0) {
          vbyteEncode(Array(i - prevPos, high), out)
          prevPos = i
        }
        i += 1
      }
      out.array()
    } else if (forBytes < vbBytes) {
      val out = ByteBuffer.allocate(forBytes)
      out.put(bits.toByte)
      forEncode(values, bits, out)
      out.array()
    } else {
      val out = ByteBuffer.allocate(vbBytes)
      out.put(0.toByte)
      vbyteEncode(values, out)
      out.array()
    }
  }

  def decode(bytes: Array[Byte], count: Int): Array[Int] = {
    val dst = new Array[Int](count)
    if (count == 0) return dst
    val in = ByteBuffer.wrap(bytes)
    val header = in.get()
    if (header == 0) vbyteDecode(in, count, dst)
    else if (header <= ForHeaderMax) forDecode(in, header.toInt, count, dst)
    else {
      // patched FOR: base payload at b bits, then VByte exception patches
      val b = header - 32
      val excArr = new Array[Int](1)
      vbyteDecode(in, 1, excArr)
      forDecode(in, b, count, dst)
      var pos = 0
      var e = 0
      val pair = new Array[Int](2)
      while (e < excArr(0)) {
        vbyteDecode(in, 2, pair)
        pos += pair(0)
        dst(pos) |= pair(1) << b
        e += 1
      }
    }
    dst
  }
}

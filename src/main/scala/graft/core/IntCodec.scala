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

  /** Encode an int array: FOR when that packs tighter, else VByte.
    * Sizes are computed up front so exactly ONE buffer of exact size is
    * allocated (this runs per posting block across the whole merge shuffle).
    */
  def encode(values: Array[Int]): Array[Byte] = {
    if (values.isEmpty) return Array(0.toByte)
    var maxV = 0
    var minV = 0
    var vbBytes = 1
    var i = 0
    while (i < values.length) {
      val v = values(i)
      if (v > maxV) maxV = v
      if (v < minV) minV = v
      vbBytes += math.max(1, (38 - Integer.numberOfLeadingZeros(v)) / 7)
      i += 1
    }
    // a negative value would silently truncate under FOR bit-packing
    // (bitsRequired sees only maxV) — fail loudly instead
    require(minV >= 0, s"IntCodec.encode supports non-negative ints only: $minV")
    val bits = bitsRequired(maxV)
    val forBytes = 1 + 8 * ((values.length * bits + 63) / 64)
    if (forBytes < vbBytes) {
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
    else forDecode(in, header.toInt, count, dst)
    dst
  }
}

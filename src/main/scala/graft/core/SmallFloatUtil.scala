package graft.core

/** Lucene-compatible lossy small-int encoding used for doc-length norms.
  *
  * Reimplements (from the published algorithm, not copied code) the
  * `intToByte4`/`byte4ToInt` pair of Lucene 8.11's
  * `org.apache.lucene.util.SmallFloat`
  * [B lucene/core/src/java/org/apache/lucene/util/SmallFloat.java]:
  * a monotone float-like encoding of non-negative ints keeping 4
  * significant bits (1 implicit + 3 mantissa) and a 5-bit exponent.
  * BM25 scores are rank-sensitive to exactly this quantization
  * (SURVEY.md §1.1 D6, §7.4-2), so the engine quantizes doc lengths
  * through this before any scoring.
  */
object SmallFloatUtil {

  /** Encode a non-negative int to the 4-significant-bit byte code. */
  def intToByte4(i: Int): Byte = {
    require(i >= 0, s"only supports positive values: $i")
    val numBits = 32 - Integer.numberOfLeadingZeros(i)
    if (numBits < 4) {
      // subnormal: values 0..7 stored directly
      i.toByte
    } else {
      val shift = numBits - 4
      var encoded = i >>> shift
      encoded &= 0x07 // drop the implicit leading 1 bit
      encoded |= (shift + 1) << 3 // exponent; 0 reserved for subnormals
      require(encoded <= 255, s"cannot encode $i as a byte")
      encoded.toByte
    }
  }

  /** Decode the byte code back to the (quantized) int. Codes above 231 are
    * unreachable from `intToByte4(int)` (they decode past Int.MaxValue) and
    * saturate — they only exist so the full 256-entry norm table can build.
    */
  def byte4ToInt(b: Byte): Int = {
    val i = java.lang.Byte.toUnsignedInt(b)
    val bits = (i & 0x07).toLong
    val shift = (i >>> 3) - 1
    val decoded = if (shift == -1) bits else (bits | 0x08L) << shift
    math.min(decoded, Int.MaxValue.toLong).toInt
  }

  /** The quantized doc length an int round-trips to (encode then decode). */
  def quantize(i: Int): Int = byte4ToInt(intToByte4(i))

  /** Lucene's LENGTH_TABLE: decoded length for every possible norm byte. */
  val LengthTable: Array[Int] = Array.tabulate(256)(i => byte4ToInt(i.toByte))
}

package graft.core

/** Lucene-compatible lossy small-int encoding used for doc-length norms.
  *
  * Reimplements (from the published algorithm, not copied code) the
  * `intToByte4`/`byte4ToInt` pair of Lucene 8.11's
  * `org.apache.lucene.util.SmallFloat`
  * [B lucene/core/src/java/org/apache/lucene/util/SmallFloat.java]:
  * ints 0..23 are stored exactly in the 24 "free" byte codes
  * (NUM_FREE_VALUES = 255 - MAX_INT4, where MAX_INT4 = longToInt4(2^31-1)
  * = 231), and larger values store 24 + int4(i - 24) — a monotone
  * float-like code keeping 4 significant bits (1 implicit + 3 mantissa)
  * with a 5-bit exponent. Net effect: doc lengths 0..40 are exact, then
  * buckets widen geometrically. BM25 scores are rank-sensitive to exactly
  * this quantization (SURVEY.md §1.1 D6, §7.4-2), so the engine quantizes
  * doc lengths through this before any scoring, and the DuckDB oracle SQL
  * mirrors the same bucketing (SparkEntry.bm25Sql qdl CTE).
  */
object SmallFloatUtil {

  /** 255 - MAX_INT4: byte codes reserved for exact small lengths. */
  val NumFreeValues = 24

  /** Lucene SmallFloat.longToInt4: 4 significant bits + 5-bit exponent. */
  private def longToInt4(i: Long): Int = {
    val numBits = 64 - java.lang.Long.numberOfLeadingZeros(i)
    if (numBits < 4) {
      // subnormal: values 0..7 stored directly
      i.toInt
    } else {
      val shift = numBits - 4
      var encoded = (i >>> shift).toInt
      encoded &= 0x07 // drop the implicit leading 1 bit
      encoded |= (shift + 1) << 3 // exponent; 0 reserved for subnormals
      encoded
    }
  }

  /** Inverse of longToInt4 (lossy: returns the bucket floor). */
  private def int4ToLong(i: Int): Long = {
    val bits = (i & 0x07).toLong
    val shift = (i >>> 3) - 1
    if (shift == -1) bits else (bits | 0x08L) << shift
  }

  /** Encode a non-negative int exactly like Lucene's SmallFloat.intToByte4. */
  def intToByte4(i: Int): Byte = {
    require(i >= 0, s"only supports positive values: $i")
    if (i < NumFreeValues) i.toByte
    else {
      val encoded = NumFreeValues + longToInt4((i - NumFreeValues).toLong)
      require(encoded <= 255, s"cannot encode $i as a byte")
      encoded.toByte
    }
  }

  /** Decode the byte code back to the (quantized) int. Codes whose decoded
    * value exceeds Int.MaxValue are unreachable from `intToByte4(int)` and
    * saturate — they only exist so the full 256-entry norm table can build.
    */
  def byte4ToInt(b: Byte): Int = {
    val i = java.lang.Byte.toUnsignedInt(b)
    if (i < NumFreeValues) i
    else {
      val decoded = NumFreeValues.toLong + int4ToLong(i - NumFreeValues)
      math.min(decoded, Int.MaxValue.toLong).toInt
    }
  }

  /** The quantized doc length an int round-trips to (encode then decode). */
  def quantize(i: Int): Int = byte4ToInt(intToByte4(i))

  /** Lucene's LENGTH_TABLE: decoded length for every possible norm byte. */
  val LengthTable: Array[Int] = Array.tabulate(256)(i => byte4ToInt(i.toByte))
}

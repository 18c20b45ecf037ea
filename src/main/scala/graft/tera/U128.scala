package graft.tera

/** Unsigned 128-bit integer as an immutable pair of longs.
  *
  * Reimplements the arithmetic the sort-benchmark record generator needs
  * (add, wrapping multiply mod 2^128, big-endian byte/hex-digit access) —
  * semantics per reference `apps/terasort/Unsigned16.h:16-38`, but built on
  * JDK intrinsics (`Math.multiplyHigh`) rather than digit-wise loops.
  */
final case class U128(hi: Long, lo: Long) extends Ordered[U128] {

  def +(that: U128): U128 = {
    val sumLo = lo + that.lo
    val carry = if (java.lang.Long.compareUnsigned(sumLo, lo) < 0) 1L else 0L
    U128(hi + that.hi + carry, sumLo)
  }

  /** Product mod 2^128: cross terms shift past 64 bits, so only
    * hi*lo' + lo*hi' + carry(lo*lo') contribute to the high word.
    */
  def *(that: U128): U128 =
    U128(
      U128.unsignedMulHigh(lo, that.lo) + hi * that.lo + lo * that.hi,
      lo * that.lo)

  def isZero: Boolean = hi == 0L && lo == 0L

  /** Logical right shift by one bit (used by square-and-multiply loops). */
  def shiftRight1: U128 = U128(hi >>> 1, (lo >>> 1) | (hi << 63))

  def lowestBitSet: Boolean = (lo & 1L) != 0L

  /** Byte `i` of the big-endian 16-byte representation (0 = most significant). */
  def byteAt(i: Int): Byte = {
    val word = if (i < 8) hi else lo
    ((word >>> ((7 - (i & 7)) * 8)) & 0xffL).toByte
  }

  /** Hex digit `i` of the 32-digit big-endian representation (0 = leftmost). */
  def hexDigitAt(i: Int): Char = {
    val word = if (i < 16) hi else lo
    val nib = ((word >>> ((15 - (i & 15)) * 4)) & 0xfL).toInt
    if (nib < 10) ('0' + nib).toChar else ('a' + nib - 10).toChar
  }

  def toHex: String = (0 until 32).map(hexDigitAt).mkString

  override def compare(that: U128): Int = {
    val c = java.lang.Long.compareUnsigned(hi, that.hi)
    if (c != 0) c else java.lang.Long.compareUnsigned(lo, that.lo)
  }
}

object U128 {
  val Zero: U128 = U128(0L, 0L)
  val One: U128 = U128(0L, 1L)

  def apply(lo: Long): U128 = U128(0L, lo)

  /** High 64 bits of the unsigned 64x64 product. JDK 17 only ships the
    * signed `multiplyHigh`; correct it for the sign-extension terms.
    */
  def unsignedMulHigh(x: Long, y: Long): Long =
    Math.multiplyHigh(x, y) + ((x >> 63) & y) + ((y >> 63) & x)
}

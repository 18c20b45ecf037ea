package graft.tera

import org.scalatest.funsuite.AnyFunSuite

/** Known-answer vectors generated with an independent big-integer
  * implementation of the 128-bit LCG (see FIXTURES.md §6).
  */
class TeraRandomSpec extends AnyFunSuite {

  test("U128 add carries across the 64-bit boundary") {
    val x = U128(0L, -1L) // 2^64 - 1
    assert(x + U128.One == U128(1L, 0L))
    assert(U128(-1L, -1L) + U128.One == U128.Zero) // wraps mod 2^128
  }

  test("U128 multiply matches big-integer arithmetic") {
    val a = U128(0x2360ed051fc65da4L, 0x4385df649fccf645L)
    // a * a mod 2^128, computed with python ints
    val sq = a * a
    val expect = BigInt("47026247687942121848144207491837523525") *
      BigInt("47026247687942121848144207491837523525") % (BigInt(1) << 128)
    assert(BigInt(sq.toHex, 16) == expect)
  }

  test("U128 hex digits and bytes are big-endian") {
    val x = U128(0x0123456789abcdefL, 0xfedcba9876543210L)
    assert(x.toHex == "0123456789abcdeffedcba9876543210")
    assert(x.byteAt(0) == 0x01.toByte)
    assert(x.byteAt(15) == 0x10.toByte)
    assert(x.hexDigitAt(0) == '0')
    assert(x.hexDigitAt(31) == '0')
    assert(x.hexDigitAt(16) == 'f')
  }

  test("skipAhead matches golden vectors") {
    assert(TeraRandom.skipAhead(0) == U128.Zero)
    assert(TeraRandom.skipAhead(1).toHex == "4a696d47726179524950202020202001")
    assert(TeraRandom.skipAhead(1000000L).toHex ==
      "92b1d9c3af90ef511dfce9e1c86a3dc0")
    assert(TeraRandom.skipAhead(1000000000000L).toHex ==
      "ca00cc80eaf54f5584080e72e772f000")
  }

  test("skipAhead(n) equals n sequential steps") {
    var s = U128.Zero
    for (n <- 0 until 50) {
      assert(TeraRandom.skipAhead(n.toLong) == s, s"step $n")
      s = TeraRandom.next(s)
    }
  }
}

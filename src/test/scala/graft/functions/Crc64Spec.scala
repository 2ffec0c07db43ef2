package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class Crc64Spec extends AnyFunSuite {

  test("CRC-64/XZ (ECMA, reflected) check value") {
    // Standard catalogue check input "123456789" → 0x995DC9BBDF1939FA;
    // same algorithm Go's hash/crc64 ECMA table computes (the reference's
    // checksum primitive, lightning/verification/checksum.go).
    val got = Crc64.checksum("123456789".getBytes("UTF-8"))
    assert(got === 0x995DC9BBDF1939FAL)
  }

  test("streaming update equals one-shot") {
    val all = "hello graft checksum".getBytes("UTF-8")
    val (a, b) = all.splitAt(7)
    assert(Crc64.update(Crc64.update(0L, a), b) === Crc64.checksum(all))
  }

  test("empty input yields 0") {
    assert(Crc64.checksum(Array.empty[Byte]) === 0L)
  }

  test("xor-combined state is order-free (100 random payloads)") {
    val rnd = new scala.util.Random(42)
    val sums = (1 to 100).map { _ =>
      val bytes = new Array[Byte](rnd.nextInt(64) + 1)
      rnd.nextBytes(bytes)
      Crc64.checksum(bytes)
    }
    assert(sums.foldLeft(0L)(_ ^ _) === rnd.shuffle(sums).foldLeft(0L)(_ ^ _))
  }
}

package graft.functions

/** CRC64 (ECMA-182 polynomial, reflected, init/xorout = ~0), matching the
  * checksum the reference pipeline computes per KV pair
  * (reference: lightning/verification/checksum.go:27-101, which delegates to
  * Go's `hash/crc64` with the ECMA table).
  *
  * Table-driven (8 KiB, 8-way slicing not needed: this runs inside a codegen
  * aggregate over small byte arrays). Pure JVM — no dependency.
  */
object Crc64 {
  final val Poly: Long = 0xC96C5795D7870F42L // ECMA-182, reflected

  private val table: Array[Long] = {
    val t = new Array[Long](256)
    var i = 0
    while (i < 256) {
      var crc = i.toLong
      var j = 0
      while (j < 8) {
        crc = if ((crc & 1L) == 1L) (crc >>> 1) ^ Poly else crc >>> 1
        j += 1
      }
      t(i) = crc
      i += 1
    }
    t
  }

  /** One-shot CRC64 of `bytes`. */
  def checksum(bytes: Array[Byte]): Long = update(0L, bytes)

  /** Streaming update: feed successive chunks; start from crc = 0. */
  def update(crc0: Long, bytes: Array[Byte]): Long = {
    var crc = ~crc0
    var i = 0
    while (i < bytes.length) {
      crc = table(((crc ^ bytes(i)) & 0xFF).toInt) ^ (crc >>> 8)
      i += 1
    }
    ~crc
  }
}

package graft.sources

/** Pure-JVM LZ4 *block format* decompressor with optional dictionary preload
  * — what the reference's `.bin` LZ4 segments need on import
  * (reference: src/lib/storage/lz4_segment.cpp:217 decompresses each block
  * with `LZ4_decompress_safe_usingDict`; blocks are independent, the
  * zstd-trained dictionary primes the match window).
  *
  * The block format (public spec, lz4.org lz4_Block_format.md): a sequence of
  * [token: litLen(4b) | matchLen(4b)] — nibble 15 extends with 255-bytes —
  * literals, then a 2-byte little-endian match offset and a match of length
  * nibble+4 copied byte-wise from already-produced output (which includes the
  * dictionary prefix; offsets may reach into it). The final sequence is
  * literals-only. Decompression is bounded by the known decompressed size, so
  * this is the "safe" variant.
  *
  * Implemented in-repo because the JVM LZ4 binding on the Spark classpath
  * (lz4-java) exposes no dictionary API, and the fixture interchange path is
  * driver-side KB-scale — clarity over SIMD.
  */
object Lz4Block {

  /** Decompress `src` to exactly `expected` bytes, with `dict` preloaded as
    * match history (empty array = no dictionary). */
  def decompress(src: Array[Byte], expected: Int, dict: Array[Byte]): Array[Byte] = {
    val base = dict.length
    val out = new Array[Byte](base + expected)
    System.arraycopy(dict, 0, out, 0, base)
    val end = base + expected
    var op = base
    var ip = 0
    while (op < end) {
      val token = src(ip) & 0xff
      ip += 1
      // literals
      var litLen = token >>> 4
      if (litLen == 15) {
        var b = 255
        while (b == 255) { b = src(ip) & 0xff; ip += 1; litLen += b }
      }
      System.arraycopy(src, ip, out, op, litLen)
      ip += litLen
      op += litLen
      if (op < end) { // the last sequence carries no match
        val offset = (src(ip) & 0xff) | ((src(ip + 1) & 0xff) << 8)
        ip += 2
        require(offset > 0 && offset <= op, s"corrupt LZ4 block: offset $offset at $op")
        var matchLen = token & 0xf
        if (matchLen == 15) {
          var b = 255
          while (b == 255) { b = src(ip) & 0xff; ip += 1; matchLen += b }
        }
        matchLen += 4
        // byte-wise copy: overlapping matches (offset < matchLen) replicate
        var mp = op - offset
        var k = 0
        while (k < matchLen) { out(op) = out(mp); op += 1; mp += 1; k += 1 }
      }
    }
    if (base == 0) out else java.util.Arrays.copyOfRange(out, base, end)
  }
}

package graft.pkgx

/** Legacy PKZIP compression methods 1 (Shrink) and 6 (Implode),
  * implemented from the public PKWARE APPNOTE.TXT ("UnShrinking" and
  * "Expanding"/"Imploding" sections). The reference reaches these via
  * commons-compress (UnshrinkingInputStream / ExplodingInputStream —
  * tika-parser-pkg-module's ZipParser delegates entry decoding to
  * ZipFile); its own test archive
  * tika-parser-pkg-module/src/test/resources/test-documents/moby.zip
  * holds 134 imploded + 1 shrunk entry (ZipParserTest.java:93).
  *
  * Both decoders are validated against the archive's own CRC-32 per
  * entry by the caller (ZipUtil.cenEntries).
  */
object ZipLegacy {

  /** LSB-first bit reader (deflate bit order). */
  private final class Bits(in: Array[Byte], var pos: Int, val end: Int) {
    private var acc = 0L
    private var nBits = 0
    /** next n bits, little-endian accumulation; -1 on exhausted input */
    def next(n: Int): Int = {
      while (nBits < n) {
        if (pos >= end) return -1
        acc |= (in(pos) & 0xffL) << nBits
        pos += 1
        nBits += 8
      }
      val v = (acc & ((1L << n) - 1)).toInt
      acc >>>= n
      nBits -= n
      v
    }
  }

  // ---------------------------------------------------------------- implode

  /** Shannon-Fano decode tree as a binary-heap array: index 0 is the
    * root, children of i are 2i+1 (bit 0) and 2i+2 (bit 1); leaves hold
    * the value, inner nodes -2, absent -1. Codes are consumed MSB-first
    * of the 16-bit Shannon-Fano code while the byte stream is read
    * LSB-first (APPNOTE "Imploding": "decoded in reverse order").
    */
  private final class SfTree(maxDepth: Int) {
    private val tree = Array.fill((1 << (maxDepth + 1)) - 1)(-1)
    def add(code: Int, len: Int, value: Int): Unit = {
      var node = 0
      var j = 0
      while (j < len) {
        tree(node) = -2
        node = 2 * node + 1 + ((code >> (15 - j)) & 1)
        j += 1
      }
      tree(node) = value
    }
    /** -1 on malformed/exhausted input */
    def read(bits: Bits): Int = {
      var node = 0
      while (true) {
        val bit = bits.next(1)
        if (bit < 0) return -1
        node = 2 * node + 1 + bit
        if (node >= tree.length) return -1
        val v = tree(node)
        if (v >= 0) return v
        if (v == -1) return -1
      }
      -1
    }
  }

  /** One stored tree: a byte count-1, then bytes whose low nibble+1 is
    * the code length and high nibble+1 the number of consecutive values
    * at that length; Shannon-Fano codes assigned per the APPNOTE
    * pseudocode (sort lengths ascending keeping value order, walk from
    * the last value down accumulating Code += 1<<(16-len)).
    * Returns null on malformed data. Advances `posRef`.
    */
  private def readTree(in: Array[Byte], posRef: Array[Int], nValues: Int): SfTree = {
    var p = posRef(0)
    if (p >= in.length) return null
    val nBytes = (in(p) & 0xff) + 1
    p += 1
    if (p + nBytes > in.length) return null
    val lengths = new Array[Int](nValues)
    var v = 0
    var i = 0
    while (i < nBytes) {
      val b = in(p + i) & 0xff
      val len = (b & 0x0f) + 1
      val cnt = (b >> 4) + 1
      var k = 0
      while (k < cnt) {
        if (v >= nValues) return null
        lengths(v) = len
        v += 1
        k += 1
      }
      i += 1
    }
    if (v != nValues) return null
    posRef(0) = p + nBytes
    // stable sort of value indices by code length ascending
    val order = (0 until nValues).sortBy(lengths)
    val codes = new Array[Int](nValues)
    var code = 0
    var codeIncrement = 0
    var lastLen = 0
    i = nValues - 1
    while (i >= 0) {
      code += codeIncrement
      val len = lengths(order(i))
      if (len != lastLen) {
        lastLen = len
        codeIncrement = 1 << (16 - len)
      }
      codes(order(i)) = code
      i -= 1
    }
    var maxLen = 0
    i = 0
    while (i < nValues) { if (lengths(i) > maxLen) maxLen = lengths(i); i += 1 }
    val tree = new SfTree(maxLen)
    i = 0
    while (i < nValues) {
      if (lengths(i) > 0) tree.add(codes(i), lengths(i), i)
      i += 1
    }
    tree
  }

  /** Decompress an imploded entry. `flags` is the entry's general-
    * purpose bit flag: bit 1 → 8 KB window (7 raw distance bits),
    * bit 2 → literals are Shannon-Fano coded (3 trees, min match 3).
    * Returns null on malformed data.
    */
  def explode(in: Array[Byte], off: Int, len: Int, outSize: Int,
      flags: Int): Array[Byte] = {
    val bigWindow = (flags & 0x2) != 0
    val codedLiterals = (flags & 0x4) != 0
    val posRef = Array(off)
    val litTree = if (codedLiterals) {
      val t = readTree(in, posRef, 256)
      if (t == null) return null
      t
    } else null
    val lenTree = readTree(in, posRef, 64)
    val distTree = if (lenTree != null) readTree(in, posRef, 64) else null
    if (lenTree == null || distTree == null) return null
    val distLowBits = if (bigWindow) 7 else 6
    val minMatch = if (codedLiterals) 3 else 2
    val bits = new Bits(in, posRef(0), math.min(in.length, off + len))
    val out = new Array[Byte](outSize)
    var pos = 0
    while (pos < outSize) {
      val flag = bits.next(1)
      if (flag < 0) return null
      if (flag == 1) { // literal
        val lit = if (litTree != null) litTree.read(bits) else bits.next(8)
        if (lit < 0) return null
        out(pos) = lit.toByte
        pos += 1
      } else { // back-reference into the sliding window
        val distLow = bits.next(distLowBits)
        val distHigh = distTree.read(bits)
        if (distLow < 0 || distHigh < 0) return null
        val distance = (distHigh << distLowBits) + distLow + 1
        var matchLen = lenTree.read(bits)
        if (matchLen < 0) return null
        if (matchLen == 63) {
          val extra = bits.next(8)
          if (extra < 0) return null
          matchLen += extra
        }
        matchLen += minMatch
        var k = 0
        while (k < matchLen && pos < outSize) {
          val src = pos - distance
          out(pos) = if (src >= 0) out(src) else 0 // window starts zeroed
          pos += 1
          k += 1
        }
      }
    }
    out
  }

  // ---------------------------------------------------------------- shrink

  private val MaxShrinkBits = 13
  private val ShrinkTable = 1 << MaxShrinkBits

  /** Decompress a shrunk entry: LZW starting at 9-bit codes, code 256
    * is the control escape (sub-code 1 = widen by one bit, 2 = partial
    * clear of leaf entries, freed slots reused lowest-first).
    * Returns null on malformed data.
    */
  def unshrink(in: Array[Byte], off: Int, len: Int, outSize: Int): Array[Byte] = {
    val bits = new Bits(in, off, math.min(in.length, off + len))
    val prefixes = new Array[Int](ShrinkTable)
    val chars = new Array[Byte](ShrinkTable)
    val isUsed = new Array[Boolean](ShrinkTable)
    var i = 0
    while (i < 256) {
      prefixes(i) = -1
      chars(i) = i.toByte
      isUsed(i) = true
      i += 1
    }
    prefixes(256) = -1
    isUsed(256) = true // control code, never a dictionary entry
    var freeScan = 257
    def addEntry(prev: Int, ch: Byte): Int = {
      while (freeScan < ShrinkTable && isUsed(freeScan)) freeScan += 1
      if (freeScan >= ShrinkTable) return -1
      prefixes(freeScan) = prev
      chars(freeScan) = ch
      isUsed(freeScan) = true
      freeScan
    }
    var codeSize = 9
    val out = new Array[Byte](outSize)
    var pos = 0
    var prevCode = -1
    var prevFirst: Byte = 0
    val stack = new Array[Byte](ShrinkTable + 1)
    while (pos < outSize) {
      val code = bits.next(codeSize)
      if (code < 0) return null
      if (code == 256) {
        val sub = bits.next(codeSize)
        if (sub == 1) {
          if (codeSize >= MaxShrinkBits) return null
          codeSize += 1
        } else if (sub == 2) {
          // partial clear: free every entry no other entry chains to
          val isParent = new Array[Boolean](ShrinkTable)
          var j = 257
          while (j < ShrinkTable) {
            if (isUsed(j) && prefixes(j) >= 0) isParent(prefixes(j)) = true
            j += 1
          }
          j = 257
          while (j < ShrinkTable) {
            if (!isParent(j)) { isUsed(j) = false; prefixes(j) = -1 }
            j += 1
          }
          freeScan = 257
        } else return null
      } else {
        var effective = code
        var addedUnfinished = false
        if (code >= ShrinkTable) return null
        if (!isUsed(code)) { // KwKwK: the just-about-to-be-defined entry
          if (prevCode < 0) return null
          effective = addEntry(prevCode, prevFirst)
          if (effective < 0) return null
          addedUnfinished = true
        }
        // expand the chain onto a stack (bounded: chains are acyclic in
        // well-formed data; a cycle would exceed the table size)
        var sp = 0
        var e = effective
        while (e >= 0) {
          if (sp >= stack.length) return null
          stack(sp) = chars(e)
          sp += 1
          e = prefixes(e)
        }
        val first = stack(sp - 1)
        if (prevCode >= 0 && !addedUnfinished) {
          if (addEntry(prevCode, first) < 0) return null
        }
        prevCode = effective
        prevFirst = first
        while (sp > 0 && pos < outSize) {
          sp -= 1
          out(pos) = stack(sp)
          pos += 1
        }
      }
    }
    out
  }
}

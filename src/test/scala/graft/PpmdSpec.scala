package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pkgx.PpmdH

/** PPMd var. H model + range-coder round-trips.
  *
  * No PPMd-producing tool exists in this environment (no rar/7z CLI,
  * and the reference corpus's RAR fixtures are all LZ-coded), so the
  * ground truth here is the symmetric-model contract: the encoder and
  * decoder share every model state transition, and a frozen fixture
  * pins the exact output bytes so either side regressing breaks the
  * pin. Real-world interop evidence is therefore weaker than for
  * codecs with in-tree reference fixtures — recorded as such in
  * PLANS.md.
  */
class PpmdSpec extends AnyFunSuite {

  private def roundTrip(data: Array[Byte], mb: Int, order: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val enc = new PpmdH.Enc(out)
    val em = new PpmdH(mb, order)
    data.foreach(b => em.encodeChar(enc, b & 0xff))
    enc.flush()
    val bytes = out.toByteArray
    var pos = 0
    val dec = new PpmdH.Dec(() => {
      val v = if (pos < bytes.length) bytes(pos) & 0xff else 0
      pos += 1
      v
    })
    dec.init()
    val dm = new PpmdH(mb, order)
    val got = new Array[Byte](data.length)
    var i = 0
    while (i < data.length) {
      val ch = dm.decodeChar(dec)
      assert(ch >= 0, s"decode failed at $i")
      got(i) = ch.toByte
      i += 1
    }
    assert(pos <= bytes.length, "decoder read past encoder output")
    assert(java.util.Arrays.equals(got, data),
      s"round trip mismatch (mb=$mb order=$order len=${data.length})")
    bytes
  }

  test("ascii text round-trips at several orders") {
    val text = ("the quick brown fox jumps over the lazy dog. " * 200).getBytes
    for (order <- Seq(2, 4, 8, 16, 32, 61, 64)) roundTrip(text, 1, order)
  }

  test("repetitive text compresses well") {
    val text = ("abcabcabc" * 5000).getBytes
    val packed = roundTrip(text, 1, 8)
    assert(packed.length < text.length / 10,
      s"ppmd should crush repetition: ${packed.length} vs ${text.length}")
  }

  test("random bytes round-trip (incompressible path)") {
    val rnd = new java.util.Random(42)
    val data = new Array[Byte](20000)
    rnd.nextBytes(data)
    roundTrip(data, 1, 4)
    roundTrip(data, 2, 16)
  }

  test("all 256 byte values round-trip") {
    val data = Array.tabulate[Byte](4096)(i => i.toByte)
    roundTrip(data, 1, 6)
  }

  test("tiny inputs round-trip") {
    roundTrip(Array[Byte](), 1, 4)
    roundTrip(Array[Byte](0), 1, 4)
    roundTrip("a".getBytes, 1, 4)
    roundTrip("ab".getBytes, 1, 4)
  }

  test("1 MB heap forces mid-stream model restarts, stays in sync") {
    // varied pseudo-text exhausts a 1 MB suballocator at high order
    val rnd = new java.util.Random(7)
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val sb = new StringBuilder
    while (sb.length < 600000) {
      sb.append(words(rnd.nextInt(words.length)))
      sb.append(if (rnd.nextInt(10) == 0) "\n" else " ")
      sb.append(rnd.nextInt(1000))
    }
    val data = sb.toString.getBytes
    val out = new java.io.ByteArrayOutputStream()
    val enc = new PpmdH.Enc(out)
    val em = new PpmdH(1, 16)
    data.foreach(b => em.encodeChar(enc, b & 0xff))
    enc.flush()
    val bytes = out.toByteArray
    var pos = 0
    val dec = new PpmdH.Dec(() => {
      val v = if (pos < bytes.length) bytes(pos) & 0xff else 0
      pos += 1; v
    })
    dec.init()
    val dm = new PpmdH(1, 16)
    var i = 0
    while (i < data.length) {
      val ch = dm.decodeChar(dec)
      assert(ch == (data(i) & 0xff), s"diverged at $i after restart")
      i += 1
    }
    assert(em.restarts > 0, "expected the 1 MB heap to force a restart")
    assert(em.restarts == dm.restarts, "restart points must agree")
  }

  test("frozen fixture: known text encodes to pinned bytes") {
    val text = "It was a bright cold day in April, and the clocks were striking thirteen."
    val out = new java.io.ByteArrayOutputStream()
    val enc = new PpmdH.Enc(out)
    val m = new PpmdH(1, 6)
    text.getBytes.foreach(b => m.encodeChar(enc, b & 0xff))
    enc.flush()
    val crc = new java.util.zip.CRC32
    crc.update(out.toByteArray)
    // pinned on first green run; a change in either model direction or
    // the coder breaks this value
    assert(out.toByteArray.length === 61,
      s"pinned length drifted: ${out.toByteArray.length}")
    assert(f"${crc.getValue}%08x" === "f33df743",
      f"pinned crc drifted: ${crc.getValue}%08x")
  }
}

package graft.crypto

import graft.engine.{MetaSink, SpanSink}

/** DER-encoded keys and certificates (.der/.crt) — metadata-only walk
  * built on the same BER/DER grammar as Pkcs7Extractor (public X.680/
  * X.690 and PKCS#1/SEC1 layouts). The reference only magic-detects
  * application/x-x509-ca-cert; here the structure identifies itself:
  *  - X.509 Certificate: SEQ(SEQ tbs, AlgId, BIT STRING) — subject/
  *    issuer CN, serial, validity
  *  - RSAPrivateKey (PKCS#1): SEQ(INT 0, INT modulus, ...) — key bits
  *  - ECPrivateKey (SEC1):    SEQ(INT 1, OCTET STRING key, [0] curve)
  *  - DSA private key:        SEQ(INT 0, INT p, INT q, INT g, INT y, INT x)
  *  - PKCS#8 PrivateKeyInfo:  SEQ(INT 0, SEQ AlgId, OCTET STRING)
  */
object DerKeyExtractor {

  private final case class Tlv(tag: Int, constructed: Boolean,
      start: Int, end: Int, next: Int)

  private def tlv(b: Array[Byte], pos: Int): Option[Tlv] = {
    if (pos + 2 > b.length) return None
    val id = b(pos) & 0xff
    var p = pos + 1
    var len = b(p) & 0xff
    p += 1
    if ((len & 0x80) != 0) {
      val n = len & 0x7f
      if (n == 0 || n > 4 || p + n > b.length) return None
      len = 0
      var i = 0
      while (i < n) { len = (len << 8) | (b(p + i) & 0xff); i += 1 }
      p += n
    }
    if (len < 0 || p + len > b.length) return None
    Some(Tlv(id & 0x1f, (id & 0x20) != 0, p, p + len, p + len))
  }

  private def children(b: Array[Byte], t: Tlv, max: Int = 16): Vector[Tlv] = {
    var out = Vector.empty[Tlv]
    var p = t.start
    while (p < t.end && out.size < max) {
      tlv(b, p) match {
        case Some(c) => out :+= c; p = c.next
        case None => return out
      }
    }
    out
  }

  def extract(bytes: Array[Byte], sink: SpanSink, meta: MetaSink): Unit = {
    val root = tlv(bytes, 0).getOrElse(return)
    if (root.tag != 0x10 || !root.constructed) return
    val kids = children(bytes, root)
    if (kids.isEmpty) return

    def intBits(t: Tlv): Int = {
      var s = t.start
      while (s < t.end && bytes(s) == 0) s += 1
      if (s >= t.end) 0
      else {
        var top = bytes(s) & 0xff
        var bits = (t.end - s - 1) * 8
        while (top > 0) { bits += 1; top >>= 1 }
        bits
      }
    }
    def isInt(t: Tlv) = t.tag == 0x02 && !t.constructed
    def intVal(t: Tlv): Long =
      if (t.end - t.start > 8) -1
      else {
        var v = 0L; var p = t.start
        while (p < t.end) { v = (v << 8) | (bytes(p) & 0xff); p += 1 }
        v
      }

    // X.509 Certificate: SEQ(SEQ, SEQ AlgId, BIT STRING)
    if (kids.size == 3 && kids(0).constructed && kids(0).tag == 0x10 &&
        kids(2).tag == 0x03) {
      meta.set("crypto:structure", "x509-certificate")
      // tbsCertificate: [0] version?, serial INT, AlgId, issuer, validity, subject
      val tbs = children(bytes, kids(0))
      val afterVer = if (tbs.nonEmpty && tbs(0).tag == 0x00) tbs.drop(1) else tbs
      if (afterVer.nonEmpty && isInt(afterVer(0))) {
        // serials are up to 20 octets (CA/Browser-forum random serials):
        // render as an unsigned BigInt, never a truncated signed long
        val t = afterVer(0)
        val serial = new java.math.BigInteger(1,
          java.util.Arrays.copyOfRange(bytes, t.start, t.end))
        meta.set("crypto:serial", serial.toString)
      }
      // printable strings inside issuer/subject surface as text lines
      emitStrings(bytes, kids(0), sink, 0)
      return
    }
    // private-key shapes discriminate on the leading INTEGER version
    if (isInt(kids(0))) {
      val ver = intVal(kids(0))
      if (ver == 0 && kids.size >= 9 && kids.forall(isInt)) {
        meta.set("crypto:structure", "rsa-private-key")
        meta.set("crypto:key-bits", intBits(kids(1)).toString)
      } else if (ver == 1 && kids.size >= 2 && kids(1).tag == 0x04) {
        meta.set("crypto:structure", "ec-private-key")
        meta.set("crypto:key-bits", ((kids(1).end - kids(1).start) * 8).toString)
      } else if (ver == 0 && kids.size == 6 && kids.forall(isInt)) {
        meta.set("crypto:structure", "dsa-private-key")
        meta.set("crypto:key-bits", intBits(kids(1)).toString)
      } else if (ver == 0 && kids.size >= 3 && kids(1).constructed &&
          kids(1).tag == 0x10 && kids(2).tag == 0x04) {
        meta.set("crypto:structure", "pkcs8-private-key")
      } else if (ver == 3 && kids.size >= 2 && kids(1).constructed &&
          kids(1).tag == 0x10) {
        // PKCS#12 PFX: version 3 + authSafe ContentInfo (+ optional MacData)
        meta.set("crypto:structure", "pkcs12-pfx")
        if (kids.size >= 3) meta.set("crypto:mac-present", "true")
      } else meta.set("crypto:structure", "der-sequence")
    } else meta.set("crypto:structure", "der-sequence")
  }

  /** PrintableString/UTF8String/IA5String leaves become text lines
    * (certificate subject/issuer names, emails). */
  private def emitStrings(b: Array[Byte], t: Tlv, sink: SpanSink,
      depth: Int): Unit = {
    if (depth > 12) return
    var p = t.start
    var n = 0
    while (p < t.end && n < 256) {
      tlv(b, p) match {
        case Some(c) =>
          if (c.constructed) emitStrings(b, c, sink, depth + 1)
          else if ((c.tag == 0x0c || c.tag == 0x13 || c.tag == 0x16) &&
              c.end > c.start) {
            sink.chars(new String(b, c.start, c.end - c.start,
              java.nio.charset.StandardCharsets.UTF_8))
            sink.newline()
          }
          p = c.next; n += 1
        case None => return
      }
    }
  }
}

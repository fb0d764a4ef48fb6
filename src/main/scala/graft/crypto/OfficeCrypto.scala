package graft.crypto

import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

import graft.ole2.Cfb

/** MS-OFFCRYPTO decryption of password-protected OOXML packages: the
  * `EncryptionInfo` + `EncryptedPackage` CFB pair produced by Office's
  * "Encrypt with Password". Two wire formats are implemented from the
  * public MS-OFFCRYPTO spec:
  *
  *  - Standard encryption (EncryptionInfo version x.2, §2.3.4.5-2.3.4.9):
  *    AES-ECB, SHA-1 key derivation with 50,000 spin rounds and the
  *    ipad/opad-style X1/X2 expansion.
  *  - Agile encryption (version 4.4, §2.3.4.10-2.3.4.15): XML descriptor,
  *    per-block-key hashes, AES-CBC in 4096-byte segments with
  *    hash(salt || LE32(segment)) IVs; SHA-1/256/384/512.
  *
  * Reference behavior (NOT code): OfficeParser.java:258-292 — the
  * supplied PasswordProvider password REPLACES the default
  * "VelvetSweatshop" (Decryptor.DEFAULT_PASSWORD); exactly one password
  * is tried, and a verification failure is an EncryptedDocumentException.
  * POI's Decryptor/AgileDecryptor implement the same spec sections.
  */
object OfficeCrypto {

  /** The reference's Decryptor.DEFAULT_PASSWORD — Excel's legacy
    * default-encryption password, tried when no provider is set.
    */
  val DefaultPassword = "VelvetSweatshop"

  /** Decrypt a protected-OOXML CFB container. Returns the decrypted OPC
    * zip bytes, or None when the password doesn't verify or the scheme
    * is unsupported (extensible 3.3/4.3, RC4 CryptoAPI inside
    * EncryptionInfo).
    */
  def decryptOoxml(cfb: Cfb.Doc, password: String): Option[Array[Byte]] = {
    for {
      info <- cfb.stream("EncryptionInfo")
      pkg <- cfb.stream("EncryptedPackage")
      out <- decrypt(info, pkg, password)
    } yield out
  }

  private def decrypt(info: Array[Byte], pkg: Array[Byte],
      password: String): Option[Array[Byte]] = {
    if (info.length < 8) return None
    val major = le16(info, 0); val minor = le16(info, 2)
    (major, minor) match {
      case (4, 4) => agile(info, pkg, password)
      case (2 | 3 | 4, 2) => standard(info, pkg, password)
      case _ => None
    }
  }

  // ==== standard encryption (§2.3.4.5) =================================

  private def standard(info: Array[Byte], pkg: Array[Byte],
      password: String): Option[Array[Byte]] = {
    val headerSize = le32(info, 8)
    val hdr = 12
    // EncryptionHeader: flags sizeExtra algId algIdHash keySize provider…
    val algId = le32(info, hdr + 8)
    val keyBits = le32(info, hdr + 16)
    // AES only (0x660E/0x660F/0x6610); RC4 CryptoAPI (0x6801) unsupported
    if (algId != 0x660e && algId != 0x660f && algId != 0x6610) return None
    val ver = hdr + headerSize
    val saltSize = le32(info, ver)
    if (saltSize != 16) return None
    val salt = info.slice(ver + 4, ver + 20)
    val encVerifier = info.slice(ver + 20, ver + 36)
    val encVerifierHash = info.slice(ver + 40, ver + 72)
    val key = standardKey(password, salt, keyBits / 8)
    val verifier = aesEcb(key, encVerifier)
    val verifierHash = aesEcb(key, encVerifierHash)
    val sha1 = MessageDigest.getInstance("SHA-1")
    if (!java.util.Arrays.equals(sha1.digest(verifier),
        java.util.Arrays.copyOf(verifierHash, 20))) return None
    if (pkg.length < 8) return None
    val size = le64(pkg, 0)
    if (size < 0 || size > pkg.length.toLong * 2) return None
    val plain = aesEcb(key, java.util.Arrays.copyOfRange(pkg, 8, pkg.length))
    Some(java.util.Arrays.copyOf(plain, size.toInt))
  }

  /** §2.3.4.7: 50,000-round SHA-1 spin then the 0x36/0x5C X1/X2 expansion. */
  private def standardKey(password: String, salt: Array[Byte],
      keyBytes: Int): Array[Byte] = {
    val sha1 = MessageDigest.getInstance("SHA-1")
    val pwd = password.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
    sha1.update(salt); sha1.update(pwd)
    var h = sha1.digest()
    var i = 0
    val ctr = new Array[Byte](4)
    while (i < 50000) {
      ctr(0) = (i & 0xff).toByte; ctr(1) = ((i >> 8) & 0xff).toByte
      ctr(2) = ((i >> 16) & 0xff).toByte; ctr(3) = ((i >> 24) & 0xff).toByte
      sha1.update(ctr); sha1.update(h)
      h = sha1.digest()
      i += 1
    }
    sha1.update(h); sha1.update(Array[Byte](0, 0, 0, 0))
    val hFinal = sha1.digest()
    def x(pad: Byte): Array[Byte] = {
      val buf = Array.fill[Byte](64)(pad)
      var j = 0
      while (j < hFinal.length) { buf(j) = (buf(j) ^ hFinal(j)).toByte; j += 1 }
      sha1.update(buf)
      sha1.digest()
    }
    java.util.Arrays.copyOf(x(0x36) ++ x(0x5c.toByte), keyBytes)
  }

  // ==== agile encryption (§2.3.4.10) ====================================

  // block-key constants, §2.3.4.13
  private val BkVerifierInput = Array(0xfe, 0xa7, 0xd2, 0x76, 0x3b, 0x4b,
    0x9e, 0x79).map(_.toByte)
  private val BkVerifierValue = Array(0xd7, 0xaa, 0x0f, 0x6d, 0x30, 0x61,
    0x34, 0x4e).map(_.toByte)
  private val BkKeyValue = Array(0x14, 0x6e, 0x0b, 0xe7, 0xab, 0xac,
    0xd0, 0xd6).map(_.toByte)

  private final case class AgileKey(
      saltValue: Array[Byte], spinCount: Int, keyBits: Int, blockSize: Int,
      hashAlg: String, hashSize: Int,
      encVerifierInput: Array[Byte], encVerifierValue: Array[Byte],
      encKeyValue: Array[Byte])
  private final case class AgileData(
      saltValue: Array[Byte], keyBits: Int, blockSize: Int, hashAlg: String)

  private def agile(info: Array[Byte], pkg: Array[Byte],
      password: String): Option[Array[Byte]] = {
    val xml = new String(info, 8, info.length - 8,
      java.nio.charset.StandardCharsets.UTF_8)
    var keyData: AgileData = null
    var encKey: AgileKey = null
    val factory = javax.xml.parsers.SAXParserFactory.newInstance()
    factory.setNamespaceAware(true)
    factory.setFeature(
      "http://apache.org/xml/features/disallow-doctype-decl", true)
    val handler = new org.xml.sax.helpers.DefaultHandler {
      override def startElement(uri: String, local: String, q: String,
          a: org.xml.sax.Attributes): Unit = {
        def b64(n: String) = Option(a.getValue(n))
          .map(java.util.Base64.getDecoder.decode).getOrElse(Array.emptyByteArray)
        def int(n: String, d: Int) = Option(a.getValue(n)).map(_.toInt).getOrElse(d)
        def hashOf = Option(a.getValue("hashAlgorithm")).getOrElse("SHA1") match {
          case "SHA1" => "SHA-1"
          case "SHA256" => "SHA-256"
          case "SHA384" => "SHA-384"
          case "SHA512" => "SHA-512"
          case other => other
        }
        val name = if (local != null && local.nonEmpty) local else q
        if (name == "keyData")
          keyData = AgileData(b64("saltValue"), int("keyBits", 256),
            int("blockSize", 16), hashOf)
        else if (name == "encryptedKey")
          encKey = AgileKey(b64("saltValue"), int("spinCount", 100000),
            int("keyBits", 256), int("blockSize", 16), hashOf,
            int("hashSize", 64), b64("encryptedVerifierHashInput"),
            b64("encryptedVerifierHashValue"), b64("encryptedKeyValue"))
      }
    }
    try factory.newSAXParser().parse(
      new org.xml.sax.InputSource(new java.io.StringReader(xml)), handler)
    catch { case _: Exception => return None }
    if (keyData == null || encKey == null) return None

    val md = MessageDigest.getInstance(encKey.hashAlg)
    val pwd = password.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
    md.update(encKey.saltValue); md.update(pwd)
    var h = md.digest()
    var i = 0
    val ctr = new Array[Byte](4)
    while (i < encKey.spinCount) {
      ctr(0) = (i & 0xff).toByte; ctr(1) = ((i >> 8) & 0xff).toByte
      ctr(2) = ((i >> 16) & 0xff).toByte; ctr(3) = ((i >> 24) & 0xff).toByte
      md.update(ctr); md.update(h)
      h = md.digest()
      i += 1
    }
    def blockKey(bk: Array[Byte], n: Int): Array[Byte] = {
      md.update(h); md.update(bk)
      val d = md.digest()
      if (d.length >= n) java.util.Arrays.copyOf(d, n)
      else d ++ Array.fill[Byte](n - d.length)(0x36)
    }
    val keyBytes = encKey.keyBits / 8
    val iv = padTo(encKey.saltValue, encKey.blockSize)
    val vIn = aesCbc(blockKey(BkVerifierInput, keyBytes), iv,
      encKey.encVerifierInput)
    val vVal = aesCbc(blockKey(BkVerifierValue, keyBytes), iv,
      encKey.encVerifierValue)
    val vmd = MessageDigest.getInstance(encKey.hashAlg)
    val expect = vmd.digest(java.util.Arrays.copyOf(vIn, encKey.saltValue.length))
    val got = java.util.Arrays.copyOf(vVal, expect.length)
    if (!java.util.Arrays.equals(expect, got)) return None

    val secret = java.util.Arrays.copyOf(
      aesCbc(blockKey(BkKeyValue, keyBytes), iv, encKey.encKeyValue),
      keyData.keyBits / 8)
    if (pkg.length < 8) return None
    val size = le64(pkg, 0)
    if (size < 0 || size > (pkg.length.toLong - 8) + 4096) return None
    val segMd = MessageDigest.getInstance(keyData.hashAlg)
    val out = new java.io.ByteArrayOutputStream(pkg.length)
    var seg = 0
    var off = 8
    while (off < pkg.length) {
      val end = math.min(off + 4096, pkg.length)
      var chunk = java.util.Arrays.copyOfRange(pkg, off, end)
      if (chunk.length % 16 != 0)
        chunk = java.util.Arrays.copyOf(chunk, (chunk.length / 16 + 1) * 16)
      segMd.update(keyData.saltValue)
      ctr(0) = (seg & 0xff).toByte; ctr(1) = ((seg >> 8) & 0xff).toByte
      ctr(2) = ((seg >> 16) & 0xff).toByte; ctr(3) = ((seg >> 24) & 0xff).toByte
      segMd.update(ctr)
      val segIv = java.util.Arrays.copyOf(segMd.digest(), keyData.blockSize)
      out.write(aesCbc(secret, segIv, chunk))
      seg += 1
      off = end
    }
    Some(java.util.Arrays.copyOf(out.toByteArray, size.toInt))
  }

  // ==== primitives ======================================================

  private def padTo(b: Array[Byte], n: Int): Array[Byte] =
    if (b.length >= n) java.util.Arrays.copyOf(b, n)
    else b ++ Array.fill[Byte](n - b.length)(0x36)

  private def aesEcb(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/ECB/NoPadding")
    c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"))
    c.doFinal(data)
  }

  private def aesCbc(key: Array[Byte], iv: Array[Byte],
      data: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"),
      new IvParameterSpec(iv))
    c.doFinal(data)
  }

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def le64(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(o + i) & 0xffL); i -= 1 }
    v
  }
}

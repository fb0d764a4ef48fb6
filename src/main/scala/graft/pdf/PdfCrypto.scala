package graft.pdf

import java.security.MessageDigest

/** PDF standard security handler — the empty-user-password decrypt
  * path the reference applies by default (tika-parsers
  * .../pdf/PDFParser.java:176-188 passes "" to PDFBox; algorithms are
  * PDF 32000-1:2008 §7.6.3). Supported: RC4 for /V 1-2 (/R 2-3) and
  * AES-128-CBC for /V 4 crypt filters (/CFM AESV2, plus the V2-in-CF
  * RC4 degenerate). Only /V 5 / AESV3 (the SHA-256 /R 6 handler)
  * remains a recorded encrypted-unsupported parse failure.
  *
  * Used by both the reader (PdfDoc decrypt) and the corpus writer
  * (valid /O //U generation for empty-password fixtures).
  */
object PdfCrypto {

  /** §7.6.3.3 padding constant. */
  val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** RC4 (stateless helper — fresh schedule per call). */
  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + key(i % key.length)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var a = 0; var b = 0
    var k = 0
    while (k < data.length) {
      a = (a + 1) & 0xff
      b = (b + s(a)) & 0xff
      val t = s(a); s(a) = s(b); s(b) = t
      out(k) = (data(k) ^ s((s(a) + s(b)) & 0xff)).toByte
      k += 1
    }
    out
  }

  private def padded(pwd: Array[Byte]): Array[Byte] =
    if (pwd.length >= 32) java.util.Arrays.copyOf(pwd, 32)
    else pwd ++ java.util.Arrays.copyOf(Pad, 32 - pwd.length)

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Algorithm 2: file encryption key from the (empty) user password. */
  def fileKey(o: Array[Byte], p: Long, id0: Array[Byte], r: Int,
      keyLen: Int, pwd: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    var h = md5(padded(pwd), o, le32(p), id0)
    if (r >= 3) {
      var i = 0
      while (i < 50) { h = md5(java.util.Arrays.copyOf(h, keyLen)); i += 1 }
    }
    java.util.Arrays.copyOf(h, keyLen)
  }

  /** Algorithm 3: the /O entry (owner password = user password here). */
  def computeO(ownerPwd: Array[Byte], userPwd: Array[Byte], r: Int,
      keyLen: Int): Array[Byte] = {
    var h = md5(padded(ownerPwd))
    if (r >= 3) { var i = 0; while (i < 50) { h = md5(h); i += 1 } }
    val key = java.util.Arrays.copyOf(h, keyLen)
    var out = rc4(key, padded(userPwd))
    if (r >= 3) {
      var i = 1
      while (i <= 19) {
        out = rc4(key.map(b => (b ^ i).toByte), out)
        i += 1
      }
    }
    out
  }

  /** Algorithms 4/5: the /U entry for a given file key. */
  def computeU(key: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] = {
    if (r == 2) rc4(key, Pad)
    else {
      var out = rc4(key, md5(Pad, id0))
      var i = 1
      while (i <= 19) {
        out = rc4(key.map(b => (b ^ i).toByte), out)
        i += 1
      }
      out ++ new Array[Byte](16) // arbitrary 16-byte tail per spec
    }
  }

  /** Empty-user-password check: recompute /U and compare (first 16 bytes
    * for R3+).
    */
  def emptyPasswordWorks(o: Array[Byte], u: Array[Byte], p: Long,
      id0: Array[Byte], r: Int, keyLen: Int): Boolean = {
    val key = fileKey(o, p, id0, r, keyLen)
    val mine = computeU(key, id0, r)
    val n = if (r == 2) 32 else 16
    if (u.length < n || mine.length < n) return false
    var i = 0
    while (i < n) { if (mine(i) != u(i)) return false; i += 1 }
    true
  }

  /** Algorithm 1: per-object RC4 key. */
  def objectKey(fileKey: Array[Byte], num: Int, gen: Int): Array[Byte] = {
    val ext = fileKey ++ Array(
      (num & 0xff).toByte, ((num >> 8) & 0xff).toByte, ((num >> 16) & 0xff).toByte,
      (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte)
    java.util.Arrays.copyOf(md5(ext), math.min(fileKey.length + 5, 16))
  }

  /** AES variant of Algorithm 1 (§7.6.2): the per-object MD5 additionally
    * absorbs the "sAlT" constant.
    */
  def objectKeyAes(fileKey: Array[Byte], num: Int, gen: Int): Array[Byte] = {
    val ext = fileKey ++ Array(
      (num & 0xff).toByte, ((num >> 8) & 0xff).toByte, ((num >> 16) & 0xff).toByte,
      (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte,
      0x73.toByte, 0x41.toByte, 0x6c.toByte, 0x54.toByte) // "sAlT"
    java.util.Arrays.copyOf(md5(ext), math.min(fileKey.length + 5, 16))
  }

  /** AESV2 (/V 4) payload: 16-byte IV prefix + AES-128-CBC/PKCS#5. */
  def aesDecrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    if (data.length < 16) return Array.emptyByteArray
    val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(java.util.Arrays.copyOf(data, 16)))
    c.doFinal(data, 16, data.length - 16)
  }

  /** Writer-side AESV2 encrypt (fixtures): explicit IV for determinism. */
  def aesEncrypt(key: Array[Byte], iv: Array[Byte], plain: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    iv ++ c.doFinal(plain)
  }
}

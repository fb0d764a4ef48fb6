package graft.pkgx

import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** RAR 3.x (RAR29) encryption: AES-128-CBC with a key/IV derived from
  * the password + 8-byte salt via 0x40000 rounds of SHA-1. The scheme
  * is publicly documented (RARLAB technote; independent decryptor
  * implementations in The Unarchiver and ClamAV describe the same KDF):
  *
  *   raw       = UTF-16LE(password) ++ salt
  *   for I in 0 until 0x40000:
  *     sha1.update(raw); sha1.update(I as 3 LE bytes)
  *     every 0x4000 rounds: IV[I/0x4000] = last byte of interim digest
  *   key = final digest words 0..3, each 4-byte group byte-reversed
  *
  * Reference behavior: tika's RarParser throws EncryptedDocumentException
  * on these archives (RarParserTest.testEncryptedRar) — decryption here
  * EXCEEDS the reference, gated on a caller-supplied password exactly
  * like the reference's PasswordProvider contract.
  */
object RarCrypto {

  private final val Rounds = 0x40000

  /** Small process-wide cache: archives reuse salts across headers and
    * each KDF run is ~30 ms of SHA-1.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (Array[Byte], Array[Byte])]()

  /** Derive (AES-128 key, CBC IV) from password + salt. */
  def deriveKeyIv(password: String, salt: Array[Byte]): (Array[Byte], Array[Byte]) = {
    val ck = password + ":" + salt.map(b => f"$b%02x").mkString
    val hit = cache.get(ck)
    if (hit != null) return hit
    val pwd = password.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
    val raw = new Array[Byte](pwd.length + salt.length)
    System.arraycopy(pwd, 0, raw, 0, pwd.length)
    System.arraycopy(salt, 0, raw, pwd.length, salt.length)
    val md = MessageDigest.getInstance("SHA-1")
    val iv = new Array[Byte](16)
    val num = new Array[Byte](3)
    var i = 0
    while (i < Rounds) {
      md.update(raw)
      num(0) = i.toByte; num(1) = (i >> 8).toByte; num(2) = (i >> 16).toByte
      md.update(num)
      if (i % (Rounds / 16) == 0) {
        val interim = md.clone().asInstanceOf[MessageDigest].digest()
        iv(i / (Rounds / 16)) = interim(19)
      }
      i += 1
    }
    val dig = md.digest()
    val key = new Array[Byte](16)
    var j = 0
    while (j < 4) {
      var k = 0
      while (k < 4) { key(j * 4 + k) = dig(j * 4 + 3 - k); k += 1 }
      j += 1
    }
    val out = (key, iv)
    if (cache.size < 64) cache.put(ck, out)
    out
  }

  /** Decrypt `len` bytes (must be a multiple of 16) of AES-128-CBC. */
  def decrypt(key: Array[Byte], iv: Array[Byte], data: Array[Byte],
      off: Int, len: Int): Array[Byte] = {
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"),
      new IvParameterSpec(iv))
    c.doFinal(data, off, len)
  }
}

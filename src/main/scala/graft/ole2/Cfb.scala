package graft.ole2

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Compound File Binary (OLE2) container reader — the storage layer under
  * legacy .doc/.xls/.ppt/.msg.
  *
  * Layout per the public MS-CFB spec (the reference reads these files
  * through POIFS — tika-parsers microsoft-module OfficeParser.java
  * dispatches on POIFS directory entries; we read the container
  * directly): 512-byte header with a 109-entry DIFAT, FAT sectors of
  * 128 chain links, a directory chain of 128-byte entries (UTF-16LE
  * names), and a 64-byte-sector mini stream (held in the root entry's
  * stream) for payloads under 4096 bytes.
  *
  * The directory is walked linearly (every allocated 128-byte entry in
  * the directory chain) rather than via the red-black sibling tree —
  * robust against the malformed trees real-world files carry.
  */
object Cfb {

  val Signature: Array[Byte] =
    Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)

  val EndOfChain = 0xFFFFFFFE
  val FreeSect = 0xFFFFFFFF

  /** `path` = parent-storage prefix like "BodyText/" ("" at root). */
  final case class Entry(name: String, objType: Int, startSector: Int,
      size: Long, path: String = "")

  final case class Doc(sectorSize: Int, miniCutoff: Int, entries: Vector[Entry],
      private[ole2] val bytes: Array[Byte],
      private[ole2] val fat: Array[Int],
      private[ole2] val miniFat: Array[Int],
      private[ole2] val miniStream: Array[Byte]) {

    def stream(name: String): Option[Array[Byte]] =
      // MS-CFB §2.6.4: directory-entry names compare case-insensitively
      // (real files ship `WORKBOOK` beside the usual `Workbook`)
      entries.find(e => e.objType == 2 && e.name.equalsIgnoreCase(name))
        .map(readStream)

    /** All stream entries, directory order (storages excluded). */
    def streams: Vector[Entry] = entries.filter(_.objType == 2)

    def readStream(e: Entry): Array[Byte] = {
      if (e.size == 0) return Array.emptyByteArray
      val n = e.size.toInt // v3 caps stream size well below 2 GB in practice
      if (e.objType != 5 && n < miniCutoff)
        readChain(miniStream, miniFat, e.startSector, 64, n)
      else
        readChain(bytes, fat, e.startSector, sectorSize, n, headerOffset = 512)
    }
  }

  def isCfb(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && Signature.indices.forall(i => bytes(i) == Signature(i))

  /** Bounded chain walk: at most ceil(size/sectorSize)+1 links are
    * followed, so FAT cycles in hostile files cannot loop forever.
    */
  private def readChain(data: Array[Byte], fat: Array[Int], start: Int,
      sectorSize: Int, size: Int, headerOffset: Int = 0): Array[Byte] = {
    val out = new Array[Byte](size)
    var written = 0
    var sec = start
    var hops = 0
    val maxHops = size / sectorSize + 2
    while (sec != EndOfChain && sec >= 0 && written < size && hops < maxHops) {
      val off = headerOffset + sec.toLong * sectorSize
      if (off >= data.length) throw new IllegalArgumentException(
        s"cfb: sector $sec beyond file (${data.length} bytes)")
      val n = math.min(sectorSize, size - written)
      val avail = math.min(n.toLong, data.length - off).toInt
      System.arraycopy(data, off.toInt, out, written, math.max(avail, 0))
      written += n
      sec = if (sec < fat.length) fat(sec) else EndOfChain
      hops += 1
    }
    out
  }

  def parse(bytes: Array[Byte]): Doc = {
    require(isCfb(bytes), "not a CFB container")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val sectorShift = buf.getShort(0x1E).toInt
    val sectorSize = 1 << sectorShift
    val numFatSectors = buf.getInt(0x2C)
    val firstDirSector = buf.getInt(0x30)
    val miniCutoff = buf.getInt(0x38)
    val firstMiniFat = buf.getInt(0x3C)
    val numMiniFat = buf.getInt(0x40)
    val firstDifat = buf.getInt(0x44)
    val numDifat = buf.getInt(0x48)

    def sectorOffset(sec: Int): Int = 512 + sec * sectorSize
    val intsPerSector = sectorSize / 4

    // DIFAT: 109 header entries + chained DIFAT sectors (last int = next)
    val fatSectors = scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    while (i < 109 && fatSectors.length < numFatSectors) {
      val s = buf.getInt(0x4C + i * 4)
      if (s >= 0) fatSectors += s
      i += 1
    }
    var difatSec = firstDifat
    var difatHops = 0
    while (difatSec != EndOfChain && difatSec >= 0 && difatHops <= numDifat) {
      val base = sectorOffset(difatSec)
      var j = 0
      while (j < intsPerSector - 1 && fatSectors.length < numFatSectors) {
        val s = buf.getInt(base + j * 4)
        if (s >= 0) fatSectors += s
        j += 1
      }
      difatSec = buf.getInt(base + (intsPerSector - 1) * 4)
      difatHops += 1
    }

    val fat = new Array[Int](fatSectors.length * intsPerSector)
    fatSectors.zipWithIndex.foreach { case (s, fi) =>
      val base = sectorOffset(s)
      var j = 0
      while (j < intsPerSector) {
        fat(fi * intsPerSector + j) =
          if (base + j * 4 + 4 <= bytes.length) buf.getInt(base + j * 4)
          else FreeSect
        j += 1
      }
    }

    // directory chain
    val dirBytes = {
      val out = new java.io.ByteArrayOutputStream()
      var sec = firstDirSector
      var hops = 0
      val maxDirHops = bytes.length / sectorSize + 2
      while (sec != EndOfChain && sec >= 0 && hops < maxDirHops) {
        val off = sectorOffset(sec)
        if (off + sectorSize <= bytes.length) out.write(bytes, off, sectorSize)
        sec = if (sec < fat.length) fat(sec) else EndOfChain
        hops += 1
      }
      out.toByteArray
    }
    val dbuf = ByteBuffer.wrap(dirBytes).order(ByteOrder.LITTLE_ENDIAN)
    val rawEntries = (0 until dirBytes.length / 128).map { k =>
      val base = k * 128
      val nameLen = dbuf.getShort(base + 64).toInt
      val objType = dirBytes(base + 66) & 0xff
      val name =
        if (nameLen >= 2 && nameLen <= 64)
          new String(dirBytes, base, nameLen - 2, StandardCharsets.UTF_16LE)
        else ""
      val start = dbuf.getInt(base + 116)
      val size = dbuf.getLong(base + 120) & 0xFFFFFFFFL // v3: low 32 bits
      Entry(name, objType, start, size)
    }
    // storage paths from the red-black sibling/child tree: each entry's
    // left(+68)/right(+72) siblings share its parent; child(+76) roots a
    // storage's subtree (MS-CFB §2.6) — HWP and MSG need to tell apart
    // identically-named streams under different storages
    val paths = new Array[String](rawEntries.length)
    java.util.Arrays.fill(paths.asInstanceOf[Array[AnyRef]], null)
    def walk(idx: Int, prefix: String, depth: Int): Unit = {
      if (idx < 0 || idx >= rawEntries.length || depth > 64 ||
          paths(idx) != null) return
      paths(idx) = prefix
      val base = idx * 128
      walk(dbuf.getInt(base + 68), prefix, depth + 1)
      walk(dbuf.getInt(base + 72), prefix, depth + 1)
      if (rawEntries(idx).objType == 1 || rawEntries(idx).objType == 5)
        walk(dbuf.getInt(base + 76),
          if (rawEntries(idx).objType == 5) prefix
          else prefix + rawEntries(idx).name + "/", depth + 1)
    }
    if (rawEntries.nonEmpty) walk(0, "", 0)
    val entries = rawEntries.zipWithIndex
      .filter { case (e, _) => e.objType == 1 || e.objType == 2 || e.objType == 5 }
      .map { case (e, i) => e.copy(path = Option(paths(i)).getOrElse("")) }
      .toVector

    // mini FAT + mini stream (root entry's stream, read via regular FAT)
    val miniFat = {
      val mf = new Array[Int](math.max(numMiniFat, 0) * intsPerSector)
      var sec = firstMiniFat
      var fi = 0
      while (sec != EndOfChain && sec >= 0 && fi < numMiniFat) {
        val base = sectorOffset(sec)
        var j = 0
        while (j < intsPerSector) {
          mf(fi * intsPerSector + j) =
            if (base + j * 4 + 4 <= bytes.length) buf.getInt(base + j * 4)
            else FreeSect
          j += 1
        }
        sec = if (sec < fat.length) fat(sec) else EndOfChain
        fi += 1
      }
      mf
    }
    val miniStream = entries.find(_.objType == 5).map { root =>
      readChain(bytes, fat, root.startSector, sectorSize, root.size.toInt,
        headerOffset = 512)
    }.getOrElse(Array.emptyByteArray)

    Doc(sectorSize, miniCutoff, entries, bytes, fat, miniFat, miniStream)
  }
}

/** Minimal CFB v3 writer — used by the synthetic corpus and tests to
  * build valid .doc/.xls/.ppt/.msg fixtures (no binary Office fixtures
  * exist offline). Flat namespace (all streams under root), small
  * streams go through the mini stream exactly as real small Office
  * files do, so the reader's mini-FAT path is exercised by the corpus.
  */
object CfbWriter {

  private val SectorSize = 512
  private val MiniSector = 64
  private val MiniCutoff = 4096

  def write(streams: Seq[(String, Array[Byte])]): Array[Byte] = {
    require(streams.size <= 100, "writer supports <= 100 streams")
    val (small, big) = streams.partition(_._2.length < MiniCutoff)

    // ---- mini stream: small payloads padded to 64-byte mini sectors
    val miniChains = scala.collection.mutable.Map[String, Int]() // first mini sector
    val miniData = new java.io.ByteArrayOutputStream()
    val miniFatEntries = scala.collection.mutable.ArrayBuffer[Int]()
    small.foreach { case (name, data) =>
      val nSecs = math.max(1, (data.length + MiniSector - 1) / MiniSector)
      miniChains(name) = miniFatEntries.length
      (0 until nSecs).foreach { k =>
        miniFatEntries += (if (k == nSecs - 1) Cfb.EndOfChain
                           else miniFatEntries.length + 1)
      }
      miniData.write(data)
      val pad = nSecs * MiniSector - data.length
      miniData.write(new Array[Byte](pad))
    }
    val miniStreamBytes = miniData.toByteArray

    // ---- regular sector layout:
    //  [fat sectors][dir sectors][miniFAT sectors][miniStream][big streams]
    def sectorsFor(n: Int) = math.max(if (n == 0) 0 else (n + SectorSize - 1) / SectorSize, 0)
    val nDirEntries = 1 + streams.size
    val dirSectors = math.max(1, (nDirEntries * 128 + SectorSize - 1) / SectorSize)
    val miniFatSectors = sectorsFor(miniFatEntries.length * 4)
    val miniStreamSectors = sectorsFor(miniStreamBytes.length)
    val bigSectors = big.map { case (_, d) => sectorsFor(d.length) }

    // total payload sectors (excluding FAT itself); FAT must also map its
    // own sectors, solve n_fat >= ceil((payload + n_fat) / 128)
    val payloadSectors = dirSectors + miniFatSectors + miniStreamSectors + bigSectors.sum
    var fatSectors = 1
    while (fatSectors * (SectorSize / 4) < payloadSectors + fatSectors)
      fatSectors += 1
    require(fatSectors <= 109, "file too large for header DIFAT")

    val fat = Array.fill(fatSectors * (SectorSize / 4))(Cfb.FreeSect)
    var next = 0
    def allocChain(n: Int): Int = {
      if (n == 0) return Cfb.EndOfChain
      val first = next
      (0 until n).foreach { k =>
        fat(next) = if (k == n - 1) Cfb.EndOfChain else next + 1
        next += 1
      }
      first
    }
    // FAT sectors mark themselves
    val fatSecIds = (0 until fatSectors).map { _ =>
      val id = next; fat(id) = 0xFFFFFFFD; next += 1; id // FATSECT
    }
    val dirStart = allocChain(dirSectors)
    val miniFatStart = if (miniFatSectors > 0) allocChain(miniFatSectors) else Cfb.EndOfChain
    val miniStreamStart = if (miniStreamSectors > 0) allocChain(miniStreamSectors) else Cfb.EndOfChain
    val bigStarts = big.zip(bigSectors).map { case ((name, _), ns) =>
      name -> allocChain(ns)
    }.toMap

    // ---- directory
    val dir = ByteBuffer.allocate(dirSectors * SectorSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    def writeEntry(idx: Int, name: String, objType: Int, start: Int,
        size: Long, child: Int): Unit = {
      val base = idx * 128
      val nm = name.getBytes(StandardCharsets.UTF_16LE)
      require(nm.length <= 62, s"name too long: $name")
      var i = 0
      while (i < nm.length) { dir.put(base + i, nm(i)); i += 1 }
      dir.putShort(base + 64, (nm.length + 2).toShort)
      dir.put(base + 66, objType.toByte)
      dir.put(base + 67, 1.toByte) // black
      dir.putInt(base + 68, -1)    // left sibling
      // right sibling: linear chain through the stream entries
      val right = if (idx >= 1 && idx < streams.size) idx + 1 else -1
      dir.putInt(base + 72, right)
      dir.putInt(base + 76, child)
      dir.putInt(base + 100, 0)    // state
      dir.putInt(base + 116, start)
      dir.putInt(base + 120, (size & 0xFFFFFFFFL).toInt)
      dir.putInt(base + 124, 0)
    }
    writeEntry(0, "Root Entry", 5, miniStreamStart,
      miniStreamBytes.length.toLong, child = if (streams.nonEmpty) 1 else -1)
    streams.zipWithIndex.foreach { case ((name, data), k) =>
      val start =
        if (data.length < MiniCutoff) miniChains(name)
        else bigStarts(name)
      writeEntry(k + 1, name, 2, start, data.length.toLong, child = -1)
    }
    // unused tail entries: objType 0 (already zeroed)

    // ---- header
    val header = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    header.put(Cfb.Signature)
    header.putShort(0x18, 0x003E.toShort) // minor
    header.putShort(0x1A, 0x0003.toShort) // major = v3
    header.putShort(0x1C, 0xFFFE.toShort) // little-endian
    header.putShort(0x1E, 9)              // 512-byte sectors
    header.putShort(0x20, 6)              // 64-byte mini sectors
    header.putInt(0x2C, fatSectors)
    header.putInt(0x30, dirStart)
    header.putInt(0x38, MiniCutoff)
    header.putInt(0x3C, miniFatStart)
    header.putInt(0x40, miniFatSectors)
    header.putInt(0x44, Cfb.EndOfChain)   // no DIFAT sectors
    header.putInt(0x48, 0)
    (0 until 109).foreach { i =>
      header.putInt(0x4C + i * 4,
        if (i < fatSecIds.length) fatSecIds(i) else Cfb.FreeSect)
    }

    // ---- assemble
    val out = new java.io.ByteArrayOutputStream()
    out.write(header.array())
    val body = ByteBuffer.allocate(next * SectorSize).order(ByteOrder.LITTLE_ENDIAN)
    // FAT
    fatSecIds.zipWithIndex.foreach { case (id, k) =>
      var j = 0
      while (j < SectorSize / 4) {
        body.putInt(id * SectorSize + j * 4, fat(k * (SectorSize / 4) + j))
        j += 1
      }
    }
    def blit(start: Int, data: Array[Byte]): Unit = {
      var i = 0
      while (i < data.length) { body.put(start * SectorSize + i, data(i)); i += 1 }
    }
    blit(dirStart, dir.array())
    if (miniFatSectors > 0) {
      val mf = ByteBuffer.allocate(miniFatSectors * SectorSize)
        .order(ByteOrder.LITTLE_ENDIAN)
      miniFatEntries.zipWithIndex.foreach { case (v, k) => mf.putInt(k * 4, v) }
      (miniFatEntries.length until miniFatSectors * SectorSize / 4)
        .foreach(k => mf.putInt(k * 4, Cfb.FreeSect))
      blit(miniFatStart, mf.array())
    }
    if (miniStreamSectors > 0) blit(miniStreamStart, miniStreamBytes)
    big.foreach { case (name, data) => blit(bigStarts(name), data) }
    out.write(body.array())
    out.toByteArray
  }
}

package graft.operators

/** OLE2 / Compound File Binary (CFB) container + text extractors for
  * the LEGACY Office binary formats the reference accepts
  * (converter.py:13 routes .doc/.ppt/.xls through MarkItDown) — the
  * last converter family that was stubbed. Pure-JVM structured
  * parsing, the same class as the PDF/RTF/OOXML parsers in
  * [[Convert]]: no native libs, no network, deterministic.
  *
  * Format notes (all public specs: MS-CFB, MS-DOC, MS-PPT, MS-XLS):
  *  - CFB: 512-byte header, FAT-chained 512-byte sectors, a directory
  *    of 128-byte entries, and a 64-byte-sector "mini stream" (held in
  *    the root entry) for streams under the 4096-byte cutoff.
  *  - .doc: the `WordDocument` stream holds the FIB; the piece table
  *    (PlcPcd, inside the Clx at FIB.fcClx in the `0Table`/`1Table`
  *    stream) maps character positions to text runs, each flagged
  *    8-bit CP1252 ("compressed") or UTF-16LE.
  *  - .ppt: the `PowerPoint Document` stream is a record tree; text
  *    lives in TextCharsAtom (UTF-16LE) / TextBytesAtom (CP1252).
  *  - .xls: the `Workbook` stream is BIFF8 records; strings live in
  *    the SST (shared-string table, Continue-record aware) referenced
  *    by LABELSST cells, plus old-style inline LABEL cells.
  *
  * Honest subset: unencrypted Word 97+/PowerPoint 97+/BIFF8 files.
  * Every extractor returns None outside it and [[Convert.convert]]
  * falls back to the documented deterministic stub.
  */
object Ole {

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private val EndOfChain = 0xFFFFFFFE // sentinels are negative as Int

  /** Directory entry: (name, type 2=stream/5=root, start sector, byte size). */
  private final case class Entry(name: String, entryType: Int, start: Int, size: Long)

  /** Parse a CFB container into stream name → bytes. None if the
    * signature/geometry is wrong; hostile chain loops are bounded.
    */
  def streams(bytes: Array[Byte]): Option[Map[String, Array[Byte]]] = {
    try {
      if (bytes == null || bytes.length < 512) return None
      val sig = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
      if (!(0 until 8).forall(i => (bytes(i) & 0xff) == sig(i))) return None
      val sectorShift = le16(bytes, 30)
      if (sectorShift < 7 || sectorShift > 12) return None
      val sectorSize = 1 << sectorShift
      val miniSize = 1 << le16(bytes, 32)
      val nFat = le32(bytes, 44)
      val firstDir = le32(bytes, 48)
      val miniCutoff = le32(bytes, 56)
      val firstMiniFat = le32(bytes, 60)
      val firstDifat = le32(bytes, 68)

      def sector(i: Int): Array[Byte] = {
        val from = (i + 1).toLong << sectorShift
        if (from < 0 || from >= bytes.length) Array.empty[Byte]
        else java.util.Arrays.copyOfRange(bytes, from.toInt,
          math.min(from + sectorSize, bytes.length.toLong).toInt)
      }

      // DIFAT: 109 header slots, then chained DIFAT sectors (rare)
      val difat = scala.collection.mutable.ArrayBuffer[Int]()
      var k = 0
      while (k < 109) { difat += le32(bytes, 76 + 4 * k); k += 1 }
      var ds = firstDifat
      var guard = 0
      while (ds != EndOfChain && ds >= 0 && guard < 4096) {
        val sec = sector(ds)
        if (sec.length < sectorSize) { ds = EndOfChain }
        else {
          var j = 0
          while (j < sectorSize / 4 - 1) { difat += le32(sec, 4 * j); j += 1 }
          ds = le32(sec, sectorSize - 4)
        }
        guard += 1
      }
      val fat: Array[Int] = difat.take(nFat).filter(_ >= 0).toArray.flatMap { s =>
        val sec = sector(s)
        (0 until sec.length / 4).map(j => le32(sec, 4 * j))
      }

      // Walk a FAT chain; the visit bound defuses hostile cycles.
      def chain(start: Int, table: Array[Int]): Seq[Int] = {
        val out = scala.collection.mutable.ArrayBuffer[Int]()
        var s = start
        while (s >= 0 && s < table.length && out.length <= table.length) {
          out += s
          s = table(s)
        }
        out.toSeq
      }

      def readChain(start: Int, size: Long): Array[Byte] = {
        val out = new java.io.ByteArrayOutputStream()
        chain(start, fat).foreach(s => out.write(sector(s)))
        val a = out.toByteArray
        java.util.Arrays.copyOf(a, math.min(size, a.length.toLong).toInt)
      }

      val dirBytes = {
        val out = new java.io.ByteArrayOutputStream()
        chain(firstDir, fat).foreach(s => out.write(sector(s)))
        out.toByteArray
      }
      val entries = (0 until dirBytes.length / 128).flatMap { i =>
        val off = i * 128
        val nameLen = le16(dirBytes, off + 64)
        if (nameLen < 2 || nameLen > 64) None
        else Some(Entry(
          new String(dirBytes, off, nameLen - 2, "UTF-16LE"),
          dirBytes(off + 66) & 0xff,
          le32(dirBytes, off + 116),
          le32(dirBytes, off + 120).toLong & 0xFFFFFFFFL))
      }
      val root = entries.find(_.entryType == 5).getOrElse(return None)

      val miniFat: Array[Int] = chain(firstMiniFat, fat).toArray.flatMap { s =>
        val sec = sector(s)
        (0 until sec.length / 4).map(j => le32(sec, 4 * j))
      }
      lazy val miniStream: Array[Byte] = readChain(root.start, root.size)
      def readMiniChain(start: Int, size: Long): Array[Byte] = {
        val out = new java.io.ByteArrayOutputStream()
        chain(start, miniFat).foreach { s =>
          val off = s * miniSize
          if (off >= 0 && off < miniStream.length)
            out.write(miniStream, off, math.min(miniSize, miniStream.length - off))
        }
        java.util.Arrays.copyOf(out.toByteArray, math.min(size, out.size().toLong).toInt)
      }

      Some(entries.collect {
        case e if e.entryType == 2 && e.size > 0 =>
          e.name -> (if (e.size < miniCutoff) readMiniChain(e.start, e.size)
                     else readChain(e.start, e.size))
      }.toMap)
    } catch { case _: Exception => None }
  }

  /** Word control characters → text: CR is the paragraph mark, 0x07
    * ends a table cell/row, 0x0B is a hard line break; field/object
    * markers and other control bytes drop.
    */
  private def cleanText(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\r' || c == '\u000B') sb.append('\n')
      else if (c == '\u0007') sb.append('\t')
      else if (c >= ' ' || c == '\n' || c == '\t' || c == '\f') sb.append(c)
      // else: field/object markers (0x01, 0x13-0x15, ...) drop
      i += 1
    }
    sb.toString.replaceAll("\n{3,}", "\n\n").trim
  }

  /** Word 97+ `.doc` → text via the FIB + piece table (MS-DOC
    * 2.4.1 "Retrieving Text"): each PCD maps a CP range to a byte
    * offset in the WordDocument stream, flagged CP1252 or UTF-16LE.
    */
  def docToText(bytes: Array[Byte]): Option[String] = {
    try {
      val st = streams(bytes).getOrElse(return None)
      val word = st.getOrElse("WordDocument", return None)
      if (word.length < 0x01AA || le16(word, 0) != 0xA5EC) return None
      val flags = le16(word, 0x000A)
      if ((flags & 0x0100) != 0) return None // fEncrypted: honest subset ends here
      val tableName = if ((flags & 0x0200) != 0) "1Table" else "0Table"
      val table = st.get(tableName).orElse(st.get("1Table")).orElse(st.get("0Table"))
        .getOrElse(return None)
      val ccpText = le32(word, 0x004C)
      val fcClx = le32(word, 0x01A2)
      val lcbClx = le32(word, 0x01A6)
      if (ccpText <= 0 || fcClx < 0 || lcbClx <= 0 || fcClx + lcbClx > table.length) return None

      // Clx = Prc* then Pcdt(0x02, lcb, PlcPcd)
      var p = fcClx
      val end = fcClx + lcbClx
      var plc: Option[(Array[Int], Array[Byte])] = None
      while (p < end && plc.isEmpty) {
        (table(p) & 0xff) match {
          case 1 => p += 3 + le16(table, p + 1) // Prc: skip grpprl
          case 2 =>
            val lcb = le32(table, p + 1)
            val n = (lcb - 4) / 12
            if (n <= 0 || p + 5 + lcb > end + 1) return None
            val cps = Array.tabulate(n + 1)(i => le32(table, p + 5 + 4 * i))
            val pcds = java.util.Arrays.copyOfRange(table, p + 5 + 4 * (n + 1), p + 5 + lcb)
            plc = Some((cps, pcds))
          case _ => return None
        }
      }
      val (cps, pcds) = plc.getOrElse(return None)
      val sb = new StringBuilder
      var i = 0
      while (i < cps.length - 1 && cps(i) < ccpText) {
        val fcRaw = le32(pcds, 8 * i + 2)
        val len = math.min(cps(i + 1), ccpText) - cps(i)
        if (len > 0) {
          if ((fcRaw & 0x40000000) != 0) { // fCompressed: 8-bit CP1252 at fc/2
            val off = (fcRaw & 0x3FFFFFFF) / 2
            if (off >= 0 && off < word.length)
              sb.append(new String(word, off, math.min(len, word.length - off), "windows-1252"))
          } else {
            val off = fcRaw & 0x3FFFFFFF
            if (off >= 0 && off < word.length)
              sb.append(new String(word, off, math.min(2 * len, word.length - off), "UTF-16LE"))
          }
        }
        i += 1
      }
      Some(cleanText(sb.toString)).filter(_.nonEmpty)
    } catch { case _: Exception => None }
  }

  /** PowerPoint 97+ `.ppt` → text: walk the record tree of the
    * `PowerPoint Document` stream and collect TextCharsAtom (0x0FA0,
    * UTF-16LE) and TextBytesAtom (0x0FA8, CP1252) payloads in
    * document order.
    */
  def pptToText(bytes: Array[Byte]): Option[String] = {
    try {
      val ppt = streams(bytes).flatMap(_.get("PowerPoint Document")).getOrElse(return None)
      val out = scala.collection.mutable.ArrayBuffer[String]()
      def walk(from: Int, to: Int, depth: Int): Unit = {
        var p = from
        while (p + 8 <= to) {
          val verInst = le16(ppt, p)
          val typ = le16(ppt, p + 2)
          val len = le32(ppt, p + 4)
          if (len < 0 || p + 8 + len > to) return
          if ((verInst & 0x000F) == 0x000F && depth < 32) walk(p + 8, p + 8 + len, depth + 1)
          else typ match {
            case 0x0FA0 => out += new String(ppt, p + 8, len - (len % 2), "UTF-16LE")
            case 0x0FA8 => out += new String(ppt, p + 8, len, "windows-1252")
            case _      =>
          }
          p += 8 + len
        }
      }
      walk(0, ppt.length, 0)
      val text = out.map(cleanText).filter(_.nonEmpty).mkString("\n")
      if (text.isEmpty) None else Some(text)
    } catch { case _: Exception => None }
  }

  /** Cursor over a BIFF record plus its Continue records: fixed fields
    * never split across a boundary, but STRING CHARACTERS do — and
    * each continuation restarts with its own high-byte flag (the
    * MS-XLS "Continue" rule the naive concatenation gets wrong).
    */
  private final class BiffCursor(parts: Seq[Array[Byte]]) {
    private var pi = 0
    private var off = 0
    private def part = parts(pi)
    private def hop(): Unit = { pi += 1; off = 0 }
    private def ensure(n: Int): Unit = { while (off + n > part.length && pi + 1 < parts.length) hop() }
    def u8(): Int = { ensure(1); val v = part(off) & 0xff; off += 1; v }
    def u16(): Int = { ensure(2); val v = le16(part, off); off += 2; v }
    def u32(): Int = { ensure(4); val v = le32(part, off); off += 4; v }
    def skip(n: Int): Unit = {
      var left = n
      while (left > 0) {
        if (off >= part.length && pi + 1 < parts.length) hop()
        val take = math.min(left, part.length - off)
        if (take <= 0) return
        off += take; left -= take
      }
    }
    def atEnd: Boolean = pi >= parts.length - 1 && off >= part.length
    /** Read `cch` characters, re-reading the grbit at each Continue
      * boundary (high/compressed can FLIP mid-string).
      */
    def chars(cch: Int, highInit: Boolean): String = {
      val sb = new StringBuilder
      var left = cch
      var high = highInit
      while (left > 0) {
        if (off >= part.length) {
          if (pi + 1 >= parts.length) return sb.toString
          hop()
          high = (u8() & 0x01) == 1
        }
        val availChars = if (high) (part.length - off) / 2 else part.length - off
        val take = math.min(availChars, left)
        if (take <= 0) return sb.toString
        sb.append(new String(part, off, if (high) 2 * take else take,
          if (high) "UTF-16LE" else "windows-1252"))
        off += (if (high) 2 * take else take)
        left -= take
      }
      sb.toString
    }
  }

  /** Excel 97+ BIFF8 `.xls` → text: decode the SST (Continue-aware),
    * then emit strings in CELL order (LABELSST references + inline
    * LABEL cells). Falls back to SST order when no cells reference it
    * (defensive: some writers emit only the table).
    */
  def xlsToText(bytes: Array[Byte]): Option[String] = {
    try {
      val wb = streams(bytes)
        .flatMap(st => st.get("Workbook").orElse(st.get("Book"))).getOrElse(return None)
      // one pass: record stream → (type, payload) list
      val records = scala.collection.mutable.ArrayBuffer[(Int, Array[Byte])]()
      var p = 0
      while (p + 4 <= wb.length) {
        val typ = le16(wb, p)
        val len = le16(wb, p + 2)
        if (p + 4 + len > wb.length) p = wb.length
        else {
          records += typ -> java.util.Arrays.copyOfRange(wb, p + 4, p + 4 + len)
          p += 4 + len
        }
      }
      // SST (0x00FC) + its Continue (0x003C) records
      val sstIdx = records.indexWhere(_._1 == 0x00FC)
      val sst: IndexedSeq[String] =
        if (sstIdx < 0) IndexedSeq.empty
        else {
          val parts = records(sstIdx)._2 +:
            records.drop(sstIdx + 1).takeWhile(_._1 == 0x003C).map(_._2).toSeq
          val cur = new BiffCursor(parts)
          cur.skip(4) // cstTotal
          val cstUnique = cur.u32()
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < cstUnique && !cur.atEnd) {
            val cch = cur.u16()
            val grbit = cur.u8()
            val high = (grbit & 0x01) == 1
            val rich = (grbit & 0x08) != 0
            val ext = (grbit & 0x04) != 0
            val cRun = if (rich) cur.u16() else 0
            val cbExt = if (ext) cur.u32() else 0
            out += cur.chars(cch, high)
            cur.skip(4 * cRun)
            cur.skip(cbExt)
            i += 1
          }
          out.toIndexedSeq
        }
      // cell text in stream order
      val cells = records.flatMap {
        case (0x00FD, d) if d.length >= 10 => // LABELSST: isst at offset 6
          val isst = le32(d, 6)
          if (isst >= 0 && isst < sst.length) Some(sst(isst)) else None
        case (0x0204, d) if d.length >= 9 => // LABEL: inline XLUnicodeString at 6
          val cch = le16(d, 6)
          val high = (d(8) & 0x01) == 1
          val n = math.min(if (high) 2 * cch else cch, d.length - 9)
          Some(new String(d, 9, n, if (high) "UTF-16LE" else "windows-1252"))
        case _ => None
      }
      val chosen = if (cells.nonEmpty) cells.toSeq else sst
      val text = chosen.map(cleanText).filter(_.nonEmpty).mkString("\n")
      if (text.isEmpty) None else Some(text)
    } catch { case _: Exception => None }
  }
}

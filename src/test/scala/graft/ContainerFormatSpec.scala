package graft

import java.nio.file.{Files, Paths}

/** Third-party-reader proof for the Avro and xlsx connectors: the
  * round-trip tests (IoSpec, ExcelInteropSpec) prove self-read; these
  * walk the WRITTEN BYTES with independent minimal parsers — no
  * avro-core, no POI-alike — asserting the on-disk layout follows the
  * public specs (Avro 1.11 object container file; OPC/OOXML package),
  * so any Avro tool or spreadsheet app can open the files. A writer
  * regression that avro-core's own reader would mask (it wrote it, it
  * can read it) fails here at the byte level. */
class ContainerFormatSpec extends SparkSpecBase {

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-$tag").toString

  // ---- minimal Avro container walker -------------------------------

  /** Cursor over the raw file bytes. */
  private class Cur(val b: Array[Byte]) {
    var p = 0
    def u8(): Int = { val v = b(p) & 0xff; p += 1; v }
    /** Avro long: zigzag varint, little-endian 7-bit groups. */
    def zlong(): Long = {
      var shift = 0
      var acc = 0L
      var byte = u8()
      while ((byte & 0x80) != 0) {
        acc |= (byte & 0x7fL) << shift
        shift += 7
        byte = u8()
      }
      acc |= (byte & 0x7fL) << shift
      (acc >>> 1) ^ -(acc & 1) // zigzag decode
    }
    def bytes(n: Int): Array[Byte] = { val r = b.slice(p, p + n); p += n; r }
    def atEnd: Boolean = p == b.length
  }

  /** Parse header; returns (metadata map, sync marker, cursor at first
    * block). Handles the spec's negative-count map blocks (abs count +
    * ignored byte size). */
  private def readHeader(c: Cur): (Map[String, Array[Byte]], Array[Byte]) = {
    assert(c.bytes(4).toSeq == Seq[Byte]('O', 'b', 'j', 1),
      "container must start with the Avro magic Obj\\x01")
    val meta = scala.collection.mutable.Map[String, Array[Byte]]()
    var n = c.zlong()
    while (n != 0) {
      val cnt = if (n < 0) { c.zlong(); -n } else n // negative: size-prefixed block
      for (_ <- 1L to cnt) {
        val klen = c.zlong()
        val key = new String(c.bytes(klen.toInt), "UTF-8")
        val vlen = c.zlong()
        meta(key) = c.bytes(vlen.toInt)
      }
      n = c.zlong()
    }
    val sync = c.bytes(16)
    (meta.toMap, sync)
  }

  test("written Avro container follows the object-container spec byte for byte") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = tmpDir("avrofmt")
    graft.sources.AvroSource.write(emb, dir)
    val files = graft.sources.AvroSource.listFiles(dir)
    assert(files.nonEmpty)
    var total = 0L
    files.foreach { f =>
      val c = new Cur(Files.readAllBytes(Paths.get(f)))
      val (meta, sync) = readHeader(c)
      // schema must be present and parse as a JSON record with the
      // DataFrame's field names in order
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val schema = om.readTree(new String(meta("avro.schema"), "UTF-8"))
      assert(schema.get("type").asText == "record", schema.toString)
      val fieldNames = (0 until schema.get("fields").size())
        .map(i => schema.get("fields").get(i).get("name").asText)
      assert(fieldNames == emb.schema.fieldNames.toSeq, fieldNames.toString)
      // codec, if declared, must be the spec's uncompressed "null"
      meta.get("avro.codec").foreach(cdc =>
        assert(new String(cdc, "UTF-8") == "null", "codec must be null"))
      // data blocks: [count][byteSize][bytes][sync] repeated; the file
      // must end EXACTLY on a block boundary with matching sync markers
      while (!c.atEnd) {
        val nRecs = c.zlong()
        assert(nRecs > 0, s"non-positive block count $nRecs")
        val nBytes = c.zlong()
        assert(nBytes > 0 && c.p + nBytes + 16 <= c.b.length,
          s"block size $nBytes overruns the file")
        c.bytes(nBytes.toInt)
        assert(c.bytes(16).toSeq == sync.toSeq,
          "block sync marker differs from the header's")
        total += nRecs
      }
    }
    assert(total == emb.count(), s"container blocks declare $total records")
  }

  test("empty-DataFrame Avro container is a valid schema-only file") {
    val dir = tmpDir("avroempty")
    val empty = Tables(spark, "/root/testdata/sf0.001", "embeddings").limit(0)
    graft.sources.AvroSource.write(empty, dir)
    val files = graft.sources.AvroSource.listFiles(dir)
    assert(files.size == 1)
    val c = new Cur(Files.readAllBytes(Paths.get(files.head)))
    val (meta, _) = readHeader(c)
    assert(meta.contains("avro.schema"))
    assert(c.atEnd, "schema-only container must hold zero blocks")
    // and the connector reads it back as an empty frame of the schema
    val back = graft.sources.AvroSource.read(spark, dir)
    assert(back.count() == 0 && back.schema.fieldNames.toSeq ==
      empty.schema.fieldNames.toSeq)
  }

  // ---- xlsx: OPC package structure ---------------------------------

  test("written xlsx is a well-formed OPC package any spreadsheet app can open") {
    val f = tmpDir("xlsxfmt") + "/data.xlsx"
    graft.sources.ExcelSource.write(abc, f)
    // ZIP local-file magic
    val head = Files.readAllBytes(Paths.get(f)).take(4)
    assert(head.toSeq == Seq[Byte]('P', 'K', 3, 4), "xlsx must be a ZIP")
    val zf = new java.util.zip.ZipFile(f)
    try {
      val entries = {
        val e = zf.entries(); val b = Seq.newBuilder[String]
        while (e.hasMoreElements) b += e.nextElement().getName
        b.result()
      }
      for (required <- Seq("[Content_Types].xml", "_rels/.rels",
          "xl/workbook.xml", "xl/worksheets/sheet1.xml"))
        assert(entries.contains(required), s"missing OPC part $required: $entries")
      // every XML part must be well-formed (independent parser, namespace-aware)
      val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      dbf.setNamespaceAware(true)
      entries.filter(_.endsWith(".xml")).foreach { name =>
        val doc = dbf.newDocumentBuilder().parse(zf.getInputStream(zf.getEntry(name)))
        assert(doc.getDocumentElement != null, s"$name parsed to nothing")
      }
      // the sheet must declare as many rows as the frame has (+ header)
      val sheet = dbf.newDocumentBuilder()
        .parse(zf.getInputStream(zf.getEntry("xl/worksheets/sheet1.xml")))
      val rows = sheet.getElementsByTagNameNS("*", "row")
      assert(rows.getLength == abc.count() + 1,
        s"sheet declares ${rows.getLength} rows")
    } finally zf.close()
  }
}

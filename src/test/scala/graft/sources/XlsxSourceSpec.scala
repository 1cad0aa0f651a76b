package graft.sources

import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkTestBase

/** Builds a real XLSX (ZIP of OOXML parts) in the test and reads it back
  * through the graft-xlsx source: shared strings, inline strings,
  * formula-cached strings, numbers, booleans, blank cells, ragged rows,
  * and workbook→rels sheet resolution. */
object XlsxFixture {
  def write(path: java.nio.file.Path): Unit = {
    val zip = new ZipOutputStream(java.nio.file.Files.newOutputStream(path))
    def entry(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes("UTF-8"))
      zip.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    entry("xl/workbook.xml",
      """<?xml version="1.0"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |  <sheets>
        |    <sheet name="Occupations" sheetId="1" r:id="rId7"/>
        |    <sheet name="Ignored" sheetId="2" r:id="rId8"/>
        |  </sheets>
        |</workbook>""".stripMargin)
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |  <Relationship Id="rId8" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/ignored.xml"/>
        |  <Relationship Id="rId7" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/occupations.xml"/>
        |</Relationships>""".stripMargin)
    entry("xl/sharedStrings.xml",
      """<?xml version="1.0"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">
        |  <si><t>Occupation (SOC)</t></si>
        |  <si><t>Total Postings</t></si>
        |  <si><r><t>Software </t></r><r><t>Developers</t></r></si>
        |  <si><t xml:space="preserve">Data Scientists</t></si>
        |</sst>""".stripMargin)
    // row 3 omits B (blank); row 4 uses inlineStr + bool and has no r attrs
    entry("xl/worksheets/occupations.xml",
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |  <sheetData>
        |    <row r="1">
        |      <c r="A1" t="s"><v>0</v></c>
        |      <c r="B1" t="s"><v>1</v></c>
        |      <c r="C1" t="inlineStr"><is><t>Median Duration</t></is></c>
        |    </row>
        |    <row r="2">
        |      <c r="A2" t="s"><v>2</v></c>
        |      <c r="B2"><v>6390</v></c>
        |      <c r="C2"><v>39.5</v></c>
        |    </row>
        |    <row r="3">
        |      <c r="A3" t="s"><v>3</v></c>
        |      <c r="C3"><v>21</v></c>
        |    </row>
        |    <row r="4">
        |      <c t="inlineStr"><is><t>Statisticians</t></is></c>
        |      <c t="b"><v>1</v></c>
        |    </row>
        |  </sheetData>
        |</worksheet>""".stripMargin)
    entry("xl/worksheets/ignored.xml",
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |  <sheetData><row r="1"><c r="A1" t="inlineStr"><is><t>WRONG SHEET</t></is></c></row></sheetData>
        |</worksheet>""".stripMargin)
    zip.close()
  }
}

class XlsxSourceSpec extends SparkTestBase {

  private lazy val file = {
    val p = java.nio.file.Files.createTempFile("lightcast", ".xlsx")
    XlsxFixture.write(p)
    p.toFile.deleteOnExit()
    p.toString
  }

  test("reads header, shared/inline strings, numbers, bools, blanks") {
    val df = spark.read.format("graft-xlsx").option("header", "true").load(file)
    assert(df.schema.fieldNames.toSeq ==
      Seq("Occupation (SOC)", "Total Postings", "Median Duration"))
    val rows = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq(
      ("Software Developers", "6390", "39.5"), // rich-text runs concatenate
      ("Data Scientists", null, "21"),         // blank B3 → null
      ("Statisticians", "true", null)))        // no-r-attr cells, bool, ragged
  }

  test("header=false exposes positional columns") {
    val df = spark.read.format("graft-xlsx").option("header", "false").load(file)
    assert(df.schema.fieldNames.toSeq == Seq("_c0", "_c1", "_c2"))
    assert(df.count() == 4)
  }

  test("column pruning keeps cell positions straight") {
    val df = spark.read.format("graft-xlsx").option("header", "true").load(file)
      .select("Median Duration")
    assert(df.collect().map(_.getString(0)).toSeq == Seq("39.5", "21", null))
  }

  test("duplicate header labels get positional suffixes, cells stay aligned") {
    val p = java.nio.file.Files.createTempFile("dup", ".xlsx")
    val zip = new ZipOutputStream(java.nio.file.Files.newOutputStream(p))
    def entry(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name)); zip.write(content.getBytes("UTF-8")); zip.closeEntry()
    }
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="x"><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>Postings</t></is></c>
        |  <c r="B1" t="inlineStr"><is><t>Median</t></is></c>
        |  <c r="C1" t="inlineStr"><is><t>Postings</t></is></c></row>
        |<row r="2"><c r="A2"><v>1</v></c><c r="B2"><v>2</v></c><c r="C2"><v>3</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zip.close()
    p.toFile.deleteOnExit()
    val df = spark.read.format("graft-xlsx").option("header", "true").load(p.toString)
    assert(df.schema.fieldNames.toSeq == Seq("Postings", "Median", "Postings_1"))
    val r = df.collect().head
    assert((r.getString(0), r.getString(1), r.getString(2)) == ("1", "2", "3"))
  }

  test("empty or malformed shared-string cells degrade to blank, not error") {
    val p = java.nio.file.Files.createTempFile("emptyss", ".xlsx")
    val zip = new ZipOutputStream(java.nio.file.Files.newOutputStream(p))
    def entry(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name)); zip.write(content.getBytes("UTF-8")); zip.closeEntry()
    }
    entry("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst xmlns="x"><si><t>alpha</t></si></sst>""")
    // B2: `<c t="s"/>` — legal OOXML for an empty shared-string cell (no <v>);
    // C2: non-numeric index — both must blank out, not NumberFormatException
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="x"><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>h1</t></is></c>
        |  <c r="B1" t="inlineStr"><is><t>h2</t></is></c>
        |  <c r="C1" t="inlineStr"><is><t>h3</t></is></c></row>
        |<row r="2"><c r="A2" t="s"><v>0</v></c><c r="B2" t="s"/>
        |  <c r="C2" t="s"><v>oops</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zip.close()
    p.toFile.deleteOnExit()
    val df = spark.read.format("graft-xlsx").option("header", "true").load(p.toString)
    val r = df.collect().head
    assert((r.getString(0), r.getString(1), r.getString(2)) == ("alpha", null, null))
  }

  test("column letter arithmetic (AA = 26)") {
    assert(XlsxParser.colIndex("A1") == 0)
    assert(XlsxParser.colIndex("Z9") == 25)
    assert(XlsxParser.colIndex("AA12") == 26)
    assert(XlsxParser.colIndex("AB1") == 27)
  }
}

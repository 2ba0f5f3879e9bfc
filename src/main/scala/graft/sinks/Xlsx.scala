package graft.sinks

import org.apache.spark.sql.DataFrame

/** S10 — the styled-Excel heatmap table sink
  * (`/root/reference/Time_Series.py:813–837`: pandas
  * `Styler.format("{0:.5%}").background_gradient(cmap).to_excel(...)`).
  *
  * An `.xlsx` is a zip of XML parts, so the sink is pure JDK
  * (`java.util.zip` + strings) — no POI/openpyxl analog required. Value
  * cells carry the reference's 5-decimal percent number format, and the
  * value-driven coloring is expressed as a colorScale
  * conditional-formatting rule over the data range (min→max, white→red)
  * — the same gradient-by-value semantics; the one divergence, recorded
  * in COVERAGE.md, is mechanism: the reference bakes a literal fill per
  * cell at write time, this sink ships the equivalent data-driven rule.
  *
  * A heatmap table is a report artifact (weeks × variants) and
  * inherently driver-sized; `maxRows` fail-fasts if the sink is pointed
  * at an unbounded frame (same guard discipline as
  * `Similarity.requireBounded`).
  */
object Xlsx {

  private def esc(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    .replace("\"", "&quot;")

  /** 1-based column index → A1-style letters (1→A, 27→AA). */
  def colLetters(n: Int): String = {
    require(n >= 1, s"column index $n")
    var x = n
    val sb = new StringBuilder
    while (x > 0) {
      val r = (x - 1) % 26
      sb.insert(0, ('A' + r).toChar)
      x = (x - 1) / 26
    }
    sb.toString
  }

  /** Write `df` — one label column followed by numeric value columns —
    * as a single-sheet styled heatmap workbook at `path`. */
  def writeHeatmap(df: DataFrame, path: String, sheetName: String,
      maxRows: Int = 10000): Unit = {
    val cols = df.columns
    require(cols.length >= 2, "heatmap needs a label column + values")
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"heatmap sink is for report-sized frames; got > $maxRows rows — " +
        "aggregate first (weeks × variants), never point this at a corpus")

    val header = "<row r=\"1\">" + cols.zipWithIndex.map { case (c, i) =>
      s"""<c r="${colLetters(i + 1)}1" t="inlineStr"><is><t>${esc(c)}</t></is></c>"""
    }.mkString + "</row>"
    val body = rows.zipWithIndex.map { case (r, ri) =>
      val rr = ri + 2
      val label =
        s"""<c r="A$rr" t="inlineStr"><is><t>${esc(String.valueOf(r.get(0)))}</t></is></c>"""
      val values = (1 until cols.length).map { ci =>
        val ref = s"${colLetters(ci + 1)}$rr"
        r.get(ci) match {
          case null => s"""<c r="$ref" s="1"/>"""
          // NaN/Infinity are not valid SpreadsheetML numbers — Excel
          // declares the workbook corrupt; write a blank styled cell
          // (what pandas' writer does for NaN)
          case n: java.lang.Double if n.isNaN || n.isInfinite =>
            s"""<c r="$ref" s="1"/>"""
          case n: java.lang.Float if n.isNaN || n.isInfinite =>
            s"""<c r="$ref" s="1"/>"""
          case n: Number => s"""<c r="$ref" s="1"><v>${n.toString}</v></c>"""
          case other =>
            s"""<c r="$ref" t="inlineStr"><is><t>${esc(other.toString)}</t></is></c>"""
        }
      }.mkString
      s"""<row r="$rr">$label$values</row>"""
    }.mkString
    val lastRef = s"${colLetters(cols.length)}${rows.length + 1}"
    val dataRange = if (rows.isEmpty) "B2:B2" else s"B2:$lastRef"
    val sheet =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<dimension ref="A1:$lastRef"/>
         |<sheetData>$header$body</sheetData>
         |<conditionalFormatting sqref="$dataRange">
         |<cfRule type="colorScale" priority="1"><colorScale>
         |<cfvo type="min"/><cfvo type="max"/>
         |<color rgb="FFFFFFFF"/><color rgb="FFFF0000"/>
         |</colorScale></cfRule>
         |</conditionalFormatting>
         |</worksheet>""".stripMargin
    val styles =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<numFmts count="1"><numFmt numFmtId="164" formatCode="0.00000%"/></numFmts>
        |<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>
        |<fills count="2"><fill><patternFill patternType="none"/></fill>
        |<fill><patternFill patternType="gray125"/></fill></fills>
        |<borders count="1"><border/></borders>
        |<cellStyleXfs count="1"><xf/></cellStyleXfs>
        |<cellXfs count="2"><xf/><xf numFmtId="164" applyNumberFormat="1"/></cellXfs>
        |</styleSheet>""".stripMargin
    val workbook =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
         | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets><sheet name="${esc(sheetName)}" sheetId="1" r:id="rId1"/></sheets>
         |</workbook>""".stripMargin
    val workbookRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
        |</Relationships>""".stripMargin
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
        |</Types>""".stripMargin

    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(path))
    try {
      def entry(name: String, content: String): Unit = {
        zos.putNextEntry(new java.util.zip.ZipEntry(name))
        zos.write(content.getBytes("UTF-8"))
        zos.closeEntry()
      }
      entry("[Content_Types].xml", contentTypes)
      entry("_rels/.rels", rootRels)
      entry("xl/workbook.xml", workbook)
      entry("xl/_rels/workbook.xml.rels", workbookRels)
      entry("xl/styles.xml", styles)
      entry("xl/worksheets/sheet1.xml", sheet)
    } finally zos.close()
  }
}

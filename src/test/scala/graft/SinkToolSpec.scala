package graft

import graft.operators.ExternalTool
import graft.sinks.Xlsx
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** S10 (styled-Excel heatmap sink) + S12 (external-tool exec) — the two
  * operators that were declared non-goals through round 7, now closed. */
class SinkToolSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("sink-tool-spec")

  override def afterAll(): Unit = spark.stop()

  private def readZip(path: String): Map[String, String] = {
    val zf = new java.util.zip.ZipFile(path)
    try {
      import scala.jdk.CollectionConverters._
      zf.entries().asScala.map { e =>
        e.getName -> new String(zf.getInputStream(e).readAllBytes(), "UTF-8")
      }.toMap
    } finally zf.close()
  }

  private def parseXml(s: String) = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    f.newDocumentBuilder().parse(
      new java.io.ByteArrayInputStream(s.getBytes("UTF-8")))
  }

  test("S10: heatmap xlsx carries values, percent format, and a color scale") {
    import spark.implicits._
    val df = Seq(
      ("D614G", 0.91234, 0.95),
      ("N501Y", 0.00123, 0.25),
      ("ref", 0.0, 0.5))
      .toDF("variant", "2021-01-03", "2021-01-10")
    val path = "/tmp/graft_heatmap_test.xlsx"
    Xlsx.writeHeatmap(df, path, "Spike - Global")
    val parts = readZip(path)
    assert(parts.keySet == Set("[Content_Types].xml", "_rels/.rels",
      "xl/workbook.xml", "xl/_rels/workbook.xml.rels", "xl/styles.xml",
      "xl/worksheets/sheet1.xml"))
    // every part is well-formed XML
    parts.values.foreach(parseXml)
    val sheet = parseXml(parts("xl/worksheets/sheet1.xml"))
    val cells = sheet.getElementsByTagName("c")
    assert(cells.getLength == 12, "3 header + 3 label + 6 value cells")
    val vs = sheet.getElementsByTagName("v")
    val values = (0 until vs.getLength).map(vs.item(_).getTextContent).toSet
    assert(values == Set("0.91234", "0.95", "0.00123", "0.25", "0.0", "0.5"))
    // numeric cells reference the percent style
    val styled = (0 until cells.getLength).map(cells.item(_))
      .count(c => c.getAttributes.getNamedItem("s") != null &&
        c.getAttributes.getNamedItem("s").getTextContent == "1")
    assert(styled == 6, "all value cells carry the percent style")
    // the value-gradient rule covers the data range
    val rule = sheet.getElementsByTagName("cfRule").item(0)
    assert(rule.getAttributes.getNamedItem("type").getTextContent == "colorScale")
    assert(sheet.getElementsByTagName("color").getLength == 2)
    assert(parts("xl/styles.xml").contains("0.00000%"),
      "reference's 5-decimal percent format")
    assert(parts("xl/workbook.xml").contains("Spike - Global"))
    // report-artifact guard: an unbounded frame fails fast
    val big = spark.range(50).select(col("id").cast("string").as("k"),
      col("id").cast("double").as("v"))
    intercept[IllegalArgumentException] {
      Xlsx.writeHeatmap(big, "/tmp/graft_heatmap_guard.xlsx", "x", maxRows = 10)
    }
  }

  test("xlsx column letters: A, Z, AA, AZ, BA, ZZ, AAA") {
    assert(Seq(1, 26, 27, 52, 53, 702, 703).map(Xlsx.colLetters) ==
      Seq("A", "Z", "AA", "AZ", "BA", "ZZ", "AAA"))
  }

  test("S12: external tool streams partitions through stdin/stdout") {
    import spark.implicits._
    val df = Seq("atg gca", "ttaa", "gcgc").toDF("seq").repartition(2)
    val out = ExternalTool.pipeLines(df, col("seq"), Seq("tr", "a-z", "A-Z"))
      .collect().map(_.getString(0)).toSet
    assert(out == Set("ATG GCA", "TTAA", "GCGC"))
    // identity tool preserves row count across partitions
    val n = ExternalTool.pipeLines(
      spark.range(500).select(col("id").cast("string").as("s")),
      col("s"), Seq("cat")).count()
    assert(n == 500)
    // a failing tool fails the job loudly, never silently drops output
    intercept[org.apache.spark.SparkException] {
      ExternalTool.pipeLines(df, col("seq"), Seq("false")).collect()
    }
    // an embedded newline would silently become TWO stdin records and
    // corrupt the row↔record protocol — it must fail, not corrupt
    intercept[org.apache.spark.SparkException] {
      ExternalTool.pipeLines(Seq("one\ntwo").toDF("seq"), col("seq"),
        Seq("cat")).collect()
    }
  }

  test("xlsx: NaN and Infinity become blank cells, not corrupt <v> entries") {
    import spark.implicits._
    val df = Seq(("r1", Double.NaN, 1.5), ("r2", Double.PositiveInfinity, 2.5))
      .toDF("label", "bad", "good")
    val path = java.nio.file.Files.createTempDirectory("xlsx").resolve("t.xlsx")
    graft.sinks.Xlsx.writeHeatmap(df, path.toString, "sheet", maxRows = 100)
    val zf = new java.util.zip.ZipFile(path.toFile)
    val sheet = new String(zf.getInputStream(
      zf.getEntry("xl/worksheets/sheet1.xml")).readAllBytes, "UTF-8")
    zf.close()
    assert(!sheet.contains("NaN") && !sheet.contains("Infinity"),
      s"non-finite leaked into SpreadsheetML: $sheet")
    assert(sheet.contains("<v>1.5</v>") && sheet.contains("<v>2.5</v>"))
  }
}

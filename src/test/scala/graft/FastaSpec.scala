package graft

import graft.sources.Fasta
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class FastaSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark = GraftSession.local("fasta-spec")

  override def afterAll(): Unit = spark.stop()

  test("read: wrapped lines, CRLF, header-only records, '>' in description") {
    val fasta =
      ">Spike|hCoV-19/x/1|2021-01-03|EPI_ISL_1|orig|lab|Human\r\n" +
        "MFVFLV\r\nLLPLVSS\r\n" +
        ">NSP5|hCoV-19/x/2|2021-01-04|EPI_ISL_2|orig|lab|Human\n" +
        "SGFRKM\n" +
        ">Empty|record|with|no|sequence|x|Human\n"
    val path = "/tmp/graft_test_read.fasta"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), fasta)
    val recs = Fasta.read(spark, path).collect().sortBy(_.header)
    assert(recs.length == 3)
    val spike = recs.find(_.header.startsWith("Spike")).get
    assert(spike.seq == "MFVFLVLLPLVSS") // wrapping + CRLF removed
    assert(recs.find(_.header.startsWith("Empty")).get.seq == "")
    val fields = Fasta.withHeaderFields(
      spark.createDataFrame(recs.toSeq).toDF())
      .filter(col("protein") === "Spike").head()
    assert(fields.getAs[String]("accession") == "EPI_ISL_1")
    assert(fields.getAs[String]("host") == "Human")
  }

  test("cluster headers: Uniq<n>;size=<k>; contract") {
    import spark.implicits._
    val df = Seq(("Uniq12;size=345;", "MF"), ("clust0;size=1;", "MF"))
      .toDF("header", "seq")
    val out = Fasta.withClusterFields(df).collect()
    assert(out.map(r => (r.getAs[String]("cluster_id"), r.getAs[Int]("cluster_size"))).toSet
      == Set(("Uniq12", 345), ("clust0", 1)))
  }

  test("DataSourceV2: format(\"fasta\") matches Fasta.read; splits never lose records") {
    // ~200 records × ~600 bytes ⇒ forcing 4 KiB splits yields ~30 splits,
    // each of which must hand boundary-straddling records to its neighbor
    val sb = new StringBuilder
    for (i <- 0 until 200) {
      sb.append(s">rec$i|field1|field2\r\n")
      val seq = ("ACDEFGHIKLMNPQRSTVWY" * 30).grouped(80).mkString("\n")
      sb.append(seq).append("\n")
    }
    val path = "/tmp/graft_test_dsv2.fasta"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), sb.toString)

    val viaRdd = Fasta.read(spark, path).collect().map(r => (r.header, r.seq)).sorted
    val viaDsv2 = spark.read.format("fasta").option("maxSplitBytes", "4096")
      .load(path).collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(viaDsv2.length == 200)
    assert(viaDsv2.toSeq == viaRdd.toSeq)

    // column pruning: a seq-only projection still parses correctly
    val seqOnly = spark.read.format("fasta").option("maxSplitBytes", "4096")
      .load(path).select("seq").collect().map(_.getString(0))
    assert(seqOnly.length == 200 && seqOnly.forall(_.length == 600))
  }

  test("fuzz: DSv2 and RDD readers agree on 50 random file layouts") {
    val rng = new scala.util.Random(99)
    for (trial <- 0 until 50) {
      val sb = new StringBuilder
      val expected = scala.collection.mutable.ArrayBuffer[(String, String)]()
      val n = 1 + rng.nextInt(12)
      for (r <- 0 until n) {
        val hdr = s"rec${trial}_$r" +
          (if (rng.nextBoolean()) "|with|fields>and|glyphs" else "")
        val seqLen = rng.nextInt(200)
        val seq = Seq.fill(seqLen)("ACDEFGHIKLMNPQRSTVWY"(rng.nextInt(20))).mkString
        val nl = if (rng.nextBoolean()) "\r\n" else "\n"
        val wrapped =
          if (seqLen == 0) ""
          else seq.grouped(1 + rng.nextInt(80)).mkString(nl) + nl
        sb.append(">").append(hdr).append(nl).append(wrapped)
        expected += ((hdr, seq))
      }
      if (rng.nextBoolean()) sb.setLength(sb.length - 1) // no trailing newline
      val path = s"/tmp/graft_fuzz_$trial.fasta"
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path), sb.toString)
      val viaRdd = Fasta.read(spark, path).collect()
        .map(r => (r.header, r.seq)).sortBy(_._1)
      val viaDsv2 = spark.read.format("fasta")
        .option("maxSplitBytes", (64 + rng.nextInt(512)).toString).load(path)
        .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
      assert(viaRdd.toSeq == expected.sortBy(_._1).toSeq, s"RDD reader trial $trial")
      assert(viaDsv2.toSeq == viaRdd.toSeq, s"DSv2 reader trial $trial")
    }
  }

  test("partitioned write (S3) round-trips through read") {
    import spark.implicits._
    val df = Seq(
      ("Spike|a|b|EPI1|c|d|Human", "MFVF", "Spike"),
      ("NSP5|a|b|EPI2|c|d|Human", "SGFR", "NSP5"))
      .toDF("header", "seq", "protein")
    val out = "/tmp/graft_test_fasta_part"
    Fasta.writePartitioned(df, "protein", out)
    val back = Fasta.read(spark, s"$out/protein=Spike/*.txt").collect()
    assert(back.length == 1)
    assert(back.head.header == "Spike|a|b|EPI1|c|d|Human")
    assert(back.head.seq == "MFVF")
  }
}

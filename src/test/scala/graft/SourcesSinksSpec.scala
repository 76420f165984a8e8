package graft

import java.nio.file.Files
import java.nio.charset.Charset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.SourcesSinks
import graft.sources.SourcesSinks.WriteConcern

class SourcesSinksSpec extends SparkSpec {
  import spark.implicits._

  test("write-concern taxonomy parses all 7 reference levels; unknown -> Acknowledged") {
    val all = Seq("ACKNOWLEDGED", "UNACKNOWLEDGED", "JOURNALED", "MAJORITY", "W1", "W2", "W3")
    assert(all.map(WriteConcern.parse).distinct.size == 7)
    assert(WriteConcern.parse("whatever") == WriteConcern.Acknowledged)
    assert(WriteConcern.parse("majority") == WriteConcern.Majority)
  }

  test("readTextRecords honors a non-UTF8 charset (ISO-8859-1)") {
    val dir = Files.createTempDirectory("graft-src").toString
    val f = new java.io.File(dir, "latin1.txt")
    val content = "café crème\nnúmero dos"
    java.nio.file.Files.write(f.toPath, content.getBytes(Charset.forName("ISO-8859-1")))
    val rows = SourcesSinks.readTextRecords(spark, f.toString, "ISO-8859-1")
      .as[String].collect().sorted
    assert(rows.toSeq == Seq("café crème", "número dos"))
  }

  test("readTextRecords keeps the WHOLE record: spaces, commas, quotes, tabs") {
    val dir = Files.createTempDirectory("graft-src2").toString
    val f = new java.io.File(dir, "whole.txt")
    val lines = Seq(
      """plain words with   runs of spaces""",
      """"quoted start" and , commas, everywhere""",
      "tab\tseparated stays intact",
      """ leading and trailing spaces """)
    java.nio.file.Files.write(f.toPath,
      lines.mkString("\n").getBytes(Charset.forName("UTF-8")))
    val rows = SourcesSinks.readTextRecords(spark, f.toString)
      .as[String].collect().sorted
    assert(rows.toSeq == lines.sorted)
  }

  test("readAttributeRecords: jsonl -> MAP<STRING,STRING> attributes column") {
    val dir = Files.createTempDirectory("graft-attrs").toString
    val f = new java.io.File(dir, "attrs.jsonl")
    java.nio.file.Files.writeString(f.toPath,
      """{"filename":"a.bin","mime.type":"text/plain"}""" + "\n" +
      """{"filename":"b.bin"}""" + "\n")
    val maps = SourcesSinks.readAttributeRecords(spark, f.toString)
      .select("attributes").as[Map[String, String]].collect()
    assert(maps.toSet == Set(
      Map("filename" -> "a.bin", "mime.type" -> "text/plain"),
      Map("filename" -> "b.bin")))
  }

  test("explodeJsonArray: bulk JSON array input -> one row per document") {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    val df = Seq(
      (1, """[{"k":1,"v":"a"},{"k":2,"v":"b"}]"""),
      (2, """[{"k":3,"v":"c"}]""")
    ).toDF("src", "payload")
    val out = SourcesSinks.explodeJsonArray(df, "payload", schema)
      .select($"src", $"_doc_idx", $"_doc.k", $"_doc.v")
      .as[(Int, Int, Long, String)].collect().toSet
    assert(out == Set((1, 0, 1L, "a"), (1, 1, 2L, "b"), (2, 0, 3L, "c")))
  }

  test("writeJsonRecords round-trips rows with filename + mime metadata") {
    val dir = Files.createTempDirectory("graft-sink").toString + "/out"
    val df = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    SourcesSinks.writeJsonRecords(df, dir, "rec")
    val back = spark.read.json(dir)
    assert(back.count() == 2)
    val fn = back.select("filename").as[String].collect()
    assert(fn.forall(n => n.startsWith("rec-") && n.endsWith(".json")))
    assert(back.select("mime_type").as[String].collect().forall(_ == "application/json"))
    assert(back.select("k", "v").as[(Long, String)].collect().toSet == Set((1L, "x"), (2L, "y")))
  }

  test("writeBinRecords names records bin-<name>.json") {
    val dir = Files.createTempDirectory("graft-binsink").toString + "/out"
    val bins = Seq(("t.2024", 3L), ("e.click", 2L)).toDF("name", "count")
    SourcesSinks.writeBinRecords(bins, dir)
    val back = spark.read.json(dir)
    val names = back.select("filename").as[String].collect().sorted
    assert(names.toSeq == Seq("bin-e.click.json", "bin-t.2024.json"))
  }

  test("csv roundtrip: delimiters, quotes, spaces and nulls survive; declared schema types hold") {
    import graft.sources.SourcesSinks
    import org.apache.spark.sql.types._
    val df = Seq(
      (1L, Option("a,b"), Option("say \"hi\""), Option(10L)),
      (2L, Option("  padded  "), None, Option(0L)),
      (3L, None, Option("plain"), None)
    ).toDF("id", "c1", "c2", "n")
    val out = java.nio.file.Files.createTempDirectory("csv-rt").toString
    SourcesSinks.writeCsvRecords(df, out)
    val back = SourcesSinks.readCsvRecords(spark, out, StructType(Seq(
        StructField("id", LongType), StructField("c1", StringType),
        StructField("c2", StringType), StructField("n", LongType))))
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)), Option(r.getString(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    val orig = df.collect().map(r => (r.getLong(0),
      Option(r.getString(1)), Option(r.getString(2)),
      if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(back == orig, s"back=$back orig=$orig")
  }
}

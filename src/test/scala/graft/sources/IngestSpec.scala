package graft.sources

import graft.plug.TestSpark
import org.apache.spark.sql.types._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

class IngestSpec extends AnyFlatSpec with Matchers {
  lazy val spark = TestSpark.session

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType)))

  private def writeTemp(suffix: String, lines: Seq[String]): String = {
    val f = Files.createTempFile("graft_ingest", suffix)
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  behavior of "Ingest"

  it should "split clean and corrupt JSON lines against a declared schema" in {
    val path = writeTemp(".json", Seq(
      """{"id": 1, "name": "ok"}""",
      """{"id": "not-a-number", "name": "bad type"}""",
      """this is not json at all""",
      """{"id": 4}"""))  // missing field -> null, still clean
    val read = Ingest.readJsonQuarantined(spark, path, schema)
    val (clean, quarantine) = (read.clean, read.quarantine)
    clean.schema.fieldNames.toSeq shouldBe Seq("id", "name")
    val rows = clean.orderBy("id").collect()
    rows.map(r => if (r.isNullAt(0)) -1L else r.getLong(0)) shouldBe Array(1L, 4L)
    rows(1).isNullAt(1) shouldBe true
    val bad = quarantine.collect().map(_.getString(0))
    bad.length shouldBe 2
    bad should contain ("this is not json at all")
    // the shared parse cache must be releasable by the caller
    read.isCached shouldBe true
    read.unpersist()
    read.isCached shouldBe false
  }

  it should "split clean and corrupt CSV rows against a declared schema" in {
    val path = writeTemp(".csv", Seq(
      "id,name",
      "1,ok",
      "oops,bad id",
      "3,fine"))
    val read = Ingest.readCsvQuarantined(spark, path, schema)
    read.clean.orderBy("id").collect().map(_.getLong(0)) shouldBe Array(1L, 3L)
    read.quarantine.collect().map(_.getString(0)) shouldBe Array("oops,bad id")
    read.unpersist()
  }

  it should "parse fixed-width records with quarantine and blank-as-null" in {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val path = writeTemp(".txt", Seq(
      "  1alpha    1.50",
      "  x         1.00",   // garbage id
      "  4nums         ",   // blank amount
      " 5"))                // short line
    val cols = Seq(
      Ingest.FixedWidthCol("id", 1, 3, LongType),
      Ingest.FixedWidthCol("name", 4, 7, StringType),
      Ingest.FixedWidthCol("amount", 11, 6, DoubleType))
    val read = Ingest.readFixedWidth(spark, path, cols)
    val clean = read.clean.orderBy("id").collect()
    clean.map(_.getLong(0)) shouldBe Array(1L, 4L)
    clean(0).getString(1) shouldBe "alpha"
    clean(0).getDouble(2) shouldBe 1.5
    clean(1).isNullAt(2) shouldBe true
    read.quarantine.collect().map(_.getString(0)).sorted shouldBe
      Array("  x         1.00", " 5")
    read.unpersist()
  }

  it should "union evolved snapshot schemas by name with null fill" in {
    import spark.implicits._
    val v1 = Seq((1L, "a")).toDF("id", "text")
    val v2 = Seq((2L, "b", "en")).toDF("id", "text", "lang")
    val out = Ingest.unionEvolved(Seq(v1, v2))
    out.columns.toSeq shouldBe Seq("id", "text", "lang") // first-seen order
    val rows = out.orderBy("id").collect()
    rows(0).isNullAt(2) shouldBe true        // v1 rows null-fill lang
    rows(1).getString(2) shouldBe "en"
    // an incompatible type change fails loudly, never coerces silently
    val bad = Seq(("x", "c")).toDF("id", "text")
    an[Exception] should be thrownBy Ingest.unionEvolved(Seq(v1, bad)).collect()
  }

  it should "frame WARC records by Content-Length, not the magic string" in {
    // payload 2 CONTAINS a fake record header — only length framing
    // survives this; magic-splitting parsers corrupt it
    val tricky = "before WARC/1.0\r\nContent-Length: 9\r\n\r\nafter"
    val bytes = Ingest.toWarc(Iterator((7L, "hello"), (8L, tricky)))
    val recs = Ingest.parseWarc(bytes)
    recs.map(_._1) shouldBe List("<urn:graft:doc-7>", "<urn:graft:doc-8>")
    recs.map(_._2) shouldBe List("http://synthetic.local/doc/7",
      "http://synthetic.local/doc/8")
    new String(recs(1)._4, "UTF-8") shouldBe tricky
    recs(1)._3 shouldBe tricky.getBytes("UTF-8").length.toLong
    // truncated payload / clobbered magic fail loudly
    an[IllegalArgumentException] should be thrownBy
      Ingest.parseWarc(java.util.Arrays.copyOf(bytes, bytes.length - 6))
    val bad = bytes.clone(); bad(0) = 'X'.toByte
    an[IllegalArgumentException] should be thrownBy Ingest.parseWarc(bad)
  }

  it should "read concatenated gzip WARC members as one stream" in {
    // two independently-gzipped members back to back — the .warc.gz
    // layout; a single GZIPInputStream must yield both records
    val m1 = Ingest.gzip(Ingest.toWarc(Iterator((1L, "alpha"))))
    val m2 = Ingest.gzip(Ingest.toWarc(Iterator((2L, "beta"))))
    val dir = java.nio.file.Files.createTempDirectory("warc_gz").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-0.warc.gz"), m1 ++ m2)
    val rows = Ingest.readWarc(spark, dir, gz = true)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), new String(r.getAs[Array[Byte]](3), "UTF-8")))
    rows shouldBe Array((1L, "alpha"), (2L, "beta"))
  }

  it should "read per-row-group footer stats that agree with the content" in {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("footer_stats").toString
    (1L to 20000L).map(i => (i, s"row_$i", i.toDouble))
      .toDF("id", "name", "score")
      .coalesce(1)
      .write.option("parquet.block.size", 64 * 1024) // force multiple groups
      .mode("overwrite").parquet(dir)
    val stats = Ingest.parquetFooterStats(spark, dir).collect()
    stats.map(_.getLong(2)).sum shouldBe 20000L       // footer rows == content rows
    stats.foreach(_.getInt(3) shouldBe 3)             // schema width
    stats.length should be > 1                        // block.size actually split
    // row-group ids are contiguous from 0 within each file
    stats.groupBy(_.getString(0)).foreach { case (_, g) =>
      g.map(_.getInt(1)).sorted shouldBe g.indices.toArray
    }
  }

  it should "flatten nested structs to dotted scalars and fail on name collisions" in {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, 2.0, "x"), (2L, 3.0, "y")).toDF("id", "v", "s")
      .select(col("id"),
        struct(struct(col("v").as("a"), col("s").as("b")).as("inner"),
          col("v").as("c")).as("n"),
        col("s"))
    val flat = Ingest.flattenStructs(df)
    flat.columns.toSeq shouldBe Seq("id", "n_inner_a", "n_inner_b", "n_c", "s")
    flat.orderBy("id").collect().map(_.getDouble(1)) shouldBe Array(2.0, 3.0)
    // no shuffle: pure projection
    flat.queryExecution.executedPlan.toString.contains("Exchange") shouldBe false
    // a collision (pre-existing n_c next to struct n.c) fails loudly
    val clash = df.withColumn("n_c", lit(0))
    an[IllegalArgumentException] should be thrownBy Ingest.flattenStructs(clash)
  }
}

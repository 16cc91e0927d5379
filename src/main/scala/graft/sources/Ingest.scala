package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Schema-enforced text-format ingestion (JSON-lines / CSV) with
  * corrupt-record quarantine.
  *
  * The reference's only source is `spark.read.json` for rules
  * (SparkPlugHelper.scala:8–11) with inferred schema and default corrupt
  * handling; at pipeline scale both defaults are wrong:
  *  - schema inference reads the data TWICE (one full pass just to guess
  *    types) and can silently flip a column's type between daily batches —
  *    always pass the expected schema;
  *  - the default PERMISSIVE mode nulls out unparseable rows in place,
  *    which silently corrupts downstream aggregates. Quarantining keeps
  *    the bad raw lines queryable (count them, alert, replay after a fix)
  *    while the clean frame stays strictly typed.
  * Both readers are scan-side only — no shuffle, no extra pass.
  */
object Ingest {

  private val corruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(corruptCol)) schema
    else schema.add(corruptCol, StringType, nullable = true)

  /** A quarantined read: the typed clean split, the raw corrupt lines, and
    * the cached one-scan parse both are carved from. The cache is REQUIRED
    * for correctness, not just speed: since Spark 2.3 a file-source query
    * whose referenced columns are only the internal corrupt-record column
    * is disallowed, and caching materializes the full row so the
    * quarantine projection stays legal. The caller owns the cache's
    * lifetime — call [[unpersist]] once both splits are materialized
    * (written/counted), or the parsed raw frame stays pinned in executor
    * memory for the session. */
  final case class QuarantinedRead(
      clean: DataFrame,
      quarantine: DataFrame,
      private val raw: DataFrame
  ) {
    /** Release the shared one-scan cache once both splits' actions have
      * run (written/counted). After release, `clean` safely re-scans the
      * file, but re-running `quarantine` THROWS (AnalysisException): its
      * projection references only the internal corrupt-record column,
      * which a file-source query disallows uncached — the cache is what
      * made it legal (see the class doc). */
    def unpersist(): this.type = { raw.unpersist(); this }

    /** Whether the shared parse is still pinned (for leak checks). */
    def isCached: Boolean =
      raw.storageLevel.useMemory || raw.storageLevel.useDisk
  }

  /** JSON-lines read against a REQUIRED schema → [[QuarantinedRead]] of
    * (clean rows matching `schema`, quarantined raw lines).
    *
    * A row is quarantined when the line fails to parse at all or a field
    * conflicts with the declared type; missing fields are null (standard
    * JSON-lines evolution semantics, same as the reference's rule reads). */
  def readJsonQuarantined(
      spark: SparkSession,
      path: String,
      schema: StructType
  ): QuarantinedRead = {
    val raw = spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
      .cache() // one scan serves both splits; caller unpersists (see QuarantinedRead)
    split(raw, schema)
  }

  /** CSV read with header against a REQUIRED schema, same quarantine
    * contract as [[readJsonQuarantined]]. */
  def readCsvQuarantined(
      spark: SparkSession,
      path: String,
      schema: StructType
  ): QuarantinedRead = {
    val raw = spark.read
      .schema(withCorrupt(schema))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .csv(path)
      .cache()
    split(raw, schema)
  }

  private def split(raw: DataFrame, schema: StructType): QuarantinedRead = {
    val clean = raw.filter(col(corruptCol).isNull)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    val quarantine = raw.filter(col(corruptCol).isNotNull)
      .select(col(corruptCol).as("raw_line"))
    QuarantinedRead(clean, quarantine, raw)
  }

  /** A fixed-width column: 1-based byte offset, width, and the declared
    * type (LongType / DoubleType / StringType). */
  final case class FixedWidthCol(name: String, start: Int, len: Int,
      dataType: org.apache.spark.sql.types.DataType)

  /** Fixed-width text ingestion (the mainframe/export layout CSV readers
    * cannot express) with the same quarantine contract as the CSV/JSON
    * reads: a line is quarantined when it is SHORTER than the declared
    * record width or a numeric field holds non-blank garbage; blank
    * numeric fields read as null (fixed-width's standard missing-value
    * convention). One text scan, cached and shared by both splits;
    * parsing is pure substring+trim+try_cast projections — codegen'd,
    * no UDFs, trivially scan-parallel at any file count. */
  def readFixedWidth(
      spark: SparkSession,
      path: String,
      cols: Seq[FixedWidthCol]
  ): QuarantinedRead = {
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType => Str}
    require(cols.nonEmpty, "readFixedWidth needs at least one column")
    val minLen = cols.map(c => c.start + c.len - 1).max
    val raw = spark.read.text(path).cache()
    def field(c: FixedWidthCol) = trim(substring(col("value"), c.start, c.len))
    def typed(c: FixedWidthCol) = c.dataType match {
      case LongType   => expr(s"try_cast(trim(substring(value, ${c.start}, ${c.len})) AS BIGINT)")
      case DoubleType => expr(s"try_cast(trim(substring(value, ${c.start}, ${c.len})) AS DOUBLE)")
      case Str        => field(c)
      case other => throw new IllegalArgumentException(
        s"fixed-width column `${c.name}`: unsupported type $other")
    }
    val ok = cols.map { c =>
      c.dataType match {
        case LongType | DoubleType => field(c) === "" || typed(c).isNotNull
        case _ => lit(true)
      }
    }.reduce(_ && _) && length(col("value")) >= minLen
    val clean = raw.filter(ok)
      .select(cols.map(c => typed(c).as(c.name)): _*)
    val quarantine = raw.filter(!ok).select(col("value").as("raw_line"))
    QuarantinedRead(clean, quarantine, raw)
  }

  /** Schema-evolution union: snapshots written under different schema
    * versions union by COLUMN NAME, with columns missing from a snapshot
    * null-filled — the lakehouse read path for a table whose schema grew
    * over time (`unionByName(allowMissingColumns)` fold). Purely a plan
    * transform: each input keeps its own scan projection, no shuffle is
    * introduced, and the output column order is first-seen order across
    * the inputs (stable across runs). Fails loudly if a shared column
    * changed to an incompatible type between versions — silent coercion
    * is how a schema change corrupts a 100 TB backfill. */
  /** Serialize (id, text) records as a WARC/1.0 byte stream — response
    * records with the standard header block and Content-Length payload
    * framing, `\r\n\r\n` terminators. The builder half of the
    * [[readWarc]] roundtrip; payloads are raw UTF-8 bytes and may
    * themselves contain `WARC/1.0` — only the length framing delimits
    * records. */
  def toWarc(records: Iterator[(Long, String)]): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { case (id, text) =>
      val payload = text.getBytes(utf8)
      out.write(
        (s"WARC/1.0\r\n" +
          s"WARC-Type: response\r\n" +
          s"WARC-Record-ID: <urn:graft:doc-$id>\r\n" +
          s"WARC-Target-URI: http://synthetic.local/doc/$id\r\n" +
          s"Content-Length: ${payload.length}\r\n\r\n").getBytes(ascii))
      out.write(payload)
      out.write("\r\n\r\n".getBytes(ascii))
    }
    out.toByteArray
  }

  /** Parse a WARC/1.0 byte stream: sequential header-block + Content-
    * Length framing (the ONLY correct way — splitting on the `WARC/1.0`
    * magic corrupts any record whose payload contains it). Returns
    * (record_id, target_uri, content_length, payload bytes) per record;
    * malformed framing (bad magic, missing Content-Length, truncated
    * payload, missing terminator) throws — quarantine upstream. */
  def parseWarc(bytes: Array[Byte]): List[(String, String, Long, Array[Byte])] = {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    var pos = 0
    val out = scala.collection.mutable.ListBuffer
      .empty[(String, String, Long, Array[Byte])]
    def indexOf(pat: Array[Byte], from: Int): Int = {
      var i = from
      while (i <= bytes.length - pat.length) {
        var j = 0
        while (j < pat.length && bytes(i + j) == pat(j)) j += 1
        if (j == pat.length) return i
        i += 1
      }
      -1
    }
    val sep = "\r\n\r\n".getBytes(ascii)
    while (pos < bytes.length) {
      val hEnd = indexOf(sep, pos)
      require(hEnd >= 0, s"unterminated header block at offset $pos")
      val header = new String(bytes, pos, hEnd - pos, ascii)
      require(header.startsWith("WARC/1.0\r\n"), s"bad WARC magic at offset $pos")
      val fields = header.linesIterator.drop(1).collect {
        case l if l.contains(": ") =>
          val Array(k, v) = l.split(": ", 2); k -> v
      }.toMap
      val len = fields.getOrElse("Content-Length",
        throw new IllegalArgumentException(s"no Content-Length at offset $pos")).toLong
      val pStart = hEnd + sep.length
      require(pStart + len + sep.length <= bytes.length,
        s"truncated payload at offset $pos")
      val payload = java.util.Arrays.copyOfRange(bytes, pStart, (pStart + len).toInt)
      require(bytes((pStart + len).toInt) == '\r' &&
        bytes((pStart + len).toInt + 1) == '\n', s"missing record terminator at offset $pos")
      out += ((fields.getOrElse("WARC-Record-ID", ""),
        fields.getOrElse("WARC-Target-URI", ""), len, payload))
      pos = (pStart + len).toInt + sep.length
    }
    out.toList
  }

  /** gzip-compress `bytes` as one member (the per-record-member layout
    * CommonCrawl uses concatenates these; Java's GZIPInputStream reads
    * multi-member streams transparently). */
  /** Write one file through the Hadoop `FileSystem` API — the
    * cluster-portable seam for archive writers running INSIDE task
    * closures (`java.nio` paths would scatter the files across each
    * executor's local disk, invisible to the read side on a real
    * cluster). Each task resolves the FS from the path and a fresh
    * `Configuration` — the default-fs case, same idiom as
    * [[parquetFooterStats]]. */
  def writeBytes(path: String, bytes: Array[Byte]): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  private def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try in.readAllBytes() finally in.close()
  }

  /** Distributed WARC ingestion: one task per .warc / .warc.gz file (the
    * archive convention — at 100 TB CommonCrawl ships ~1 GB gzip
    * members, one sequential parse each; parallelism comes from the FILE
    * count, which is what a crawl snapshot has tens of thousands of).
    * `.gz` files decompress first — including concatenated-member
    * streams, which GZIPInputStream reads transparently. Each record's
    * numeric doc id is recovered from the record-id URN. */
  def readWarc(spark: SparkSession, dir: String, gz: Boolean = false): DataFrame = {
    import spark.implicits._
    val ext = if (gz) "warc.gz" else "warc"
    spark.read.format("binaryFile").load(s"$dir/*.$ext")
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap(b => parseWarc(if (gz) gunzipAll(b) else b))
      .toDF("record_id", "target_uri", "content_length", "payload")
      .select(
        regexp_extract(col("record_id"), "doc-(\\d+)", 1).cast("long").as("doc_id"),
        col("target_uri"), col("content_length"),
        col("payload"))
  }

  /** Distributed WebDataset ingestion: one task per .tar shard (the
    * WebDataset convention — training samples grouped by basename key
    * inside plain ustar shards, parallelism from the shard count).
    * Every entry extracts with header-checksum verification
    * ([[graft.ops.Multimodal.parseTarEntries]]); the output is one row
    * per (sample key, extension) part, ready for per-sample regrouping. */
  def readWebDataset(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$dir/*.tar")
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap(b => graft.ops.Multimodal.parseTarEntries(b).map { case (n, d) =>
        val dot = n.indexOf('.')
        (if (dot < 0) n else n.substring(0, dot),
          if (dot < 0) "" else n.substring(dot + 1), d)
      })
      .toDF("sample_key", "ext", "payload")
  }

  /** Per-row-group parquet FOOTER statistics — (file, row_group_id,
    * n_rows, n_columns) read from metadata only, no data pages touched.
    * The planning/ops readout behind compaction decisions ("thousands of
    * 3-row-group files → compact"), freshness checks, and scan-cost
    * estimates.
    *
    * Scale shape: the file list distributes over the cluster and each
    * task opens only footers (a few KB per file at any table size) — at
    * 100 TB with ~100k files this is a hundred-MB metadata job, never a
    * data scan. Each task builds its own Hadoop `Configuration` (the
    * default-fs case; cluster deployments thread the real conf through
    * the serialized-conf broadcast idiom instead). */
  def parquetFooterStats(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val files: Seq[String] =
      (if (fs.getFileStatus(p).isDirectory) {
        // Recursive: partitioned tables keep their files in key=value
        // subdirectories a flat listStatus would miss.
        val it = fs.listFiles(p, true)
        val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.Path]
        while (it.hasNext) buf += it.next().getPath
        buf.toSeq
      } else Seq(p))
        .filter(f => f.getName.endsWith(".parquet") || f.getName.endsWith(".parq"))
        .map(_.toString)
    if (files.isEmpty)
      return spark.emptyDataset[(String, Int, Long, Int)]
        .toDF("file_name", "row_group_id", "n_rows", "n_columns")
    spark.createDataset(files)
      .repartition(math.min(files.size, spark.sparkContext.defaultParallelism))
      .mapPartitions { it =>
        val conf = new org.apache.hadoop.conf.Configuration()
        it.flatMap { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(f), conf)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            val md = reader.getFooter.getFileMetaData
            val nCols = md.getSchema.getFieldCount
            import scala.jdk.CollectionConverters._
            reader.getFooter.getBlocks.asScala.toList.zipWithIndex.map {
              case (b, i) =>
                (f.substring(f.lastIndexOf('/') + 1), i, b.getRowCount, nCols)
            }
          } finally reader.close()
        }
      }
      .toDF("file_name", "row_group_id", "n_rows", "n_columns")
  }

  /** Flatten every nested struct column into top-level `a_b_c` columns —
    * the json_normalize step between "ingest arbitrary nested JSON" and
    * "feed a columnar pipeline": warehouse sinks, CSV exports, and BI
    * layers want scalars, and flattened leaves also prune/push down
    * better than whole-struct reads. Arrays and maps stay opaque at
    * their flattened position (explode is a ROW-multiplying decision the
    * caller makes deliberately). Purely a projection — no shuffle, no
    * data movement; name collisions fail loudly instead of silently
    * dropping a column. */
  def flattenStructs(df: DataFrame, sep: String = "_"): DataFrame = {
    def walk(prefix: String, path: Column, dt: org.apache.spark.sql.types.DataType)
        : Seq[(String, Column)] = dt match {
      case st: StructType =>
        st.fields.toSeq.flatMap(f =>
          walk(s"$prefix$sep${f.name}", path.getField(f.name), f.dataType))
      case _ => Seq(prefix -> path)
    }
    val cols = df.schema.fields.toSeq.flatMap {
      case f if f.dataType.isInstanceOf[StructType] =>
        walk(f.name, col(f.name), f.dataType)
      case f => Seq(f.name -> col(f.name))
    }
    val dups = cols.map(_._1).groupBy(identity).collect { case (n, vs) if vs.size > 1 => n }
    require(dups.isEmpty, s"flattened name collision: ${dups.mkString(", ")}")
    df.select(cols.map { case (n, c) => c.as(n) }: _*)
  }

  def unionEvolved(snapshots: Seq[DataFrame]): DataFrame = {
    require(snapshots.nonEmpty, "unionEvolved needs at least one snapshot")
    snapshots.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` of named SparkEntry queries to files —
  * the optimization round's plan evidence (plans/r14/<query>_{before,
  * after}.txt). Building a lifecycle query's DataFrame executes its
  * staging phases; the dumped plan is the FINAL returned frame's, which
  * is where the join-strategy / exchange-count / pushed-filter claims
  * live.
  *
  * `QPlans <sfDir> <outDir> <suffix> <name> [name ...]`
  */
object QPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.sql.codegen.cache.maxEntries", "1000")
    if (sys.env.getOrElse("GRAFT_BENCH_LOCAL_CRC", "0") != "1")
      b.config("spark.hadoop.fs.file.impl",
        "org.apache.hadoop.fs.RawLocalFileSystem"): Unit
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"QPLAN $name ok")
      } catch { case e: Throwable =>
        println(s"QPLAN $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}

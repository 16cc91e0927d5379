package graft.plug

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM. */
object TestSpark {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .withExtensions(new graft.ext.GraftExtensions())
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the events testdata carries nanos timestamps; read them as longs
      // exactly like the Verify/Bench driver sessions do
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

package graft.ops

import graft.SparkEntry
import graft.plug.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Regression fixture for the naive-timestamp parquet encoding.
  *
  * The driver's testdata generation switched `events.ts` from INT64
  * TIMESTAMP(NANOS) to naive TIMESTAMP(isAdjustedToUTC=false, MICROS),
  * which Spark 4 reads as TIMESTAMP_NTZ — and `unix_millis` rejects
  * TIMESTAMP_NTZ at analysis, which silently broke every batch event-time
  * query while the in-memory op specs (TimestampType inputs) stayed green.
  * This spec writes the NTZ encoding to a real parquet, proves the read
  * back IS TIMESTAMP_NTZ, and drives the event-time ops plus a full
  * SparkEntry query through it, so the next encoding change fails here
  * before the driver's correctness gate sees it. */
class NtzParquetSpec extends AnyFlatSpec with Matchers {
  lazy val spark = TestSpark.session

  /** A tiny events table written with a TIMESTAMP_NTZ `ts`, as a pandas/
    * pyarrow writer would produce it, read back from parquet. */
  private lazy val fixtureDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ntz").toString
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 10L, "view", 1.0, "{}"),
      (2L, "2024-01-01 00:10:00", 10L, "click", 2.0, "{}"),
      (3L, "2024-01-01 02:00:00", 10L, "view", 3.0, "{}"),
      (4L, "2024-01-01 00:05:00", 20L, "purchase", 4.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast(TimestampNTZType))
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }
  private lazy val ntzEvents = {
    val back = spark.read.parquet(s"$fixtureDir/events.parquet")
    withClue("fixture precondition: parquet must read back as NTZ ") {
      back.schema("ts").dataType shouldBe TimestampNTZType
    }
    back
  }

  behavior of "event-time ops over TIMESTAMP_NTZ parquet"

  it should "sessionize NTZ events (session TZ pinned UTC keeps values)" in {
    val out = EventOps.sessionize(ntzEvents, "user_id", "ts", 30 * 60 * 1000L)
      .orderBy("user_id", "session_id").collect()
    // user 10: events at 00:00/00:10 in one session, 02:00 a new one
    out.map(r => (r.getLong(0), r.getLong(2))) shouldBe
      Array((10L, 2L), (10L, 1L), (20L, 1L))
    out.head.getLong(3) shouldBe 1704067200000L // 2024-01-01T00:00Z
  }

  it should "window-aggregate NTZ events" in {
    val out = EventOps.windowedAgg(ntzEvents, "ts", "event_type", "value", "1 hour")
      .orderBy("window_start_ms", "event_type").collect()
    out.map(r => (r.getLong(0), r.getString(1), r.getLong(2))) shouldBe Array(
      (1704067200000L, "click", 1L), (1704067200000L, "purchase", 1L),
      (1704067200000L, "view", 1L), (1704074400000L, "view", 1L))
  }

  it should "as-of join NTZ events through the chunked variant" in {
    val right = ntzEvents.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"))
    val out = Temporal.asofJoinChunked(
        ntzEvents.select(col("event_id"), col("user_id"), col("ts")),
        right, "user_id", "ts", Seq("value"), chunkMs = 3600000L)
      .orderBy("event_id").collect()
    // events 1 (00:00) and 4 (user 20) precede/miss the click; 2 and 3 match
    out.map(r => Option(r.get(4)).map(_.asInstanceOf[Double])) shouldBe
      Array(None, Some(2.0), Some(2.0), None)
  }

  it should "count range neighbors and debounce over NTZ events" in {
    Temporal.rangeSelfCount(ntzEvents, "event_id", "ts", "user_id", 600000L)
      .orderBy("event_id").collect()
      .map(_.getLong(1)) shouldBe Array(1L, 1L, 0L, 0L)
    EventOps.debounce(ntzEvents, "user_id", "event_type", "ts", "event_id",
      600000L).count() shouldBe 4L
  }

  it should "run full SparkEntry event queries against an NTZ events dir" in {
    // the events() loader must normalize NTZ before the unix_millis sites
    SparkEntry.queries("events_sessionize")(spark, fixtureDir)
      .count() should be > 0L
    SparkEntry.queries("events_rate_window")(spark, fixtureDir)
      .count() shouldBe 4L
    val wa = SparkEntry.queries("events_window_agg")(spark, fixtureDir)
    wa.schema("window_start_ms").dataType.typeName shouldBe "long"
    wa.count() should be > 0L
  }
}

package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.Queries

/** Pins [[Queries.events]]'s timestamp-precision adaptivity.
  *
  * The driver's generator has shipped `events.ts` as parquet
  * TIMESTAMP(NANOS) (rounds 1-6; Spark reads it as an epoch-nano LONG via
  * `nanosAsLong`) and as TIMESTAMP(MICROS) without UTC adjustment (round 7;
  * Spark reads TIMESTAMP_NTZ). Round 7 began with 26 events-family queries
  * failing analysis because the loader assumed the LONG shape — this spec
  * writes the same instants in both physical shapes and asserts the loader
  * normalizes them to the identical `ts_us` longs, so a future generator
  * flip can't silently drop a third of the correctness gate again.
  */
class EventsLoaderSpec extends SparkTestBase {

  private val micros = Seq(0L, 1L, 999999L, 1704067200123456L, -7L)

  private def schemaOf(dt: DataType) = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", dt)))

  private def write(dir: String, dt: DataType, tsOf: Long => Any): Unit = {
    val rows = micros.zipWithIndex.map { case (us, i) => Row(i.toLong, tsOf(us)) }
    spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        schemaOf(dt))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def loadTsUs(dir: String): Map[Long, Long] =
    Queries.events(spark, dir).select("event_id", "ts_us").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("long epoch-nanos and TIMESTAMP_NTZ micros normalize to the same ts_us") {
    val nanoDir = tmpDir("ev_nanos")
    val ntzDir = tmpDir("ev_ntz")
    // the nanosAsLong read path surfaces TIMESTAMP(NANOS) as LongType nanos;
    // writing LongType directly exercises the same loader branch
    write(nanoDir, LongType, us => us * 1000L)
    write(ntzDir, TimestampNTZType,
      us => java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC))
    val fromNanos = loadTsUs(nanoDir)
    val fromNtz = loadTsUs(ntzDir)
    val expected = micros.zipWithIndex.map { case (us, i) => i.toLong -> us }.toMap
    assert(fromNanos === expected)
    assert(fromNtz === expected)
  }

  test("sub-microsecond nanos floor toward negative infinity like DuckDB") {
    val dir = tmpDir("ev_floor")
    // -1 ns is inside microsecond -1 (floor), not 0 (truncate)
    write(dir, LongType, _ => -1L)
    assert(loadTsUs(dir).values.toSeq === Seq.fill(micros.size)(-1L))
  }
}

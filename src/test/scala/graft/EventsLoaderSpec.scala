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
  * writes the same instants in every physical shape and asserts the loader
  * normalizes them to identical `ts_us` longs, so a future generator flip
  * can't silently drop a third of the correctness gate again.
  *
  * The NANOS fixture is a REAL TIMESTAMP(NANOS) parquet file written via
  * parquet-java (Spark cannot author one), so the actual `nanosAsLong`
  * scan path — the rounds-1-6 physical shape — is exercised, not a
  * LongType stand-in; a Spark behavior change in that legacy conf turns
  * this red. Plain-INT64 fixtures pin the footer/magnitude
  * disambiguation: unannotated epoch-MICROS longs must pass through
  * undivided (the silent-corruption class an assume-nanos loader
  * reintroduces), unannotated epoch-NANOS longs still divide.
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

  /** A genuine TIMESTAMP(NANOS) parquet file, via parquet-java's example
    * writer — the physical shape the rounds-1-6 generator produced.
    */
  private def writeNanosParquet(dir: String, rows: Seq[(Long, Long)]): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroup
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.hadoop.util.HadoopOutputFile
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    val schema = Types.buildMessage()
      .required(PrimitiveTypeName.INT64).named("event_id")
      .required(PrimitiveTypeName.INT64)
      .as(LogicalTypeAnnotation.timestampType(true, LogicalTypeAnnotation.TimeUnit.NANOS))
      .named("ts")
      .named("events")
    val conf = spark.sessionState.newHadoopConf()
    val path = new org.apache.hadoop.fs.Path(s"$dir/events.parquet/part-00000.parquet")
    val writer = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(path, conf))
      .withType(schema).build()
    try rows.foreach { case (id, nanos) =>
      val g = new SimpleGroup(schema)
      g.add("event_id", id)
      g.add("ts", nanos)
      writer.write(g)
    } finally writer.close()
  }

  private def loadTsUs(dir: String): Map[Long, Long] =
    Queries.events(spark, dir).select("event_id", "ts_us").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private val expected =
    micros.zipWithIndex.map { case (us, i) => i.toLong -> us }.toMap

  test("real TIMESTAMP(NANOS), unannotated nano longs, and TIMESTAMP_NTZ micros normalize to the same ts_us") {
    val nanoDir = tmpDir("ev_nanos")
    val rawLongDir = tmpDir("ev_rawlong")
    val ntzDir = tmpDir("ev_ntz")
    writeNanosParquet(nanoDir,
      micros.zipWithIndex.map { case (us, i) => (i.toLong, us * 1000L) })
    // unannotated INT64 carrying nanos: footer says nothing, the magnitude
    // probe (1.7e18 >= 1e17) must still classify it as nanos
    write(rawLongDir, LongType, us => us * 1000L)
    write(ntzDir, TimestampNTZType,
      us => java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC))
    assert(loadTsUs(nanoDir) === expected)
    assert(loadTsUs(rawLongDir) === expected)
    assert(loadTsUs(ntzDir) === expected)
  }

  test("unannotated INT64 epoch-MICROS passes through undivided") {
    // the class of silent corruption the footer/magnitude check exists
    // for: a generator shipping plain epoch-micros longs (max |ts| 1.7e15
    // < 1e17) must NOT be floor-divided by 1000
    val dir = tmpDir("ev_rawmicros")
    write(dir, LongType, us => us)
    assert(loadTsUs(dir) === expected)
  }

  test("nanosAsLong mutates the session ONLY for genuine TIMESTAMP(NANOS) tables") {
    val confKey = "spark.sql.legacy.parquet.nanosAsLong"
    val ntzDir = tmpDir("ev_conf_ntz")
    val rawDir = tmpDir("ev_conf_raw")
    val nanoDir = tmpDir("ev_conf_nanos")
    write(ntzDir, TimestampNTZType,
      us => java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC))
    write(rawDir, LongType, us => us)
    writeNanosParquet(nanoDir,
      micros.zipWithIndex.map { case (us, i) => (i.toLong, us * 1000L) })
    spark.conf.unset(confKey)
    // sessions that never read a NANOS table keep their conf untouched
    loadTsUs(ntzDir)
    loadTsUs(rawDir)
    assert(!spark.conf.get(confKey, "false").toBoolean,
      "non-NANOS loads must not mutate the session conf")
    // a NANOS table is unreadable without it — the one case that sets it
    loadTsUs(nanoDir)
    assert(spark.conf.get(confKey, "false").toBoolean)
  }

  test("sub-microsecond nanos floor toward negative infinity like DuckDB") {
    val dir = tmpDir("ev_floor")
    // -1 ns is inside microsecond -1 (floor), not 0 (truncate); the
    // annotation (not magnitude — |-1| is tiny) drives the nanos reading
    writeNanosParquet(dir, micros.indices.map(i => (i.toLong, -1L)))
    assert(loadTsUs(dir).values.toSeq === Seq.fill(micros.size)(-1L))
  }
}

package graft

import graft.multimodal.Multimodal
import graft.streaming.EventsStream
import graft.streaming.EventsStream.{Event, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  // offset from epoch zero: the initial watermark is 0, and an event AT
  // the watermark is treated as late and dropped by stateful operators
  private def ts(min: Long) = new Timestamp((min + 60) * 60000L)

  test("streaming hourlyCounts equals the batch formulation") {
    val rows = Seq(
      (ts(5), "click", 1.0), (ts(20), "click", 2.0), (ts(70), "click", 4.0),
      (ts(30), "view", 8.0))
    val batch = rows.toDF("ts", "event_type", "value")
    val expected = EventsStream.hourlyCounts(batch)
      .orderBy("hour", "event_type")
      .as[(Timestamp, String, Long, Double)].collect().toSeq

    val mem = MemoryStream[(Timestamp, String, Double)](spark)
    mem.addData(rows.map(r => (r._1, r._2, r._3)))
    val q = EventsStream.hourlyCounts(
        mem.toDF.toDF("ts", "event_type", "value"))
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("t_hourly").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("t_hourly").orderBy("hour", "event_type")
      .as[(Timestamp, String, Long, Double)].collect().toSeq
    assert(got == expected)
    assert(got.map(_._3).sum == 4L)
  }

  test("streaming dedup: first arrival per key only, watermarked state") {
    import graft.streaming.StreamDedup
    val mem = MemoryStream[(Timestamp, String)](spark)
    mem.addData(Seq(
      (ts(1), "doc-a"), (ts(2), "doc-b"), (ts(3), "doc-a"),  // dup of a
      (ts(4), "doc-c"), (ts(5), "doc-b")))                    // dup of b
    val q = StreamDedup.firstPerKey(
        mem.toDF.toDF("ts", "content_hash"), Seq("content_hash"),
        eventTimeCol = Some("ts"), watermark = "1 hour")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("t_dedup").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("t_dedup").select("content_hash")
      .as[String].collect().sorted.toSeq
    assert(got == Seq("doc-a", "doc-b", "doc-c"))
  }

  test("streaming sessionize closes sessions on gap; matches batch logic") {
    val gapMs = 10 * 60000L
    val events = Seq(
      Event(1L, ts(0), 1.0), Event(1L, ts(5), 2.0),   // session A (0-5)
      Event(1L, ts(30), 4.0),                         // session B (30)
      Event(2L, ts(1), 8.0))                          // session C (1)
    val mem = MemoryStream[Event](spark)
    mem.addData(events)
    val withWm = mem.toDS().withWatermark("ts", "0 seconds").as[Event]
    val q = EventsStream.Sessionize.streaming(withWm, gapMs)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("t_sess").start()
    q.processAllAvailable()
    // advance watermark far past every session's gap to flush state
    mem.addData(Seq(Event(99L, ts(1000), 0.0)))
    q.processAllAvailable(); q.stop()
    val got = spark.table("t_sess").as[Session].collect()
      .filter(_.user_id != 99L)
      .map(s => (s.user_id, s.session_start.getTime / 60000 - 60,
        s.session_end.getTime / 60000 - 60, s.n_events, s.total_value)).toSet
    assert(got == Set((1L, 0L, 5L, 2L, 3.0), (1L, 30L, 30L, 1L, 4.0),
      (2L, 1L, 1L, 1L, 8.0)))
  }

  test("streaming sessionize: cross-batch late arrivals merge or close") {
    val gapMs = 10 * 60000L
    val mem = MemoryStream[Event](spark)
    // batch 1 opens a session at minute 30 (large watermark delay so the
    // late batch-2 events are still admissible)
    mem.addData(Seq(Event(1L, ts(30), 1.0)))
    val withWm = mem.toDS().withWatermark("ts", "2 hours").as[Event]
    val q = EventsStream.Sessionize.streaming(withWm, gapMs)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("t_sess_late").start()
    q.processAllAvailable()
    // batch 2: minute 25 is within a gap BEFORE the open start -> merges,
    // start moves back; minute 5 is > gap before -> closes as a singleton
    mem.addData(Seq(Event(1L, ts(25), 2.0), Event(1L, ts(5), 4.0)))
    q.processAllAvailable()
    mem.addData(Seq(Event(99L, ts(2000), 0.0)))   // flush state
    q.processAllAvailable(); q.stop()
    val got = spark.table("t_sess_late").as[Session].collect()
      .filter(_.user_id != 99L)
      .map(s => (s.session_start.getTime / 60000 - 60,
        s.session_end.getTime / 60000 - 60, s.n_events, s.total_value)).toSet
    assert(got == Set((5L, 5L, 1L, 4.0), (25L, 30L, 2L, 3.0)))
  }

  test("streaming sessionize: late siblings in one batch merge like batch") {
    val gapMs = 10 * 60000L
    val mem = MemoryStream[Event](spark)
    // batch 1 opens a session at minute 60 (large watermark delay keeps
    // the batch-2 late events admissible)
    mem.addData(Seq(Event(1L, ts(60), 1.0)))
    val withWm = mem.toDS().withWatermark("ts", "5 hours").as[Event]
    val q = EventsStream.Sessionize.streaming(withWm, gapMs)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("t_sess_sib").start()
    q.processAllAvailable()
    // batch 2: three late events, all > gap before the open start (50):
    // 5 and 12 are within a gap of each other -> ONE session (not two
    // singletons); 30 is > gap after 12 -> its own session
    mem.addData(Seq(Event(1L, ts(5), 2.0), Event(1L, ts(12), 4.0),
      Event(1L, ts(30), 8.0)))
    q.processAllAvailable()
    mem.addData(Seq(Event(99L, ts(2000), 0.0)))   // flush state
    q.processAllAvailable(); q.stop()
    val got = spark.table("t_sess_sib").as[Session].collect()
      .filter(_.user_id != 99L)
      .map(s => (s.session_start.getTime / 60000 - 60,
        s.session_end.getTime / 60000 - 60, s.n_events, s.total_value)).toSet
    assert(got == Set((5L, 12L, 2L, 6.0), (30L, 30L, 1L, 8.0),
      (60L, 60L, 1L, 1.0)))
  }

  test("streaming sessionize: a backward merge bridges to the late run") {
    val gapMs = 10 * 60000L
    val mem = MemoryStream[Event](spark)
    mem.addData(Seq(Event(1L, ts(60), 1.0)))
    val withWm = mem.toDS().withWatermark("ts", "5 hours").as[Event]
    val q = EventsStream.Sessionize.streaming(withWm, gapMs)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("t_sess_bridge").start()
    q.processAllAvailable()
    // batch 2: 44 is late (> gap before 50); 52 merges backwards into the
    // open session (start -> 52) and 52 - 44 <= gap bridges the late run
    // in, so the batch-equivalent single session (44-60) must come out
    mem.addData(Seq(Event(1L, ts(44), 2.0), Event(1L, ts(52), 4.0)))
    q.processAllAvailable()
    mem.addData(Seq(Event(99L, ts(2000), 0.0)))   // flush state
    q.processAllAvailable(); q.stop()
    val got = spark.table("t_sess_bridge").as[Session].collect()
      .filter(_.user_id != 99L)
      .map(s => (s.session_start.getTime / 60000 - 60,
        s.session_end.getTime / 60000 - 60, s.n_events, s.total_value)).toSet
    assert(got == Set((44L, 60L, 3L, 7.0)))
  }

  test("session timestamps keep microsecond precision through state") {
    val us = 123456L  // sub-millisecond part that a ms round-trip drops
    val t0 = EventsStream.fromMicros(ts(10).getTime * 1000L + us)
    assert(EventsStream.toMicros(t0) == ts(10).getTime * 1000L + us)
    val mem = MemoryStream[Event](spark)
    mem.addData(Seq(Event(1L, t0, 1.0)))
    val withWm = mem.toDS().withWatermark("ts", "1 hour").as[Event]
    val q = EventsStream.Sessionize.streaming(withWm, 10 * 60000L)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("t_sess_us").start()
    q.processAllAvailable()
    mem.addData(Seq(Event(99L, ts(2000), 0.0)))   // flush state
    q.processAllAvailable(); q.stop()
    val got = spark.table("t_sess_us").as[Session].collect()
      .filter(_.user_id != 99L)
    assert(got.length == 1)
    assert(EventsStream.toMicros(got.head.session_start)
      == ts(10).getTime * 1000L + us)
  }

  test("graft SQL functions registered via extensions surface") {
    GraftExtensions.register(spark)
    Seq((Array(0f, 3f), Array(4f, 0f))).toDF("a", "b")
      .createOrReplaceTempView("t_vec")
    val r = spark.sql(
      "SELECT graft_l2_sq(a, b) AS d, graft_dot(a, b) AS p, " +
        "graft_cosine_sim(a, a) AS c FROM t_vec").head()
    assert(r.getDouble(0) == 25.0)
    assert(r.getDouble(1) == 0.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)
  }

  test("multimodal: histogram decoder deterministic, frames sliced correctly") {
    val dec = new Multimodal.ByteHistogramDecoder(4)
    val f1 = dec.features("abcd".getBytes("UTF-8"))
    val f2 = dec.features("abcd".getBytes("UTF-8"))
    assert(f1.toSeq == f2.toSeq)
    assert(math.abs(f1.sum - 1.0f) < 1e-6)

    val df = Seq((1L, "0123456789".getBytes("UTF-8"))).toDF("id", "media")
    val frames = df.select(
      Multimodal.frameSample(col("media"), n = 4, frameSize = 4).as("f"))
      .as[Seq[Array[Byte]]].head()
    assert(frames.map(new String(_)) == Seq("0123", "4567", "89"))
  }

  test("multimodal: resample decoder resizes by nearest-neighbor stride") {
    // 8 bytes -> 4 samples: reads bytes 0, 2, 4, 6
    val dec = new Multimodal.ResampleDecoder(4)
    val out = dec.features(Array[Byte](0, 10, 20, 30, 40, 50, 60, 70))
    assert(out.length == 4)
    assert(out.toSeq == Seq(0, 20, 40, 60).map(_ / 255.0f))
    // upsample repeats neighbors: 2 bytes -> 4 samples reads 0,0,1,1
    val up = dec.features(Array[Byte](100, -1))
    assert(up.toSeq == Seq(100 / 255.0f, 100 / 255.0f, 255 / 255.0f, 255 / 255.0f))
    assert(dec.features(Array.emptyByteArray).toSeq == Seq(0f, 0f, 0f, 0f))
  }

  test("streaming upsert: foreachBatch merges latest version per key") {
    import graft.core.Collection
    import graft.streaming.StreamUpsert
    val dir = "/tmp/graft_test_stream_upsert/coll"
    val coll = Collection(spark, dir)
    val base = Seq((1L, 0L, "a"), (2L, 0L, "b")).toDF("id", "version", "v")
    coll.create(base.schema, force = true)
    coll.append(base)
    // one batch holding TWO versions of key 2 plus a brand-new key 3:
    // latest-wins reduction must keep version 2, and the merge must
    // replace key 2 and insert key 3
    val mem = MemoryStream[(Long, Long, String)](spark)
    mem.addData(Seq((2L, 1L, "b1"), (2L, 2L, "b2"), (3L, 1L, "c")))
    val q = StreamUpsert.start(mem.toDF.toDF("id", "version", "v"),
      coll, "id", "version", "t_upsert")
    q.awaitTermination() // AvailableNow: stops after draining
    val got = coll.read.orderBy("id")
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 0L, "a"), (2L, 2L, "b2"), (3L, 1L, "c")))
    // at-least-once replay of an OLDER version in a later batch must
    // NOT regress the stored newer row (version-aware merge)
    val mem2 = MemoryStream[(Long, Long, String)](spark)
    mem2.addData(Seq((2L, 1L, "stale"), (4L, 1L, "d")))
    val q2 = StreamUpsert.start(mem2.toDF.toDF("id", "version", "v"),
      coll, "id", "version", "t_upsert2")
    q2.awaitTermination()
    val got2 = coll.read.orderBy("id")
      .as[(Long, Long, String)].collect().toSeq
    assert(got2 == Seq((1L, 0L, "a"), (2L, 2L, "b2"), (3L, 1L, "c"),
      (4L, 1L, "d")))
    coll.drop()
  }

  test("collection vacuum removes swap leftovers, refuses a dead dir") {
    import graft.core.Collection
    import org.apache.hadoop.fs.Path
    val dir = "/tmp/graft_test_vacuum/coll"
    val coll = Collection(spark, dir)
    val df = Seq((1L, "a")).toDF("id", "v")
    coll.create(df.schema, force = true)
    coll.append(df)
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(dir + "__compact_tmp"))
    fs.mkdirs(new Path(dir + "__compact_old"))
    assert(coll.vacuum().toSet ==
      Set(dir + "__compact_tmp", dir + "__compact_old"))
    assert(!fs.exists(new Path(dir + "__compact_old")))
    assert(coll.vacuum().isEmpty) // idempotent
    // a crash BETWEEN the renames leaves only __compact_old: vacuum must
    // refuse rather than delete the sole surviving copy
    fs.mkdirs(new Path(dir + "__compact_old"))
    coll.drop()
    intercept[IllegalArgumentException] { coll.vacuum() }
    fs.delete(new Path(dir + "__compact_old"), true)
  }

  test("retain-mode vacuum completes an interrupted retain, not a delete") {
    import graft.core.Collection
    import org.apache.hadoop.fs.Path
    val dir = "/tmp/graft_test_vacuum_retain/coll"
    val coll = Collection(spark, dir, retainVersions = true)
    val df = Seq((1L, "new")).toDF("id", "v")
    coll.create(df.schema, force = true)
    coll.append(df)
    // simulate a crash between the tmp->dir rename and the retain
    // rename: the rewrite pre-image sits at __compact_old
    Seq((1L, "old")).toDF("id", "v").write
      .parquet(dir + "__compact_old")
    val acted = coll.vacuum()
    assert(acted.exists(_.endsWith("-> v1")), s"vacuum acted: $acted")
    assert(coll.versions == Seq(1L))
    assert(coll.readVersion(1L).as[(Long, String)].collect().toSeq ==
      Seq((1L, "old")))
    coll.drop()
  }

  test("phash near-dup: value edits collide, unrelated payloads shatter") {
    import spark.implicits._
    val base = ("the quick brown fox jumps over the lazy dog " * 20).trim
    val edited = base.replaceFirst("lazy", "hazy")  // one occurrence: bin
                                                    // counts shift by ±1
    val other = ("completely different content with other words entirely " * 18).trim
    val df = Seq((1L, base), (2L, edited), (3L, other), (4L, base))
      .toDF("id", "text")
      .select(col("id"), col("text").cast("binary").as("media"))
    val pairs = graft.multimodal.Multimodal
      .phashNearPairs(df, "id", "media", maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet  // ordered id_b, id_a, hamming? see select order
    val byPair = pairs.map(p => (p._2, p._1) -> p._3).toMap ++
      pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(byPair.contains((1L, 4L)) && byPair((1L, 4L)) == 0L,
      "identical payloads at hamming 0")
    assert(byPair.contains((1L, 2L)),
      "single-word edit stays within hamming 3 (alignment-invariant)")
    assert(!byPair.contains((1L, 3L)) && !byPair.contains((2L, 3L)),
      "unrelated payload never surfaces")
  }

  test("frameHashDedup: shared frames surface, unique frames don't") {
    import spark.implicits._
    val shared = "S" * 100                      // frame-aligned shared block
    val df = Seq(
      (1L, shared + "A" * 100),                 // frame0 = shared
      (2L, shared + "B" * 100),                 // frame0 = shared
      (3L, "C" * 250))                          // no shared frames; 3 frames
      .toDF("id", "text")
      .select(col("id"), col("text").cast("binary").as("media"))
    val r = graft.multimodal.Multimodal
      .frameHashDedup(df, "id", "media", nFrames = 4, frameSize = 100)
      .as[(String, Long, Long)].collect()
    assert(r.length == 1, s"exactly the shared frame recurs, got ${r.toSeq}")
    assert(r.head._2 == 2L && r.head._3 == 1L,
      "two docs share it; keeper is the min id")
  }

  test("aHash blocks: mean-threshold bits, big-endian packing") {
    import spark.implicits._
    // 8 pixels: values 0..7 → mean 3.5 → bits 00001111 → blocks (0x0, 0xF)
    val px = Seq(Seq(0f, 1f, 2f, 3f, 4f, 5f, 6f, 7f).map(_ / 255f))
      .toDF("px")
    val r = px.select(graft.multimodal.Multimodal
        .aHashBlocks(col("px"), nPixels = 8, nBlocks = 2).as("blk"))
      .as[Seq[Int]].collect().head
    assert(r == Seq(0, 15), s"expected (0, 15), got $r")
  }
}

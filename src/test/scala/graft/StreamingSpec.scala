package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, max}
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Streams
import graft.streaming.Streams.SessionEvent

/** Typed event for the interval-join spec (top-level so the encoder
  * carries no outer pointer). */
case class TypedEv(event_id: Long, user_id: Long, ts: Timestamp,
                   event_type: String)

/** Drive the streaming operators end-to-end over MemoryStream sources. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  /** Seconds offset from a base an hour past the epoch — an event at
    * exactly epoch 0 equals the initial watermark and is dropped as late
    * by stateful operators. */
  private def ts(s: Long) = new Timestamp((3600 + s) * 1000)

  test("windowed stats with watermark aggregates per event-time window") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val q = Streams.windowedStats(in.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("win_stats")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(
        SessionEvent(1L, ts(0), 2.0), SessionEvent(1L, ts(60), 4.0),
        SessionEvent(1L, ts(700), 10.0), // second window
        SessionEvent(2L, ts(30), 1.0))
      q.processAllAvailable()
      val rows = spark.table("win_stats")
        .select("user_id", "n", "sum_value", "mean_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toSet
      assert(rows == Set((1L, 2L, 6.0, 3.0), (1L, 1L, 10.0, 10.0), (2L, 1L, 1.0, 1.0)))
    } finally q.stop()
  }

  test("stateful sessionization closes sessions on gap and on watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val q = Streams.sessionize(in.toDS(), gapMs = 60_000, watermark = "1 minute")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // two bursts 10 min apart in ONE batch: first session closes inline
      in.addData(
        SessionEvent(7L, ts(0), 1.0), SessionEvent(7L, ts(30), 2.0),
        SessionEvent(7L, ts(630), 5.0))
      q.processAllAvailable()
      val first = spark.table("sessions")
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      assert(first.toSeq == Seq((7L, 2L, 3.0, true)))
      // a late event from another user advances the watermark far past
      // the open session's timeout -> event-time timeout closes it
      in.addData(SessionEvent(99L, ts(5000), 0.0))
      q.processAllAvailable()
      in.addData(SessionEvent(99L, ts(9000), 0.0)) // one more batch to fire timeouts
      q.processAllAvailable()
      val all = spark.table("sessions")
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
        .toSet
      assert(all.contains((7L, 1L, 5.0, true))) // second session closed by timeout
    } finally q.stop()
  }

  test("streaming exact dedup keeps first occurrence within watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streams.StreamDoc]
    val q = Streams.streamingDedupExact(in.toDS(), watermark = "5 minutes")
      .writeStream.format("memory").queryName("sdedup")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Streams.StreamDoc(1L, ts(0), "alpha beta"),
        Streams.StreamDoc(2L, ts(10), "alpha beta"), // dup of 1
        Streams.StreamDoc(3L, ts(20), "gamma"))
      q.processAllAvailable()
      val ids = spark.table("sdedup").select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(ids.size == 2 && ids.contains(3L))
      assert(ids.intersect(Set(1L, 2L)).size == 1)
    } finally q.stop()
  }

  test("streaming dedup audit tags first vs duplicate across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streams.StreamDoc]
    val q = Streams.streamingDedupAudit(in.toDS(), ttlMs = 600_000,
        watermark = "1 minute")
      .writeStream.format("memory").queryName("sdedup_audit")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Streams.StreamDoc(1L, ts(0), "alpha beta"),
        Streams.StreamDoc(2L, ts(10), "alpha beta"))
      q.processAllAvailable()
      in.addData(Streams.StreamDoc(3L, ts(30), "alpha beta")) // later batch dup
      q.processAllAvailable()
      val rows = spark.table("sdedup_audit")
        .select("doc_id", "is_first").collect()
        .map(r => (r.getLong(0), r.getBoolean(1))).toMap
      assert(rows == Map(1L -> true, 2L -> false, 3L -> false))
    } finally q.stop()
  }

  test("streaming fuzzy dedup flags near-dups across batches via LSH " +
    "band-key state; distinct docs stay clean") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streams.StreamDoc]
    val q = Streams.streamingDedupFuzzy(in.toDS(), ttlMs = 600_000,
        watermark = "1 minute")
      .writeStream.format("memory").queryName("sdedup_fuzzy")
      .outputMode(OutputMode.Append).start()
    try {
      // doc 2 is an exact copy of doc 1 (identical signature — collides
      // in every band); doc 3 shares no shingles with either
      in.addData(
        Streams.StreamDoc(1L, ts(0), "alpha beta gamma delta"),
        Streams.StreamDoc(2L, ts(10), "alpha beta gamma delta"))
      q.processAllAvailable()
      // later BATCH: another copy — must match doc 1's persisted state
      in.addData(
        Streams.StreamDoc(3L, ts(30), "alpha beta gamma delta"),
        Streams.StreamDoc(4L, ts(40), "totally different words here"))
      q.processAllAvailable()
      val flags = spark.table("sdedup_fuzzy")
        .groupBy("doc_id")
        .agg(org.apache.spark.sql.functions.expr("bool_or(matched)")
          .as("is_dup"))
        .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
      assert(flags == Map(1L -> false, 2L -> true, 3L -> true, 4L -> false))
    } finally q.stop()
  }

  test("running per-key mean stays incrementally correct across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val q = Streams.runningMean(in.toDS())
      .writeStream.format("memory").queryName("running_mean")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(SessionEvent(1L, ts(0), 2.0), SessionEvent(1L, ts(1), 4.0))
      q.processAllAvailable()
      in.addData(SessionEvent(1L, ts(2), 9.0))
      q.processAllAvailable()
      val last = spark.table("running_mean").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .maxBy(_._2)
      assert(last == ((1L, 3L, 5.0)))
    } finally q.stop()
  }

  test("stream-stream interval join matches across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TypedEv]
    val src = in.toDF()
    val joined = Streams.intervalJoin(
      src.filter($"event_type" === "click"),
      src.filter($"event_type" === "purchase"),
      lookbackSec = 3600L, watermark = "24 hours")
    val q = joined.writeStream.format("memory").queryName("ivj")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: two clicks + one purchase 30 min after click 1
      in.addData(
        TypedEv(1L, 1L, ts(0), "click"),
        TypedEv(2L, 1L, ts(7000), "click"),
        TypedEv(3L, 1L, ts(1800), "purchase"))
      q.processAllAvailable()
      // batch 2: purchase 50 min after click 1 (must match the click
      // retained in state from batch 1), purchase 2.5h after click 1
      // (outside lookback -> only click 2 matches), other-user purchase
      in.addData(
        TypedEv(4L, 1L, ts(3000), "purchase"),
        TypedEv(6L, 1L, ts(9000), "purchase"),
        TypedEv(5L, 2L, ts(3000), "purchase"))
      q.processAllAvailable()
      val pairs = spark.table("ivj")
        .select("r_id", "l_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((3L, 1L), (4L, 1L), (6L, 2L)))
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch join on random replays") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(31)
    for (round <- 1 to 3) {
      val n = 30 + rnd.nextInt(30)
      val evs = (0 until n).map { i =>
        TypedEv(i.toLong, 1L + rnd.nextInt(3),
          ts(rnd.nextInt(12000).toLong),
          if (rnd.nextBoolean()) "click" else "purchase")
      }
      // batch reference
      val want = (for {
        p <- evs if p.event_type == "purchase"
        c <- evs if c.event_type == "click"
        if c.user_id == p.user_id &&
          !c.ts.after(p.ts) &&
          c.ts.getTime >= p.ts.getTime - 3600L * 1000
      } yield (p.event_id, c.event_id)).toSet
      val in = MemoryStream[TypedEv]
      val src = in.toDF()
      val joined = Streams.intervalJoin(
        src.filter($"event_type" === "click"),
        src.filter($"event_type" === "purchase"),
        lookbackSec = 3600L, watermark = "24 hours")
      val table = s"ivj_prop_$round"
      val q = joined.writeStream.format("memory").queryName(table)
        .outputMode(OutputMode.Append).start()
      try {
        // random batch boundaries over the TIME-SORTED stream (late
        // data beyond the watermark is a different contract)
        val sorted = evs.sortBy(_.ts.getTime)
        var rest = sorted
        while (rest.nonEmpty) {
          val k = 1 + rnd.nextInt(rest.size)
          in.addData(rest.take(k): _*)
          q.processAllAvailable()
          rest = rest.drop(k)
        }
        val got = spark.table(table).select("r_id", "l_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == want,
          s"round $round: missing=${want -- got} spurious=${got -- want}")
      } finally q.stop()
    }
  }

  test("streaming token budget: per-stratum running total carries " +
    "across batches; exhausted stratum keeps rejecting") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streams.BudgetDoc]
    val q = Streams.streamingTokenBudget(in.toDS(), budget = 100L)
      .writeStream.format("memory").queryName("sbudget")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Streams.BudgetDoc(1L, ts(0), "en", 60L),   // cum 60  kept
        Streams.BudgetDoc(2L, ts(10), "en", 30L),  // cum 90  kept
        Streams.BudgetDoc(3L, ts(20), "fr", 50L))  // cum 50  kept
      q.processAllAvailable()
      in.addData(
        Streams.BudgetDoc(4L, ts(30), "en", 20L),  // cum 110 REJECT
        Streams.BudgetDoc(5L, ts(40), "en", 5L),   // cum 115 REJECT (prefix rule)
        Streams.BudgetDoc(6L, ts(50), "fr", 40L))  // cum 90  kept
      q.processAllAvailable()
      val rows = spark.table("sbudget")
        .select("doc_id", "cum_tokens", "kept").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
      assert(rows == Map(
        1L -> ((60L, true)), 2L -> ((90L, true)), 3L -> ((50L, true)),
        4L -> ((110L, false)), 5L -> ((115L, false)), 6L -> ((90L, true))))
    } finally q.stop()
  }

  test("streaming decontaminate: stateless broadcast gram filter " +
    "matches the batch operator on every micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq((100L, "quick brown fox jumps")).toDF("doc_id", "text")
    val in = MemoryStream[Streams.StreamDoc]
    val q = Streams.streamingDecontaminate(in.toDF(), bench, "text", k = 3)
      .writeStream.format("memory").queryName("sdecon")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Streams.StreamDoc(1L, ts(0), "the quick brown fox jumps far"),
        Streams.StreamDoc(2L, ts(10), "nothing shared at all here"))
      q.processAllAvailable()
      in.addData(Streams.StreamDoc(3L, ts(20), "quick brown fox again"))
      q.processAllAvailable()
      val rows = spark.table("sdecon")
        .select("doc_id", "n_contaminated", "contaminated").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
      // doc 1 shares "quick brown fox" + "brown fox jumps"; doc 3 only
      // "quick brown fox"; doc 2 nothing
      assert(rows == Map(1L -> ((2L, true)), 2L -> ((0L, false)),
        3L -> ((1L, true))))
      // oversized bench fails loudly before any collect
      val big = intercept[IllegalArgumentException] {
        Streams.streamingDecontaminate(in.toDF(), bench, "text", k = 3,
          maxBenchGrams = 1)
      }
      assert(big.getMessage.contains("maxBenchGrams") ||
        big.getMessage.contains("distinct grams"))
    } finally q.stop()
  }

  /** Final summaries via the shared reader protocol
    * ([[Streams.hhLatest]]). */
  private def hhFinal(table: String): Map[String, Long] =
    Streams.hhLatest(spark.table(table))
      .collect().map(r => r.getAs[String]("item") ->
        r.getAs[Long]("est_count")).toMap

  test("streaming heavy hitters: exact regime carries bucket summaries " +
    "across batches — final state equals whole-stream counts") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = Streams.streamingHeavyHitters(
        in.toDF().toDF("id", "lang"), "lang", k = 16, buckets = 4)
      .writeStream.format("memory").queryName("shh")
      .outputMode(OutputMode.Update).start()
    val batch1 = Seq("en", "en", "fr", "de", "en")
    val batch2 = Seq("fr", "en", "zh", "fr", "de", "en")
    try {
      in.addData(batch1.zipWithIndex.map { case (l, i) => (i.toLong, l) })
      q.processAllAvailable()
      in.addData(batch2.zipWithIndex.map { case (l, i) => (100L + i, l) })
      q.processAllAvailable()
      val want = (batch1 ++ batch2).groupBy(identity)
        .map { case (l, xs) => l -> xs.size.toLong }
      assert(hhFinal("shh") == want)
    } finally q.stop()
  }

  test("streaming heavy hitters: decayed regime (distinct > k) keeps " +
    "the Misra-Gries bounds on the final state (seeded)") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(911L)
    val items = Seq.fill(400)(s"d${rnd.nextInt(12)}") ++
      Seq.fill(200)("hot.example") // guaranteed heavy hitter
    val (b1, b2) = rnd.shuffle(items).splitAt(items.size / 2)
    val in = MemoryStream[(Long, String)]
    val k = 4
    val q = Streams.streamingHeavyHitters(
        in.toDF().toDF("id", "item"), "item", k, buckets = 1)
      .writeStream.format("memory").queryName("shh2")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(b1.zipWithIndex.map { case (l, i) => (i.toLong, l) })
      q.processAllAvailable()
      in.addData(b2.zipWithIndex.map { case (l, i) => (1000L + i, l) })
      q.processAllAvailable()
      val est = hhFinal("shh2")
      val truth = items.groupBy(identity)
        .map { case (l, xs) => l -> xs.size.toLong }
      val n = items.size
      val bound = n.toDouble / (k + 1)
      assert(est.size <= k)
      est.foreach { case (item, e) =>
        assert(e <= truth(item), s"overcount $item: $e > ${truth(item)}")
        assert(truth(item) - e <= bound + 1e-9,
          s"$item est $e vs true ${truth(item)} exceeds n/(k+1)=$bound")
      }
      truth.foreach { case (item, t) =>
        if (t > bound) assert(est.contains(item),
          s"frequent item $item (count $t > $bound) missing")
      }
    } finally q.stop()
  }

  test("streaming heavy hitters: a decrement-all round that EMPTIES a " +
    "summary tombstones the old one — the reader never serves stale " +
    "evicted items") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = Streams.streamingHeavyHitters(
        in.toDF().toDF("id", "item"), k = 2, buckets = 1, itemCol = "item")
      .writeStream.format("memory").queryName("shh3")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData((1L, "a"))
      q.processAllAvailable()
      assert(hhFinal("shh3") == Map("a" -> 1L))
      // b fills the summary to k, c triggers decrement-all -> empty
      in.addData((2L, "b"), (3L, "c"))
      q.processAllAvailable()
      assert(hhFinal("shh3") == Map.empty,
        "reader served a stale superseded summary after eviction")
    } finally q.stop()
  }
}

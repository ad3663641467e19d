package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.SparkSession

/** Corpus-scale parity harness for the 12 live streaming twins
  * (round 18, verdict item 5): each twin's final state/emitted table
  * must equal its batch query over the SAME rows at an arbitrary SF —
  * the same comparisons the unit specs make at sf0.001, re-run at
  * corpus scale (sf1 = 500k docs / 1M events) where the RocksDB-backed
  * state actually carries millions of keys across micro-batch
  * boundaries. Dev verification tool (Test/runMain), not shipped
  * library surface — the twins themselves live in
  * src/main/scala/graft/engine/streaming/.
  *
  * Usage: Test/runMain graft.StreamParity <sfDir> <outJson> [only,names]
  *
  * Every check feeds the corpus through a MemoryStream in ≥2
  * micro-batches cut through users' series (state must survive the
  * seams) and compares against the batch operator's frame. The two
  * banded-sketch checks handle the over-cap regime — where the twins'
  * admission caps make behavior intentionally asymmetric to batch
  * (streaming admits the first `cap` arrivals, batch drops the whole
  * bucket — see StreamingMinHash.MaxBand's doc) and within-batch
  * group order is not deterministic — differently by corpus shape:
  * minhash deterministically EXCLUDES members of over-cap buckets
  * before feeding (its sf1 buckets are fine-grained, exclusion is
  * rare); simhash feeds the FULL corpus and restricts the COMPARISON
  * to pairs agreeing on a non-hot band — the regime where both
  * operators are exact — because its clone-dense sf1 corpus puts 89%
  * of docs in one degenerate bucket, making doc-level exclusion
  * degenerate (round 19, verdict item 4). Each artifact note records
  * what was excluded or reported-not-compared.
  */
object StreamParity {
  private def micros(ts: java.sql.Timestamp): Long =
    graft.engine.streaming.EventTime.micros(ts)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outJson = args(1)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').toSet) else None
    val spark = graft.engine.GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")

    val checks: Seq[(String, (SparkSession, String) => (Long, String))] = Seq(
      "stream_dedup_exact" -> dedupExact _,
      "stream_dedup_bounded" -> dedupBounded _,
      "stream_ewma" -> ewma _,
      "stream_median" -> median _,
      "stream_sessionize" -> sessionize _,
      "stream_streaks" -> streaks _,
      "stream_funnel" -> funnel _,
      "stream_temporal_join" -> temporal _,
      "stream_interval_join" -> interval _,
      "stream_cms" -> cms _,
      "stream_minhash" -> minhash _,
      "stream_simhash" -> simhash _
    )
    val results = checks
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
        val t0 = System.nanoTime()
        val (rows, note) =
          try fn(spark, sfDir)
          catch { case scala.util.control.NonFatal(e) =>
            (-1L, s"FAIL: ${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("").take(300))
          }
        val secs = (System.nanoTime() - t0) / 1e9
        val ok = rows >= 0
        println(f"[parity] $name%-24s ${if (ok) "PASS" else "FAIL"} " +
          f"rows=$rows%d ${secs}%.1fs $note")
        // clear lingering cached/checkpointed blocks between twins
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        spark.sharedState.cacheManager.clearCache()
        (name, rows, ok, note, secs)
      }
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val body = results.map { case (n, rows, ok, note, secs) =>
      f""" "$n": {"rows": $rows, "pass": $ok, "sec": $secs%.1f, "note": "${esc(note)}"}"""
    }.mkString(",\n")
    val nPass = results.count(_._3)
    val json =
      s"""{\n "sf_dir": "$sfDir",\n "n_pass": $nPass,\n "n_fail": ${results.size - nPass},\n "twins": {\n$body\n }\n}\n"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[parity] == $nPass/${results.size} twins match at $sfDir")
    if (nPass < results.size) sys.exit(1)
  }

  // ------------------------------------------------------------ events twins

  private def sortedEvents(spark: SparkSession, sf: String) = {
    import spark.implicits._
    graft.engine.Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"ts", $"event_id")
      .as[graft.engine.streaming.StreamingDedup.Ev].collect()
      .sortBy(e => (micros(e.ts), e.event_id))
  }

  private def feed[T](spark: SparkSession, data: Seq[T], parts: Int,
                      name: String,
                      mode: org.apache.spark.sql.streaming.OutputMode)(
      build: org.apache.spark.sql.Dataset[T] =>
        org.apache.spark.sql.DataFrame)(
      implicit enc: org.apache.spark.sql.Encoder[T])
      : org.apache.spark.sql.DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[T]
    val q = build(input.toDS()).writeStream.outputMode(mode)
      .format("memory").queryName(name).start()
    try {
      val step = math.max(1, data.length / parts)
      data.grouped(step).foreach { b =>
        input.addData(b.toIndexedSeq); q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name)
  }

  def dedupExact(spark: SparkSession, sf: String): (Long, String) = {
    import spark.implicits._
    val events = sortedEvents(spark, sf)
    val t = feed(spark, events.toSeq, 3, "p_dedup",
      org.apache.spark.sql.streaming.OutputMode.Append())(
      ds => graft.engine.streaming.StreamingDedup.firstArrivals(ds).toDF())
    val live = t.selectExpr("user_id", "event_type", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = graft.engine.ops.StreamOps.streamDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    require(live == batch, s"live=${live.size} batch=${batch.size}")
    (live.size.toLong, s"first-arrival keys over ${events.length} events")
  }

  def dedupBounded(spark: SparkSession, sf: String): (Long, String) = {
    import spark.implicits._
    val events = sortedEvents(spark, sf)
    val t = feed(spark, events.toSeq, 3, "p_dedup_b",
      org.apache.spark.sql.streaming.OutputMode.Append())(ds =>
      graft.engine.streaming.StreamingDedup
        .firstArrivalsBounded(ds, "1 hour").toDF())
    val rows = t.selectExpr("user_id", "event_type", "ts", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
    val exact = graft.engine.ops.StreamOps.streamDedup(spark, sf).count()
    require(rows.length >= exact,
      s"bounded dedup lost first arrivals: ${rows.length} < $exact")
    rows.groupBy(t => (t._1, t._2)).values.foreach { emits =>
      val ts = emits.map(_._3.getTime).sorted
      ts.zip(ts.tail).foreach { case (a, b) =>
        require(b - a > 3600 * 1000L,
          s"duplicate within the watermark bound for key ${emits.head}")
      }
    }
    (rows.length.toLong,
      s"within-bound guarantee held; $exact exact keys, ${rows.length} emits")
  }

  def ewma(spark: SparkSession, sf: String): (Long, String) = {
    import spark.implicits._
    val events = graft.engine.Tables.events(spark, sf)
      .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_id",
        "CAST(floor(value * 1000) AS BIGINT) AS v_mu")
      .as[graft.engine.streaming.StreamingEwma.EwmaEvent].collect()
      .sortBy(e => (micros(e.ts), e.event_id))
    val t = feed(spark, events.toSeq, 3, "p_ewma",
      graft.engine.streaming.StreamingEwma.outputMode)(
      ds => graft.engine.streaming.StreamingEwma.smooth(ds).toDF())
    val live = t.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = graft.engine.ops.Relational7.winEwma(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    require(live.size == events.length && live == batch,
      s"live=${live.size} batch=${batch.size} events=${events.length}")
    (live.size.toLong, "exact EWMA series across 3 batch seams")
  }

  def median(spark: SparkSession, sf: String): (Long, String) = {
    import spark.implicits._
    val events = graft.engine.Tables.events(spark, sf)
      .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_id",
        "CAST(floor(value * 1000) AS BIGINT) AS v_mu")
      .as[graft.engine.streaming.StreamingMedian.MedEvent].collect()
      .sortBy(e => (micros(e.ts), e.event_id))
    val t = feed(spark, events.toSeq, 3, "p_median",
      graft.engine.streaming.StreamingMedian.outputMode)(
      ds => graft.engine.streaming.StreamingMedian.median(ds).toDF())
    val live = t.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = graft.engine.ops.Relational8.winRollingMedian(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    require(live.size == events.length && live == batch,
      s"live=${live.size} batch=${batch.size}")
    (live.size.toLong, "exact rolling median across 3 batch seams")
  }

  def sessionize(spark: SparkSession, sf: String): (Long, String) = {
    import spark.implicits._
    import graft.engine.streaming.StreamingSessionize
    import StreamingSessionize.SessEvent
    val events = graft.engine.Tables.events(spark, sf)
      .select($"user_id", $"ts", $"event_id").as[SessEvent].collect()
      .sortBy(e => (micros(e.ts), e.event_id))
    val maxMs = events.map(_.ts.getTime).max
    val sentinel = SessEvent(events.head.user_id,
      new java.sql.Timestamp(maxMs + 49L * 3600 * 1000), Long.MaxValue)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessEvent]
    val q = StreamingSessionize.sessions(
        input.toDS().withWatermark("ts", "0 seconds"))
      .writeStream.outputMode(StreamingSessionize.outputMode)
      .format("memory").queryName("p_sess").start()
    try {
      val third = events.length / 3
      Seq(events.slice(0, third), events.slice(third, 2 * third),
        events.drop(2 * third)).foreach { b =>
        input.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      input.addData(Seq(sentinel)); q.processAllAvailable()
      input.addData(Seq(sentinel.copy(event_id = Long.MaxValue - 1)))
      q.processAllAvailable()
    } finally q.stop()
    val live = spark.table("p_sess").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .filter(_._4 <= maxMs * 1000L).toSet
    val batch = graft.engine.ops.Relational6.tsSessionize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    require(live == batch, s"live=${live.size} batch=${batch.size}")
    (live.size.toLong, "watermark-flushed sessions = batch islands")
  }

  def streaks(spark: SparkSession, sf: String): (Long, String) = {
    import spark.implicits._
    val events = graft.engine.Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"ts", $"event_id")
      .as[graft.engine.streaming.StatefulStreaks.StreakEvent].collect()
      .sortBy(e => (micros(e.ts), e.event_id))
    val t = feed(spark, events.toSeq, 2, "p_streaks",
      graft.engine.streaming.StatefulStreaks.outputMode)(
      ds => graft.engine.streaming.StatefulStreaks.longest(ds).toDF())
    val live = t.collect().map(r => r.getLong(0) -> r.getInt(1))
      .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).max }
    val batch = graft.engine.ops.StreamOps.streamState(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    require(live == batch, s"live=${live.size} batch=${batch.size}")
    (live.size.toLong, "longest streak per user = batch islands")
  }

  def funnel(spark: SparkSession, sf: String): (Long, String) = {
    import spark.implicits._
    import graft.engine.streaming.FunnelState
    val events = graft.engine.Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"ts", $"event_id")
      .as[FunnelState.Ev].collect()
      .sortBy(e => (FunnelState.micros(e.ts), e.event_id))
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    val t =
      try feed(spark, events.toSeq, 2, "p_funnel",
      org.apache.spark.sql.streaming.OutputMode.Update())(
        ds => FunnelState.funnel(ds).toDF())
      finally prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    def tup(r: org.apache.spark.sql.Row) =
      (r.getInt(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))
    val live = t.selectExpr("user_id", "depth", "t1s", "t2s", "t3s")
      .collect().map(r => r.getLong(0) -> tup(r))
      .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).max }
    val batch = graft.engine.ops.StreamOps.streamFunnel(spark, sf).collect()
      .map(r => r.getLong(0) -> tup(r)).toMap
    require(live.keySet == batch.keySet, "user sets differ")
    val diff = live.collect { case (u, v) if batch(u) != v => u }
    require(diff.isEmpty, s"funnel mismatch for ${diff.take(5)}")
    (live.size.toLong, "RocksDB transformWithState funnel = batch windows")
  }

  def temporal(spark: SparkSession, sf: String): (Long, String) = {
    import spark.implicits._
    import graft.engine.streaming.TemporalJoin
    import TemporalJoin.Msg
    // corpus-shaped temporal join: 'view' events are the state stream
    // (payload = event_id), 'click' events the query stream — the
    // as-of semantics enrich each click with the user's latest view
    // at-or-before the click's microsecond instant
    val ev = graft.engine.Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "event_id",
        "CAST(ts AS TIMESTAMP) AS ts")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        micros(r.getTimestamp(3))))
    val states = ev.collect { case (u, "view", id, t) =>
      Msg(u, isState = true, time = t, tie = id, payload = id) }
    val queries = ev.collect { case (u, "click", id, t) =>
      Msg(u, isState = false, time = t, tie = id, payload = 0L) }
    val all = (states ++ queries).sortBy(m => (m.time, m.tie))
    val t = feed(spark, all.toSeq, 3, "p_temporal",
      TemporalJoin.outputMode)(
      ds => TemporalJoin.enrich(ds).toDF())
    val live = t.selectExpr("key", "event_tie", "state_payload").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .sortBy(x => (x._1, x._2)).toSeq
    val left = spark.createDataset(queries.toSeq).toDF()
      .selectExpr("key AS lk", "time AS lt", "tie AS event_tie")
    val right = spark.createDataset(states.toSeq).toDF()
      .selectExpr("key AS rk", "time AS rt", "tie AS rtie",
        "payload AS state_payload")
    val batch = graft.engine.plans.AsOfJoin.frames(
        left, right, "lk", "rk", "lt", "rt", "rtie", outer = true)
      .selectExpr("lk", "event_tie", "state_payload").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .sortBy(x => (x._1, x._2)).toSeq
    require(live.length == queries.length, "one row per query event")
    require(live == batch, s"live=${live.size} batch=${batch.size}")
    (live.size.toLong,
      s"as-of enrichment of ${queries.length} clicks over ${states.length} views")
  }

  def interval(spark: SparkSession, sf: String): (Long, String) = {
    import spark.implicits._
    import graft.engine.streaming.IntervalJoin
    import IntervalJoin.{Buy, Click}
    val ev = graft.engine.Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"event_type",
        $"ts".cast("timestamp").as("ts"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"ts".as("click_ts"))
      .as[Click].collect().sortBy(c => (c.click_ts.getTime, c.click_id))
    val buys = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"),
        $"ts".as("purchase_ts"))
      .as[Buy].collect().sortBy(b => (b.purchase_ts.getTime, b.purchase_id))
    implicit val sqlCtx = spark.sqlContext
    val ci = MemoryStream[Click]
    val bi = MemoryStream[Buy]
    val q = IntervalJoin.join(ci.toDS(), bi.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("p_interval").start()
    try {
      ci.addData(clicks.take(clicks.length / 2).toIndexedSeq)
      bi.addData(buys.take(buys.length / 2).toIndexedSeq)
      q.processAllAvailable()
      ci.addData(clicks.drop(clicks.length / 2).toIndexedSeq)
      bi.addData(buys.drop(buys.length / 2).toIndexedSeq)
      q.processAllAvailable()
      ci.addData(Seq.empty); bi.addData(Seq.empty)
      q.processAllAvailable()
    } finally q.stop()
    val live = spark.table("p_interval")
      .selectExpr("user_id", "click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.engine.ops.StreamOps.streamJoin(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    require(batch.nonEmpty && live == batch,
      s"live=${live.size} batch=${batch.size}")
    (live.size.toLong,
      s"symmetric-hash interval join over ${clicks.length}+${buys.length} rows")
  }

  // ------------------------------------------------------------ sketch twins

  def cms(spark: SparkSession, sf: String): (Long, String) = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val keys = graft.engine.Tables.lineitem(spark, sf)
      .select($"l_partkey").as[Long].collect()
    val agg = udaf(new graft.engine.functions.CmsAggregator(4, 256))
    val t = feed(spark, keys.toSeq, 4, "p_cms",
      org.apache.spark.sql.streaming.OutputMode.Complete())(
      ds => ds.toDF("pk").agg(agg(col("pk")).as("cells")))
    val live = t.select(explode($"cells")).as[Long].collect().toSeq
    val batch = spark.createDataset(keys.toSeq).toDF("pk")
      .agg(agg(col("pk")).as("cells"))
      .select(explode($"cells")).as[Long].collect().toSeq
    require(live.length == 4 * 256 && live == batch, "CMS cells diverge")
    require(live.sum == keys.length * 4L, "increment conservation")
    (keys.length.toLong, s"streamed CMS cell-identical over ${keys.length} keys")
  }

  def minhash(spark: SparkSession, sf: String): (Long, String) = {
    import spark.implicits._
    import graft.engine.streaming.StreamingMinHash
    import StreamingMinHash.DocSig
    val all = graft.engine.ops.DedupOps.minhashSigs(
        graft.engine.ops.DedupOps.shingledDocs(spark, sf))
      .collect().map(r => DocSig(r.getLong(0), (1 to 16).map(r.getLong(_))))
      .filter(_.sig.nonEmpty).sortBy(_.doc_id)
    // parity is only defined under the admission cap (see file doc):
    // deterministically exclude every member of an over-cap bucket
    val bucketSizes = all.flatMap(d => StreamingMinHash.bandKeys(d.sig))
      .groupBy(identity).map { case (k, v) => k -> v.size }
    val hot = bucketSizes.collect {
      case (k, n) if n >= StreamingMinHash.MaxBand => k }.toSet
    val docs = all.filter(d => StreamingMinHash.bandKeys(d.sig)
      .forall(!hot.contains(_)))
    val excluded = all.length - docs.length
    val t = feed(spark, docs.toSeq, 2, "p_minhash",
      org.apache.spark.sql.streaming.OutputMode.Append())(
      ds => StreamingMinHash.candidates(ds).toDF())
    val live = t.selectExpr("doc_a", "doc_b", "matches").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expected = docs.flatMap(d =>
        StreamingMinHash.bandKeys(d.sig).map(_ -> d)).groupBy(_._1)
      .values.flatMap { members =>
        val ds = members.map(_._2).distinctBy(_.doc_id).sortBy(_.doc_id)
        for {
          i <- ds.indices; j <- (i + 1) until ds.length
          m = ds(i).sig.zip(ds(j).sig).count { case (a, b) => a == b }
        } yield (ds(i).doc_id, ds(j).doc_id, m)
      }.toSet
    require(expected.nonEmpty && live == expected,
      s"live=${live.size} expected=${expected.size}")
    (live.size.toLong,
      s"LSH pairs over ${docs.length} docs ($excluded over-cap excluded)")
  }

  def simhash(spark: SparkSession, sf: String): (Long, String) = {
    import spark.implicits._
    import graft.engine.streaming.StreamingSimhash
    import StreamingSimhash.DocFp
    val all = graft.engine.ops.DedupOps.dedupSimhash(spark, sf).collect()
      .map(r => DocFp(r.getLong(0), r.getLong(1))).sortBy(_.doc_id)
    val bucketSizes = all.flatMap(d => StreamingSimhash.bandKeys(d.simhash))
      .groupBy(identity).map { case (k, v) => k -> v.size }
    // FULL-corpus parity via pair-level regime restriction (round 19,
    // verdict item 4). The old check excluded every DOC touching an
    // over-cap bucket, which on the clone-dense sf1 corpus (one band
    // bucket holds 44,468/50k docs) left a 327-doc proof — and no cap
    // below 44k can do better doc-wise. But the batch/stream contract
    // is per-PAIR, not per-doc: batch drops over-cap buckets entirely,
    // streaming admits their first `cap` arrivals (arrival-order-
    // dependent, hence nondeterministic within a micro-batch) — so a
    // pair's behavior is DEFINED exactly when the two docs share at
    // least one NON-hot band. For such a pair both operators are exact
    // (the shared bucket is under cap, every member admitted), so:
    // feed ALL docs at the production cap, then compare the emitted
    // pairs THAT AGREE ON A NON-HOT BAND against the batch pair set
    // over the full corpus (the in-memory mirror of
    // dedupSimhashDup's banding + cap + verify, pre-shortlist).
    // Emissions outside the defined regime (hot-bucket prefix pairs —
    // which a production sink keeps, and batch intentionally drops as
    // boilerplate) are counted and reported, never compared.
    val hot = bucketSizes.collect {
      case (k, n) if n > graft.engine.ops.DedupOps.SimhashMaxBand => k
    }.toSet // mirrors batch: count > cap buckets are dropped there
    val fpById = all.map(d => d.doc_id -> d.simhash).toMap
    def definedPair(a: Long, b: Long): Boolean =
      StreamingSimhash.bandKeys(fpById(a))
        .zip(StreamingSimhash.bandKeys(fpById(b)))
        .exists { case (ka, kb) => ka == kb && !hot.contains(ka) }
    val t = feed(spark, all.toSeq, 3, "p_simhash",
      org.apache.spark.sql.streaming.OutputMode.Append())(
      ds => StreamingSimhash.duplicates(ds).toDF())
    val live = t.selectExpr("doc_a", "doc_b", "hamming").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val (defined, overCap) = live.partition(p => definedPair(p._1, p._2))
    val expected = all.flatMap(d =>
        StreamingSimhash.bandKeys(d.simhash).map(_ -> d)).groupBy(_._1)
      .collect { case (key, members) if !hot.contains(key) =>
        val ds = members.map(_._2).distinctBy(_.doc_id).sortBy(_.doc_id)
        for {
          i <- ds.indices; j <- (i + 1) until ds.length
          h = java.lang.Long.bitCount(ds(i).simhash ^ ds(j).simhash)
          if h <= StreamingSimhash.MaxHamming
        } yield (ds(i).doc_id, ds(j).doc_id, h)
      }.flatten.toSet
    val liveSet = defined.toSet
    require(expected.nonEmpty && liveSet == expected,
      s"live=${liveSet.size} expected=${expected.size}")
    (liveSet.size.toLong,
      s"full-corpus pair parity over ${all.length} docs: " +
        s"${liveSet.size} defined-regime pairs = batch banding exactly " +
        s"(${overCap.length} hot-bucket prefix emissions outside the " +
        s"defined regime, reported not compared)")
  }
}

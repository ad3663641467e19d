package graft

import org.scalatest.funsuite.AnyFunSuite

/** The §7.3 determinism promise, enforced wholesale: every declared
  * query must return IDENTICAL rows when the shuffle partition count
  * changes (32-ish default vs 7). Partition count is the one execution
  * parameter guaranteed to differ between local[32], the test JVM and
  * a 1000-executor cluster — any query whose result depends on it
  * (rand seeded per partition, first/any_value over unordered groups,
  * float reduction order leaking into a comparison) is broken at
  * scale even if the per-SF oracle hash happens to pass today. The
  * round-9 sample_stratified fix (sampleBy's partition-seeded rand)
  * is exactly the bug class this sweep exists to catch. */
class LayoutInvarianceSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  private lazy val names = SparkEntry.queries.keys.toSeq.sorted
  /** One default-conf pass shared by both sweep axes. */
  private lazy val baseline: Map[String, Seq[String]] = names.map { n =>
    n -> SparkEntry.queries(n)(spark, sf).collect().map(_.toString).toSeq
  }.toMap

  test("every SparkEntry query returns identical rows under a different " +
    "shuffle-partition count") {
    val key = "spark.sql.shuffle.partitions"
    val diffs = SparkTest.confLock.synchronized {
      baseline // FORCE under the default conf, BEFORE mutating it: a
      // lazy val first touched inside the sweep would be computed with
      // the alternate conf already set, turning the whole test into a
      // self-comparison that can never fail (exactly the vacuity this
      // suite exists to rule out)
      val saved = spark.conf.get(key)
      spark.conf.set(key, "7")
      try names.filter { n =>
        val alt = SparkEntry.queries(n)(spark, sf).collect()
          .map(_.toString).toSeq
        alt != baseline(n)
      } finally spark.conf.set(key, saved)
    }
    assert(diffs.isEmpty,
      s"${diffs.size} queries are shuffle-partition-dependent: " +
        diffs.mkString(", "))
  }

  test("every SparkEntry query returns identical rows with AQE disabled") {
    // AQE re-plans at runtime (broadcast conversion, partition
    // coalescing, skew splits); a result that depends on which plan
    // AQE picked would flake between data distributions. The engine
    // runs AQE-on everywhere — this proves the RESULTS never depend
    // on it.
    val key = "spark.sql.adaptive.enabled"
    val diffs = SparkTest.confLock.synchronized {
      baseline // force under default conf before mutating (see above)
      val saved = spark.conf.get(key)
      spark.conf.set(key, "false")
      try names.filter { n =>
        val alt = SparkEntry.queries(n)(spark, sf).collect()
          .map(_.toString).toSeq
        alt != baseline(n)
      } finally spark.conf.set(key, saved)
    }
    assert(diffs.isEmpty,
      s"${diffs.size} queries change results under AQE-off: " +
        diffs.mkString(", "))
  }

  test("every SparkEntry query returns identical rows with broadcast " +
    "joins disabled (forced shuffle joins, whole surface)") {
    // The sf0.01 forced-SMJ sweep below is scoped to the join_* family
    // by NAME — but implicit broadcast-join choices also hide in subq_*
    // (scalar/IN subqueries plan as broadcast exchanges), ts_asof_grid,
    // dedup_contamination and friends. autoBroadcastJoinThreshold=-1
    // flips every IMPLICIT broadcast to a shuffle join (explicit
    // broadcast() hints are unaffected by the threshold), so running
    // the WHOLE surface here closes the scope gap: any query whose
    // result leans on which side was broadcast diverges.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val diffs = SparkTest.confLock.synchronized {
      baseline // force under default conf before mutating (see above)
      val saved = spark.conf.get(key)
      spark.conf.set(key, "-1")
      try names.filter { n =>
        val alt = SparkEntry.queries(n)(spark, sf).collect()
          .map(_.toString).toSeq
        alt != baseline(n)
      } finally spark.conf.set(key, saved)
    }
    assert(diffs.isEmpty,
      s"${diffs.size} queries change results with broadcast joins " +
        s"disabled: ${diffs.mkString(", ")}")
  }

  test("every SparkEntry query returns identical rows with ANSI mode " +
    "flipped off") {
    // Spark 4 runs ANSI-on by default; the legacy mode turns a class
    // of runtime errors (overflow, bad casts, out-of-range element_at)
    // into silent NULLs. No declared query errors under ANSI, so the
    // two modes must agree — a divergence here means a query is
    // leaning on a silent-null path that ANSI would have refused, the
    // kind of hidden wrongness that surfaces only after a config
    // change on a production cluster.
    val key = "spark.sql.ansi.enabled"
    val diffs = SparkTest.confLock.synchronized {
      baseline // force under default conf before mutating (see above)
      val saved = spark.conf.get(key)
      spark.conf.set(key, "false")
      try names.filter { n =>
        val alt = SparkEntry.queries(n)(spark, sf).collect()
          .map(_.toString).toSeq
        alt != baseline(n)
      } finally spark.conf.set(key, saved)
    }
    assert(diffs.isEmpty,
      s"${diffs.size} queries change results with ANSI off: " +
        diffs.mkString(", "))
  }

  // ---- second scale factor: stats-sensitive queries -------------
  // Broadcast↔SMJ boundaries flip with table STATS, so a sweep pinned
  // at one SF can never catch a layout dependence that only appears
  // once a side crosses the broadcast threshold. Rather than hoping
  // sf0.01's sizes happen to straddle the boundary, force the flip:
  // autoBroadcastJoinThreshold=-1 turns every broadcast join into a
  // shuffle join — every query whose RESULT depends on which side was
  // broadcast (row order leaking through first/limit, build-side
  // nondeterminism) diverges immediately. Scoped to the queries whose
  // plans actually contain stats-driven join choices: the join_*
  // family plus text_lm_bigram (its deliberate non-broadcast probe).
  private lazy val statsSensitive =
    names.filter(n => n.startsWith("join_") || n == "text_lm_bigram")
  private val sf2 = "/root/testdata/sf0.01"
  private lazy val baselineSf2: Map[String, Seq[String]] =
    statsSensitive.map { n =>
      n -> SparkEntry.queries(n)(spark, sf2).collect().map(_.toString).toSeq
    }.toMap

  test("stats-sensitive queries return identical rows at sf0.01 with " +
    "broadcast joins disabled (forced SMJ) and under a different " +
    "shuffle-partition count") {
    val diffs = SparkTest.confLock.synchronized {
      baselineSf2 // force under default conf before mutating (see above)
      val bKey = "spark.sql.autoBroadcastJoinThreshold"
      val pKey = "spark.sql.shuffle.partitions"
      val (b0, p0) = (spark.conf.get(bKey), spark.conf.get(pKey))
      def sweep(tag: String): Seq[String] = statsSensitive.filter { n =>
        SparkEntry.queries(n)(spark, sf2).collect()
          .map(_.toString).toSeq != baselineSf2(n)
      }.map(n => s"$n[$tag]")
      try {
        spark.conf.set(bKey, "-1")
        val noBroadcast = sweep("no-broadcast")
        spark.conf.set(bKey, b0)
        spark.conf.set(pKey, "7")
        noBroadcast ++ sweep("partitions=7")
      } finally { spark.conf.set(bKey, b0); spark.conf.set(pKey, p0) }
    }
    assert(diffs.isEmpty,
      s"${diffs.size} stats-sensitive queries are layout-dependent at " +
        s"sf0.01: ${diffs.mkString(", ")}")
  }

  test("every SparkEntry query returns identical rows under a different " +
    "file-split layout (tiny maxPartitionBytes)") {
    // The one layout axis the other sweeps can't reach: how the SCAN
    // itself is partitioned. On local[32] each sf0.001 table is one
    // split; on a 1000-executor cluster reading 100 TB, every file is
    // cut into many ranges and packed into partitions differently —
    // so a query whose result leans on the initial scan layout
    // (zipWithIndex over raw scan partitions, first/any_value before
    // any repartition, spark_partition_id leaking into output) passes
    // every shuffle/AQE sweep and still breaks on a real cluster.
    // 8 KiB ranges + zero open cost re-split every table (lineitem
    // 117 KB → ~15 ranges) and repack the bins.
    val mKey = "spark.sql.files.maxPartitionBytes"
    val oKey = "spark.sql.files.openCostInBytes"
    val diffs = SparkTest.confLock.synchronized {
      baseline // force under default conf before mutating (see above)
      val probe = s"$sf/lineitem.parquet"
      val before = spark.read.parquet(probe).rdd.getNumPartitions
      val (m0, o0) = (spark.conf.get(mKey), spark.conf.get(oKey))
      spark.conf.set(mKey, "8192")
      spark.conf.set(oKey, "0")
      try {
        // vacuity guard: the knob must actually change the scan layout,
        // or the whole sweep is a self-comparison that can never fail
        val after = spark.read.parquet(probe).rdd.getNumPartitions
        assert(after > before,
          s"tiny maxPartitionBytes left the probe scan at $after " +
            s"partition(s) (was $before) — the sweep proved nothing")
        names.filter { n =>
          val alt = SparkEntry.queries(n)(spark, sf).collect()
            .map(_.toString).toSeq
          alt != baseline(n)
        }
      } finally { spark.conf.set(mKey, m0); spark.conf.set(oKey, o0) }
    }
    assert(diffs.isEmpty,
      s"${diffs.size} queries are file-split-layout-dependent: " +
        diffs.mkString(", "))
  }

  test("every SparkEntry query returns identical rows in reliable-" +
    "checkpoint mode (spark.graft.checkpointDir set)") {
    // CheckpointsSpec proves representative call sites engage the knob;
    // THIS sweep proves the whole 244-query surface is result-identical
    // when every Checkpoints.cut switches from executor-local blocks to
    // replicated-storage checkpoint() — i.e. reliable mode is a pure
    // durability trade anywhere in the engine, not just where it was
    // spot-checked.
    import graft.engine.ops.Checkpoints
    val diffs = SparkTest.confLock.synchronized {
      baseline // force under default conf before mutating (see above)
      val dir = java.nio.file.Files.createTempDirectory("graft-reliable-sweep")
      spark.conf.set(Checkpoints.DirKey, dir.toString)
      try {
        val out = names.filter { n =>
          val alt = SparkEntry.queries(n)(spark, sf).collect()
            .map(_.toString).toSeq
          alt != baseline(n)
        }
        val walk = java.nio.file.Files.walk(dir)
        val wrote =
          try walk.filter(_.getFileName.toString.startsWith("rdd-")).count()
          finally walk.close()
        assert(wrote > 0, "sweep ran but no reliable checkpoint was " +
          "written — the knob never engaged, so the sweep proved nothing")
        out
      } finally spark.conf.unset(Checkpoints.DirKey)
    }
    assert(diffs.isEmpty,
      s"${diffs.size} queries change results in reliable-checkpoint mode: " +
        diffs.mkString(", "))
  }
}

package graft.tools

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{GraftBridge, SparkSession}

/** Scale-proof bench lane: runs the most expensive registry queries at
  * sf0.1 AND at the derived 10× fixture ([[ScaleFixture]]), recording wall
  * time plus task-level shuffle-read/write bytes, spill, and input bytes
  * from a [[SparkListener]]. Writes `BENCH_sf1.json`.
  *
  * This is the measurement behind the 100-TB design claim: every banded /
  * bucketed / per-candidate-priced operator should grow ~linearly in both
  * time and shuffle volume when the corpus grows 10×. A query whose time
  * growth is far above the data growth is a real scale bug (an accidental
  * quadratic pair generator, a broadcast flipped to shuffle, a skew
  * collapse) — exactly the regression class sf0.1-only benching cannot see.
  *
  * Methodology: one global JVM/codegen/parquet-reader warmup; per query,
  * sf0.1 runs twice FULLY COLD (fresh session + cleared cache, see
  * [[runOnce]]) keeping the faster run (post-JIT steady state, same work),
  * the 10× scale runs once, equally cold — so both sides of the growth
  * ratio include index construction and every shuffle the operator
  * actually pays. Results materialize into the `noop` sink like
  * [[graft.Bench]], so sorts/projections are not pruned away. Task metrics
  * are scoped per query by draining the async listener bus before and
  * after each run ([[GraftBridge.flushListenerBus]]).
  */
object ScaleBench {

  /** The 40-query scale lane: the round-7 cold-cost top 20 (the operators
    * whose scale behavior carries the 100-TB claim — dedup audit tiers,
    * LSH/PPJoin pair generators, the iterative graph family, pipeline
    * compositions, ANN with quantization, heavy aggregates) widened in
    * round 8 with the next-heaviest registry entries and the round-8
    * additions (stored index lifecycles, k-core, the BPE round trip). */
  val DefaultQueries: Seq[String] = Seq(
    // the round-7 cold-cost top 20
    "q_dedup_calibration", "q_graph_pagerank", "q_pipeline_clean",
    "q_dedup_ppjoin", "q_pipeline_curate", "q_dedup_substr",
    "q_dedup_clustcoeff", "q_dedup_containment", "q_percentile",
    "q_pipeline_rag", "q_profile", "q_dedup_lsh_pairs", "q_ev_wau",
    "q_dedup_triangles", "q_txt_lm_score", "q_mix_resample", "q_sim_ivfpq",
    "q_dedup_incremental", "q_ev_json", "q_dq_checksum",
    // round-8 widening: the next-heaviest + the round-8 additions, covering
    // the index lifecycles, the graph family's second iterative shape, the
    // BPE round trip, and the remaining join/audit shapes
    "q_dedup_indexed", "q_dedup_bucket_stats", "q_txt_bpe_encode",
    "q_graph_kcore", "q_sim_ivf_indexed", "q_dedup_jaccard", "q_dq_refint",
    "q_dedup_clusters", "q_txt_bpe_merges", "q_approx_percentile",
    "q_ev_quantile_bins", "q_dedup_semantic", "q_approx_distinct",
    "q_tpch_q21", "q_tpch_q9", "q_txt_gopher", "q_sim_mmr", "q_sim_hamming",
    "q_txt_winnow", "q_txt_contamination",
    // round-9 additions: the stored-index probes, the incremental index
    // append, and the one-fact-shuffle Q21 rewrite (measured against
    // q_tpch_q21's broadcast→SMJ flip, the round-8 lane max)
    "q_dedup_ppjoin_indexed", "q_dedup_index_append", "q_tpch_q21_win",
    // round-10 additions: the compaction half of the index lifecycle —
    // the maintenance operator whose whole value proposition is a scale
    // claim (bounded scan fan-in after N appends), so it must be measured
    // where the claim lives: at 10× with build+copy+rewrite included
    "q_dedup_index_compact", "q_sim_ivf_compact",
    // round-10 additions, part 2: the partition-wise merges — the
    // scale-out face of the index lifecycle (shard-local builds + a
    // stored-artifact merge), measured build-inclusive like the append
    "q_dedup_index_merge", "q_sim_ivf_merge",
    // round-10 additions, part 3: the delete face — erasure's whole value
    // proposition is a scale claim (bounded-touch rewrite, not a rebuild),
    // so it is measured build+copy+erasure-inclusive like compaction
    "q_dedup_index_forget", "q_sim_ivf_forget",
    // round-11 additions: the crawl-mouth gates — their O(batch) verdict
    // claim was previously INFERRED from the append twin's growth; now
    // measured directly, cold and build-inclusive like the siblings —
    // plus the IVF health dashboard (one stored-lists pass by design)
    "q_dedup_gate", "q_sim_gate", "q_sim_ivf_stats",
    // the deferred-statistics lifecycle face (O(batch) streaming append
    // + one maintenance restate), cold and build+copy-inclusive
    "q_dedup_index_restate",
    // round-12 additions: the one-call maintenance entry points (the
    // operators a 100-TB deployment actually crons — vacuum + restate +
    // compact behind measured triggers), the IVF retrain (the act step
    // of the measured-drift loop: full re-assign + two promotions), and
    // the DSIR selection (its broadcast-model claim — the corpus must
    // never shuffle to meet the ≤1024-row model)
    "q_dedup_index_maintain", "q_sim_ivf_maintain", "q_sim_ivf_retrain",
    "q_txt_dsir",
    // round-13 addition: q_tpch_q10's combined-lane slot moved 3.18×
    // between rounds 11 and 12 on untouched code (the A/B attributed it
    // to lane state, SCALE.md §6) — giving it a fresh-JVM dual-scale slot
    // makes its authoritative number a cold measurement from here on
    "q_tpch_q10",
    // round-15 addition: the scaled-quantizer probe (the broadcast
    // (cid,c) join path a grown index runs after its first √n retrain)
    // — its scale behavior is the whole reason the path exists
    "q_sim_ivf_scaled")

  /** Subset measured at 100× as well (`SPARK_GRAFT_SCALE_MODE=curve`, a
    * separate JVM pass — see [[runCurve]]) — the heaviest banded/iterative
    * operators, giving a THREE-point growth curve (1×, 10×, 100×). The
    * decade slope log10(t₁₀₀/t₁₀) is the scaling exponent over the last
    * decade: 1.0 = perfectly linear, values well above ~1.3 indicate
    * super-linear growth the 10× point alone could hide. */
  val CurveQueries: Seq[String] = Seq(
    "q_dedup_calibration", "q_dedup_ppjoin", "q_dedup_substr",
    "q_graph_pagerank", "q_pipeline_curate", "q_pipeline_clean",
    "q_dedup_lsh_pairs", "q_dedup_containment", "q_txt_lm_score",
    "q_profile",
    // round 11: the crawl-mouth gate — its 10× growth is measured in the
    // dual-scale lane; the third point pins the verdict cost over two
    // decades of corpus (build-inclusive like the lifecycle siblings)
    "q_dedup_gate",
    // round 12: the two remaining operators whose 100-TB claims are
    // load-bearing but had only 10× points — the ANN novelty gate and
    // the deferred-statistics restate lifecycle (both build-inclusive)
    "q_sim_gate", "q_dedup_index_restate",
    // round 12, part 2: the scheduled-maintenance entry point and the
    // IVF retrain — the cron'd operations whose cost model (once per
    // maintenance cycle, NOT per batch) only a third decade can confirm
    "q_dedup_index_maintain", "q_sim_ivf_retrain")

  /** Max JVM heap in GiB — recorded in every artifact line: spill columns
    * are only interpretable against the memory the run actually had. */
  private def heapGb: Long =
    math.round(Runtime.getRuntime.maxMemory() / (1024.0 * 1024 * 1024))

  final case class Metrics(sec: Double, shuffleReadB: Long, shuffleWriteB: Long,
                           spillMemB: Long, spillDiskB: Long, inputB: Long,
                           tasks: Long) {
    def json: String = {
      def mb(b: Long): String = f"${b / 1048576.0}%.1f"
      s"""{"sec":$sec,"shuffle_read_mb":${mb(shuffleReadB)},""" +
        s""""shuffle_write_mb":${mb(shuffleWriteB)},""" +
        s""""spill_mem_mb":${mb(spillMemB)},"spill_disk_mb":${mb(spillDiskB)},""" +
        s""""input_mb":${mb(inputB)},"tasks":$tasks}"""
    }
  }

  /** Accumulates task metrics between [[reset]] and [[snapshot]]. All adds
    * happen on the listener-bus thread; the bench thread reads only after
    * a bus drain, so the AtomicLongs are the complete happens-before story. */
  private final class MetricsListener extends SparkListener {
    private val sr, sw, sm, sd, in, nt = new AtomicLong(0L)
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        sr.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        sw.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        sm.addAndGet(m.memoryBytesSpilled)
        sd.addAndGet(m.diskBytesSpilled)
        in.addAndGet(m.inputMetrics.bytesRead)
        nt.incrementAndGet()
        ()
      }
    }
    def reset(): Unit = Seq(sr, sw, sm, sd, in, nt).foreach(_.set(0L))
    def snapshot(sec: Double): Metrics =
      Metrics(sec, sr.get, sw.get, sm.get, sd.get, in.get, nt.get)
  }

  /** One fully-COLD measured run. The dedup/ANN operators deliberately
    * memoize their shared indexes per (session, dir) and leave them in the
    * SQL cache for sibling queries — correct production behavior, but it
    * would let a warm second run (or a cached sibling) report near-zero
    * shuffle and flatter the baseline side of the growth ratio. A fresh
    * `newSession()` defeats the session-keyed memos, and `clearCache()`
    * drops prior runs' blocks from the SHARED cache manager (plan-equality
    * lookup would otherwise serve them to the new session), so both scales
    * pay the full operator cost including index construction. */
  private def runOnce(spark: SparkSession, l: MetricsListener,
                      name: String, dir: String): Metrics = {
    val s = spark.newSession()
    s.catalog.clearCache()
    // The stored-index queries memoize their index DIRECTORY per JVM
    // (build-once/read-many — correct production behavior), which
    // newSession()+clearCache() does not defeat: the sf0.1 baseline's
    // min-of-two would skip the index build while the single 10× run
    // pays it, inflating growth. Forget the locations so every timed
    // run is build-inclusive at BOTH scales.
    graft.queries.Dedup.resetStoredIndexMemos()
    graft.queries.Similarity.resetStoredIndexMemos()
    GraftBridge.flushListenerBus(spark)
    l.reset()
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(s, dir)
      .write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    GraftBridge.flushListenerBus(spark)
    l.snapshot(sec)
  }

  /** The three-point growth curve (1×, 10×, 100×) for [[CurveQueries]],
    * written to `BENCH_sf1_curve.json`. A SEPARATE JVM pass from the
    * dual-scale lane by design: measurement hygiene. A long-lived driver
    * JVM that has executed 60+ heavy query runs accumulates old-gen
    * pressure that inflated a 100× measurement 3× in round 8
    * (q_txt_lm_score benched 320 s late in the combined pass vs a
    * reproducible ~97 s in a fresh JVM — a false super-linear verdict).
    * Each point here is fully cold (fresh session + cleared cache), the
    * JVM runs only the ~30 curve executions, and an explicit GC runs
    * between queries. */
  private def runCurve(spark: SparkSession, l: MetricsListener,
                       sf01: String, x10: String,
                       queries: Seq[String] = CurveQueries): Unit = {
    val outFile =
      sys.env.getOrElse("SPARK_GRAFT_SCALE_CURVE_OUT", "BENCH_sf1_curve.json")
    val x100 = ScaleFixture.ensure(spark, sf01, "target/scale/x100", 100)
    spark.read.parquet(s"$x100/region.parquet").count() // first-scan warmup
    val entries = queries.map { name =>
      val a = runOnce(spark, l, name, sf01)
      val b = runOnce(spark, l, name, sf01)
      val base = if (a.sec <= b.sec) a else b
      val at10 = runOnce(spark, l, name, x10)
      val at100 = runOnce(spark, l, name, x100)
      val slope = math.log10(at100.sec / at10.sec)
      System.err.println(
        f"[curve] $name%-24s 1x ${base.sec}%6.2fs  10x ${at10.sec}%7.2fs" +
          f"  100x ${at100.sec}%8.2fs  decade-slope ${slope}%5.2f")
      System.gc() // bound old-gen carryover between heavy queries
      (name, base, at10, at100, slope)
    }
    val slopes = entries.map(_._5).sorted
    val qj = entries.map { case (n, b, t10, t100, sl) =>
      f""""$n":{"sec_1x":${b.sec},"sec_10x":${t10.sec},"sec_100x":${t100.sec},""" +
        f""""x10":${t10.json},"x100":${t100.json},"decade_slope":$sl%.2f}"""
    }.mkString("{", ",", "}")
    val line =
      f"""{"fixture":"${ScaleFixture.stamp(100)}","heap_gb":$heapGb,""" +
        f""""cpus":${Runtime.getRuntime.availableProcessors()},"x100_dir":"$x100","queries":$qj,""" +
        f""""median_decade_slope":${slopes(slopes.length / 2)}%.2f,""" +
        f""""max_decade_slope":${slopes.last}%.2f,""" +
        s""""superlinear_slope_gt1_3":${
          entries.filter(_._5 > 1.3).map("\"" + _._1 + "\"").mkString("[", ",", "]")}}"""
    println(line)
    Files.write(Paths.get(outFile), (line + "\n").getBytes(UTF_8))
  }

  def main(args: Array[String]): Unit = {
    val sf01 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outFile = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "BENCH_sf1.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val only = sys.env.get("SPARK_GRAFT_SCALE_QUERIES")
      .map(_.split(",").map(_.trim).toSet)
    val queries = DefaultQueries.filter(q => only.forall(_(q)))

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val x10 = ScaleFixture.ensure(spark, sf01)

    // Warmup: JVM/codegen + first-scan parquet machinery on both dirs.
    spark.range(1 << 20).selectExpr("sum(id * 2)").collect()
    spark.read.parquet(s"$sf01/region.parquet").count()
    spark.read.parquet(s"$x10/region.parquet").count()

    val l = new MetricsListener
    spark.sparkContext.addSparkListener(l)

    // Curve mode runs in its OWN JVM pass (see the scaladoc note on
    // measurement hygiene): re-measures all three points cold and writes
    // the separate curve artifact, then exits.
    if (sys.env.get("SPARK_GRAFT_SCALE_MODE").contains("curve")) {
      runCurve(spark, l, sf01, x10,
        CurveQueries.filter(q => only.forall(_(q))))
      spark.stop()
      return
    }

    // Variance-band protocol (round 15, matching the headline lane's):
    // N fresh-session passes PER SCALE POINT, min/median/max recorded,
    // growth computed median-over-median — so a cross-round "q_x improved
    // 3.59× → 2.47×" claim cites a band instead of two single runs.
    // Default 3; SPARK_GRAFT_SCALE_REPS=1 restores the cheap single-pass
    // shape for local iteration. A non-numeric or non-positive value
    // degrades to the default instead of crashing the lane (round-16
    // ADVICE fix: bare toInt threw, 0 made medianOf index out of bounds).
    val reps = math.max(1,
      sys.env.get("SPARK_GRAFT_SCALE_REPS").flatMap(_.toIntOption).getOrElse(3))
    def medianOf(ms: Seq[Metrics]): Metrics =
      ms.sortBy(_.sec).apply(ms.length / 2)
    def bandJson(ms: Seq[Metrics]): String = {
      val s = ms.map(_.sec).sorted
      f"""{"min":${s.head}%.2f,"med":${s(s.length / 2)}%.2f,"max":${s.last}%.2f,"passes":${s.length}}"""
    }
    val rows = queries.map { name =>
      val basePasses = Seq.fill(reps)(runOnce(spark, l, name, sf01))
      val scaledPasses = Seq.fill(reps)(runOnce(spark, l, name, x10))
      val base = medianOf(basePasses)
      val scaled = medianOf(scaledPasses)
      val growth = scaled.sec / base.sec
      // base == 0 and scaled > 0 is the "broadcast flipped to shuffle"
      // regression class this lane exists to catch — report Infinity (JSON
      // sentinel 1e308, flagged below), never the best-possible 0.0.
      val shuffleGrowth =
        if (base.shuffleWriteB > 0)
          scaled.shuffleWriteB.toDouble / base.shuffleWriteB
        else if (scaled.shuffleWriteB > 0) Double.PositiveInfinity
        else 0.0
      System.err.println(
        f"[scale] $name%-24s sf0.1 ${base.sec}%6.2fs  x10 ${scaled.sec}%7.2fs" +
          f"  growth ${growth}%5.2fx  shuffle ${shuffleGrowth}%5.2fx" +
          s"  (band ${bandJson(basePasses)} -> ${bandJson(scaledPasses)})")
      (name, base, scaled, growth, shuffleGrowth,
        bandJson(basePasses), bandJson(scaledPasses))
    }

    val growths = rows.map(_._4).sorted
    val median = growths(growths.length / 2)
    val superlinear = rows.filter(_._4 > 13.0).map(_._1)
    // A zero-shuffle baseline that shuffles at 10× has no finite ratio:
    // emit null (raw bytes are in the per-point json) and flag the query.
    val shuffleFlips = rows.filter(_._5.isPosInfinity).map(_._1)
    val qJson = rows.map { case (n, b, s, g, sg, bBand, sBand) =>
      val sgJson = if (sg.isPosInfinity) "null" else f"$sg%.2f"
      s""""$n":{"sf01":${b.json},"x10":${s.json},""" +
        s""""sf01_band":$bBand,"x10_band":$sBand,""" +
        f""""growth_time":$g%.2f,"growth_shuffle_write":$sgJson}"""
    }.mkString("{", ",", "}")
    val line =
      s"""{"fixture":"${ScaleFixture.stamp(ScaleFixture.Replicas)}","replicas":${ScaleFixture.Replicas},""" +
        s""""heap_gb":$heapGb,"cpus":${Runtime.getRuntime.availableProcessors()},""" +
        s""""passes_per_point":$reps,""" +
        s""""sf01_dir":"$sf01","x10_dir":"$x10","queries":$qJson,""" +
        f""""summary":{"n":${rows.length},"median_growth":$median%.2f,""" +
        f""""max_growth":${growths.last}%.2f,""" +
        s""""superlinear_gt13":${superlinear.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
        s""""shuffle_flips":${shuffleFlips.map("\"" + _ + "\"").mkString("[", ",", "]")}}}"""
    println(line)
    Files.write(Paths.get(outFile), (line + "\n").getBytes(UTF_8))
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Benchmark main (driver contract: one JSON line on stdout — printed
  * IMMEDIATELY after the per-query phase so finished measurements are never
  * held hostage to the scaling phase; a second, superset JSON line follows
  * once scaling evidence lands, so the last parseable line is the complete
  * artifact).
  *
  * Two measurements:
  *  1. per-query wall times over SPARK_GRAFT_SF_DIR at SPARK_GRAFT_CPUS —
  *     `SPARK_GRAFT_QUERY_REPS` (default 3) interleaved rounds over the
  *     whole query set, per-query MEDIAN reported, so one ambient-noise
  *     burst cannot poison a query's headline number (round-1 lesson:
  *     single-shot timings showed 26-37s for single-Window plans);
  *  2. the scaling gate (BASELINE.md / BENCH.md): the flagship job over the
  *     SAME input files at BOTH protocol pairs — local[1]→local[4] (the
  *     bandwidth-uncontended N→4N-node proxy) AND local[8]→local[32]
  *     (BASELINE.md's literal sandbox pair) — run as back-to-back pairs
  *     with outlier rejection AND contention rejection-for-cause (r5:
  *     /proc/stat + /proc/self/stat deltas around every timed side split
  *     host CPU into ours/idle/steal/other-tenants; a side where other
  *     tenants took > SPARK_GRAFT_CONTENTION_MAX of the host is a
  *     contended measurement — logged with raw ms + telemetry, excluded
  *     up front, and retried within budget, so a contended campaign is
  *     self-evidently contended in the artifact itself), bounded by a
  *     wall-clock budget (`SPARK_GRAFT_SCALE_BUDGET_SEC`, default 1260s
  *     across both pairs) that stops cleanly and reports
  *     clean-pairs-so-far. Appends rows to
  *     the untracked `bench_rows.pending.md` (folded into BENCH.md's
  *     `<!-- bench-rows -->` marker at record time — a bench run must not
  *     dirty the work tree). Skipped when SPARK_GRAFT_SCALING=0.
  */
object Bench {

  private def session(cpus: Int, shufflePartitions: Int = 0,
                      forScaling: Boolean = false): SparkSession = {
    val sp = if (shufflePartitions > 0) shufflePartitions else cpus
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", sp.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val b2 = if (forScaling) b
      // Scaling runs pin the physical plan IDENTICAL at both core counts:
      //  - AQE coalescing targets ~64MB partitions, which at the bench
      //    corpus size merges the shuffle down to ~16 fat partitions —
      //    capping the high-side's usable parallelism while barely
      //    affecting the low side (measured as chronic eff ~0.5-0.7 in
      //    round 1). Partition count must be a constant of the JOB, not
      //    of the data:cores ratio, for a parallelism experiment.
      //  - 32MB scan splits keep the parquet scan stage at ≥ 4N tasks.
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (32L * 1024 * 1024).toString)
    else b
    val s = b2.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Materialize the deterministic corpus once (same bytes regardless of
    * parallelism) so timed runs measure the ENGINE on a real table scan,
    * not the generator. 64 files → scan stage splits evenly at any core
    * count.
    */
  private def materializeCorpus(spark: SparkSession, nConvs: Long, dir: String): Long = {
    graft.datagen.TranscriptGen.turns(spark, nConvs)
      .repartition(64)
      .write.mode("overwrite").parquet(s"$dir/turns")
    graft.datagen.TranscriptGen.state(spark, nConvs)
      .repartition(16)
      .write.mode("overwrite").parquet(s"$dir/state")
    spark.read.parquet(s"$dir/turns").count()
  }

  /** One timed flagship run: parquet scan → hash-clustered layout → feature
    * matrix. Hash, not range (r4): the native as-of merge co-partitions its
    * two children, which only composes under hash partitioning — a range
    * layout forces BOTH sides through extra exchanges (see
    * `Ordered.clusteredPartitions`). The explicit repartition is the one
    * full-table exchange of the whole job; the as-of, the window stack and
    * the final aggregate all reuse it.
    */
  private def flagshipRun(spark: SparkSession, dir: String): Double = {
    val turns = spark.read.parquet(s"$dir/turns")
    val state = spark.read.parquet(s"$dir/state")
    val t0 = System.nanoTime()
    val m = graft.features.FeatureRegistry.featureMatrix(
      graft.ops.Ordered.clusteredPartitions(turns, "conv_id"), Some(state))
    m.write.mode("overwrite").format("noop").save()
    (System.nanoTime() - t0) / 1e9
  }

  /** One /proc snapshot: host-wide jiffies (total / idle+iowait / steal,
    * first line of /proc/stat) and THIS process's utime+stime jiffies
    * (/proc/self/stat — the forked bench JVM, which in local mode contains
    * every Spark executor thread). Deltas across a timed run split the
    * host's CPU time into ours / idle / stolen / OTHER TENANTS — the last
    * being the contention signal three rounds of driver artifacts lacked.
    */
  private final case class CpuSnap(total: Long, idle: Long, steal: Long, self: Long)
  private def cpuSnap(): CpuSnap = try {
    val host = Files.readString(Paths.get("/proc/stat"))
      .linesIterator.next().trim.split("\\s+").drop(1).map(_.toLong)
    val total = host.sum
    val idle = host(3) + (if (host.length > 4) host(4) else 0L)
    val steal = if (host.length > 7) host(7) else 0L
    val self0 = Files.readString(Paths.get("/proc/self/stat"))
    // comm (field 2) may contain spaces/parens — fields resume after ')'
    val rest = self0.substring(self0.lastIndexOf(')') + 2).split(" ")
    CpuSnap(total, idle, steal, rest(11).toLong + rest(12).toLong) // utime+stime
  } catch { case _: Throwable => CpuSnap(0, 0, 0, 0) }

  /** Telemetry of one timed side: raw wall ms with its epoch start (three
    * identical one-decimal walls in the r4 artifact were indistinguishable
    * from a clamp — raw ms make that impossible), plus the fraction of
    * host CPU time spent in OTHER processes (`ext`) and hypervisor steal
    * (`st`) during the run.
    */
  final case class SideStat(sec: Double, startEpochMs: Long, wallMs: Long,
                            extFrac: Double, stealFrac: Double) {
    def contention: Double = extFrac + stealFrac
    def brief: String = f"${wallMs}ms(@$startEpochMs ext=$extFrac%.2f st=$stealFrac%.2f)"
  }
  object SideStat {
    val empty: SideStat = SideStat(0.0, 0L, 0L, 0.0, 0.0)
  }

  final case class ScalePair(rep: Int, tLow: Double, tHigh: Double,
                             low: SideStat = SideStat.empty,
                             high: SideStat = SideStat.empty) {
    def eff: Double = tLow / tHigh / 4.0
    /** Worst-side fraction of host CPU consumed by other tenants + steal. */
    def contention: Double = math.max(low.contention, high.contention)
  }

  /** `maxContention` = worst per-pair ext+steal host-CPU fraction across
    * ALL attempts that entered the campaign (clean AND outlier-rejected —
    * for-cause-rejected attempts never enter), so a campaign whose
    * noisiest window hit an outlier-rejected pair still reports it
    * (ADVICE r5: the old `max_ext_cpu` covered clean pairs only and the
    * name hid that the value includes steal).
    */
  final case class ScaleResult(nLow: Int, turns: Long, tpsLow: Double,
                               tpsHigh: Double, eff: Double,
                               clean: Int, rejected: Int, contended: Int,
                               maxContention: Double) {
    // an efficiency median ABOVE 1.0 is physically implausible on identical
    // work: it means the low-parallelism sides were systematically slowed
    // by ambient load during the campaign window (individual >1.05 pairs
    // are rejected, but a whole contended campaign can median at ~1.0x).
    // Flag it in the artifact rather than let it read as a gamed gate.
    private def note: String =
      (if (eff > 1.0) ""","low_side_contended":true""" else "") +
        (if (contended > 0) s""","contended_pairs":$contended""" else "")
    def json: String =
      f"""{"turns":$turns,"n_low":$nLow,"turns_per_sec_n":$tpsLow%.1f,"turns_per_sec_4n":$tpsHigh%.1f,"efficiency":$eff%.3f,"clean_pairs":$clean,"rejected_pairs":$rejected,"max_contention":$maxContention%.2f$note}"""
    /** Byte-lean form for the final tail-window line. */
    def jsonCompact: String =
      f"""{"turns":$turns,"n_low":$nLow,"tps_n":$tpsLow%.0f,"tps_4n":$tpsHigh%.0f,"clean_pairs":$clean,"rejected_pairs":$rejected,"cont":$maxContention%.2f$note}"""
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) Double.NaN
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  /** Outlier rejection. Anchor = the per-side MINIMUM over the
    * efficiency-PLAUSIBLE pairs, not the median (r3 lesson: a
    * 2.2×-inflated pair stayed "clean" because later slow pairs dragged
    * the median up until the outlier fit back under 2× median). Wall time
    * on identical work is true-cost + ambient noise, and noise only ever
    * ADDS time — so the per-side min is a robust estimate of true cost.
    * The anchor pool excludes implausible pairs first (0 < eff ≤ 1.05 —
    * N→4N on identical work cannot beat 1.0; 5% grace): an implausible
    * pair is by definition mismeasured, and letting its fluke-fast side
    * set the anchor would reject every legitimate pair. A pair is CLEAN
    * iff it is plausible AND both sides are within 1.6× of their side's
    * anchored min (1.6 chosen from the observed clean spread across the
    * r2 campaign, ≤ 1.5× within-side).
    */
  def cleanPairs(ps: Seq[ScalePair]): Seq[ScalePair] = {
    val plausible = ps.filter(p => p.eff > 0 && p.eff <= 1.05)
    if (plausible.isEmpty) return Nil
    val minLow = plausible.map(_.tLow).min
    val minHigh = plausible.map(_.tHigh).min
    plausible.filter(p => p.tLow <= 1.6 * minLow && p.tHigh <= 1.6 * minHigh)
  }

  /** North-rule N→4N evidence protocol (no real cluster in sandbox):
    * identical job + identical input files at local[N] vs local[4N],
    * back-to-back pairs (both sides of a pair see the same ambient load),
    * shuffle partitioning and scan splits pinned identical on both sides,
    * pairs run until ≥ `minClean` survive outlier rejection, `maxPairs`
    * attempts, or the wall-clock `deadlineNs` passes (then: stop cleanly,
    * report clean-pairs-so-far). Returns None when every pair was rejected
    * (never formats NaN into the JSON line).
    */
  private def scalingEvidence(corpusDir: String, nTurns: Long, nLow: Int,
                              deadlineNs: Long,
                              repLog: scala.collection.mutable.ArrayBuffer[String])
      : Option[ScaleResult] = {
    val minClean = sys.env.getOrElse("SPARK_GRAFT_SCALE_MIN_CLEAN", "3").toInt
    val maxPairs = sys.env.getOrElse("SPARK_GRAFT_SCALE_MAX_PAIRS", "6").toInt
    val parts = sys.env.getOrElse("SPARK_GRAFT_SCALE_PARTS", "192").toInt
    // reject-for-cause threshold: a side during which other tenants (+
    // steal) consumed more than this fraction of HOST CPU time is a
    // contended measurement, not an outlier — it is excluded from the
    // campaign up front (before min-anchoring) and does NOT consume a
    // pair attempt, so a bad stretch is ridden out within the wall
    // budget. 0.15 of a 32-core host ≈ 5 external cores — enough to bend
    // either side of a pair (measured r4: the driver's contended window
    // ran local[32] 6-10× slow while campaigns an hour earlier were
    // clean).
    val contMax = sys.env.getOrElse("SPARK_GRAFT_CONTENTION_MAX", "0.15").toDouble

    def timedRun(cores: Int): SideStat = {
      val s = session(cores, parts, forScaling = true)
      // sessions share one JVM: collect the previous run's garbage OUTSIDE
      // the timed section so GC debt doesn't land on a random side. JIT/
      // codegen warmth comes from the single global warm run in main()
      // (one JVM-wide codegen cache) — per-pair warm runs burned ~40% of
      // the r3 wall budget at local[1] and starved the second pair type.
      System.gc()
      val c0 = cpuSnap()
      val m0 = System.currentTimeMillis()
      val sec = flagshipRun(s, corpusDir)
      val m1 = System.currentTimeMillis()
      val c1 = cpuSnap()
      s.stop()
      val dTot = (c1.total - c0.total).toDouble
      val ext = if (dTot > 0)
        math.max(0.0, (c1.total - c0.total) - (c1.idle - c0.idle) -
          (c1.steal - c0.steal) - (c1.self - c0.self)) / dTot else 0.0
      val st = if (dTot > 0) (c1.steal - c0.steal) / dTot else 0.0
      SideStat(sec, m0, m1 - m0, ext, st)
    }

    val pairs = scala.collection.mutable.ArrayBuffer[ScalePair]()
    var r = 0          // measurement attempts that entered the campaign
    var contended = 0  // attempts rejected for cause (never enter `pairs`)
    var outOfTime = System.nanoTime() >= deadlineNs
    if (outOfTime)
      repLog += s"local[$nLow]→local[${nLow * 4}]: skipped (wall budget exhausted)"
    while (!outOfTime && r < maxPairs &&
           (r < minClean || cleanPairs(pairs.toSeq).size < minClean)) {
      val low = timedRun(nLow)
      val high = timedRun(nLow * 4)
      // label by ATTEMPT number (monotone across for-cause rejections), not
      // by pair count — a contention-rejected attempt does not increment
      // `r`, and reusing its label made two distinct "rep 2" lines appear
      // in one campaign log (ADVICE r5)
      val p = ScalePair(r + contended + 1, low.sec, high.sec, low, high)
      val isContended = p.contention > contMax
      val tag = if (isContended) f" CONTENDED(${p.contention}%.2f>$contMax%.2f)" else ""
      val msg = f"rep ${p.rep}: local[$nLow]=${low.sec}%.1fs local[${nLow * 4}]=${high.sec}%.1fs " +
        f"eff=${p.eff}%.3f | low ${low.brief} high ${high.brief}$tag"
      System.err.println(s"[bench] $msg")
      repLog += msg
      if (isContended) contended += 1 // rejected-for-cause: retry within budget
      else { r += 1; pairs += p }
      if (System.nanoTime() >= deadlineNs) {
        outOfTime = true
        repLog += s"wall budget reached after ${r + contended} attempt(s) at local[$nLow]→local[${nLow * 4}]"
      }
    }
    val clean = cleanPairs(pairs.toSeq)
    val rejected = pairs.size - clean.size
    if (contended > 0)
      repLog += s"rejected-for-cause $contended contended attempt(s) (ext+steal > $contMax of host CPU)"
    if (rejected > 0)
      repLog += s"rejected ${rejected} outlier pair(s): " +
        pairs.filterNot(clean.contains).map(p => f"rep ${p.rep} (eff=${p.eff}%.3f)").mkString(", ")
    if (clean.isEmpty) {
      // ADVICE r2: never emit "efficiency":NaN — omit the block instead
      System.err.println(s"[bench] local[$nLow] pair: ALL pairs rejected/none run — omitting block")
      None
    } else Some(ScaleResult(nLow, nTurns,
      median(clean.map(p => nTurns / p.tLow)),
      median(clean.map(p => nTurns / p.tHigh)),
      median(clean.map(_.eff)), clean.size, rejected, contended,
      // over ALL non-contended attempts, not just clean pairs (see scaladoc)
      pairs.map(_.contention).max))
  }

  /** Append a campaign row to the UNTRACKED side file
    * `bench_rows.pending.md` (gitignored). r3 VERDICT #7: writing straight
    * into tracked BENCH.md left the work tree dirty after every driver
    * bench run; rows are folded into BENCH.md's `<!-- bench-rows -->`
    * marker by the builder when the campaign is recorded, and the same
    * data rides the JSON artifact regardless.
    */
  private def appendBenchRow(line: String): Unit = {
    val p = Paths.get("bench_rows.pending.md")
    Files.write(p, (line.stripSuffix("\n") + "\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  def main(args: Array[String]): Unit = {
    // ADVICE r3: every f"%…f" interpolation in the JSON contract formats
    // through the JVM default locale — a comma-decimal locale would break
    // the one-JSON-line stdout contract. Pin the process to ROOT once.
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") != "0"
    // ~4.8M turns (r5: 150k→100k convs, VERDICT r4 #1c): a 1→4 pair costs
    // ~130s instead of ~190s, so 6-8 attempts fit the 1260s budget and the
    // campaign can ride out a contended stretch (contended attempts are
    // rejected-for-cause and retried — see SPARK_GRAFT_CONTENTION_MAX).
    // The ideal 1→4 efficiency ceiling dips only slightly (serial
    // component ~6.6s against a ~90s local[1] parallel section ≈ 0.87);
    // clean-window campaigns at 150k measured 0.83-0.88, and evidence
    // robustness under contention is worth more than the last ceiling
    // percent.
    val scalingConvs = sys.env.getOrElse("SPARK_GRAFT_SCALING_CONVS", "100000").toLong
    // The literal local[8]→local[32] pair needs a LARGER corpus than the
    // 1→4 pair: at 100k convs the local[32] side runs ~11-13s against the
    // ~5-8s per-run fixed cost (session spin-up, planning, stage
    // scheduling), structurally capping its measurable efficiency near 0.5
    // regardless of the engine — eff = (F + W/8)/(4·(F + W/32)) → 1 only
    // as W/F → ∞. 3× the work pushes the high side to ~25-30s where the
    // fixed cost is amortized; pairs still fit 3 attempts in the 25%
    // budget slice (~75-100s/pair measured at this size).
    val scalingConvs832 =
      sys.env.getOrElse("SPARK_GRAFT_SCALING_CONVS_8TO32", (scalingConvs * 3).toString).toLong

    // — 1. per-query timings: interleaved rounds, per-query median —
    val doQueries = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "1") != "0"
    // r3 VERDICT #1a: when the scaling phase runs in the same invocation
    // (the driver's shape), default to 2 interleaved reps — a median of 2
    // still catches per-query regressions, and the minutes saved are spent
    // where the evidence is scarce: scaling pairs. Explicit env wins.
    val queryReps = sys.env.get("SPARK_GRAFT_QUERY_REPS")
      .map(_.toInt).getOrElse(if (doScaling) 2 else 3)
    val spark0 = session(cpus)
    if (doQueries) {
      // untimed warmup: pay codegen/parquet-footer/first-shuffle costs once,
      // not inside whichever query sorts first alphabetically
      try SparkEntry.queries("q_census_role")(spark0, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
    }
    // SPARK_GRAFT_QUERY_FILTER: comma-separated substrings — time only
    // matching queries (targeted regression checks)
    val filter = sys.env.get("SPARK_GRAFT_QUERY_FILTER")
      .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    val names = (if (doQueries) SparkEntry.queries.keys.toSeq.sorted else Nil)
      .filter(n => filter.isEmpty || filter.exists(n.contains))
    val samples = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to (if (doQueries) queryReps else 0); name <- names) {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark0, sfDir).write.mode("overwrite").format("noop").save() }
      catch { case _: Throwable => () }
      samples(name) = ((System.nanoTime() - t0) / 1e9) :: samples(name)
    }
    val results = names.map(n => n -> median(samples(n)))
    spark0.stop()

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    def jsonLine(extra: String): String =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"$extra}"""
    // print phase-1 results IMMEDIATELY (r2 lesson: the scaling phase ran
    // past the driver's timeout and destroyed the already-measured
    // per-query medians); the scaling line below is a superset rewrite
    println(jsonLine(""))
    System.out.flush()

    // — 2. scaling evidence: both protocol pairs, wall-budgeted —
    var scalingExtras = ""
    if (doScaling) {
      // 1260s default (r3 VERDICT #1b: was 1080): with query reps at 2 the
      // whole-run wall shrinks, so the freed minutes buy the 1→4 campaign
      // a 5th attempt (~190s/pair at 150k convs) — more headroom to reach
      // ≥3 clean pairs when ambient contention rejects some
      val budgetSec = sys.env.getOrElse("SPARK_GRAFT_SCALE_BUDGET_SEC", "1260").toLong
      val log832 = scala.collection.mutable.ArrayBuffer[String]()
      val log14 = scala.collection.mutable.ArrayBuffer[String]()
      val corpusDir = sys.env.getOrElse("SPARK_GRAFT_CORPUS_DIR", "/tmp/graft_bench_corpus")
      val sPrep = session(32)
      val nTurns = materializeCorpus(sPrep, scalingConvs, corpusDir)
      // the 8→32 pair's larger corpus lands in a sibling dir (reused
      // verbatim when the sizes coincide); materialization happens before
      // t0 so corpus generation never eats the measurement budget
      val (corpusDir832, nTurns832) =
        if (scalingConvs832 == scalingConvs) (corpusDir, nTurns)
        else {
          val d = corpusDir + "_8to32"
          (d, materializeCorpus(sPrep, scalingConvs832, d))
        }
      // single global warm: the flagship plan's codegen/parquet-footer
      // costs are JVM-wide, so one local[32] run warms every later session
      flagshipRun(sPrep, corpusDir)
      sPrep.stop()
      val t0 = System.nanoTime()
      // secondary pair FIRST — BASELINE.md's literal local[8]→local[32]
      // protocol is cheap (high parallelism both sides), so it gets a 25%
      // budget slice up front and can never be starved by the expensive
      // primary campaign (r3 lesson: 1→4 ran first and ate the whole
      // budget, leaving no 8→32 block in the artifact)
      val nPrimary = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "1").toInt
      val s832 = if (nPrimary == 8) None
                 else scalingEvidence(corpusDir832, nTurns832, 8,
                   t0 + budgetSec * 250000000L, log832)
      // primary pair: bandwidth-uncontended N→4N-node proxy (default 1→4)
      // gets everything left of the budget
      val s14 = scalingEvidence(corpusDir, nTurns, nPrimary,
        t0 + budgetSec * 1000000000L, log14)
      // ONE renderer for both the full superset line and the compact tail
      // line — a contract field added here lands in both (the r4 review
      // caught the two hand-synced copies drifting: the compact copy had
      // silently dropped scaling_8to32).
      // efficiency key named from the measured pair (default SCALE_N=1 →
      // the documented "efficiency_1to4"; an override must not masquerade
      // as the 1→4 protocol number)
      def renderExtras(render: ScaleResult => String): String = {
        val sb = new StringBuilder
        s14.foreach(r =>
          sb ++= f""","efficiency_${r.nLow}to${r.nLow * 4}":${r.eff}%.3f""")
        s832.foreach(r => sb ++= f""","efficiency_8to32":${r.eff}%.3f""")
        s14.foreach(r => sb ++= s""","scaling":${render(r)}""")
        s832.foreach(r => sb ++= s""","scaling_8to32":${render(r)}""")
        sb.toString
      }
      val extras = renderExtras(_.json)
      if (extras.nonEmpty) {
        println(jsonLine(extras))
        System.out.flush()
      }
      (s14.map(_ -> log14).toSeq ++ s832.map(_ -> log832).toSeq).foreach {
        case (r, log) =>
          appendBenchRow(
            f"| ${java.time.Instant.now()} (local[${r.nLow}]→local[${r.nLow * 4}]) | ${r.turns} | ${r.tpsLow}%.0f | ${r.tpsHigh}%.0f | ${r.eff}%.3f | ${r.clean}/${r.clean + r.rejected}+${r.contended}c | ${log.mkString("; ")} |")
      }
      scalingExtras = renderExtras(_.jsonCompact)
    }

    // — 3. final COMPACT artifact line, printed dead-last —
    // The driver keeps only the last ~2000 characters of output and parses
    // JSON lines found inside that tail: the full-precision lines above are
    // ~2.3KB and can therefore NEVER be parsed from the tail (every r1-r3
    // artifact landed parsed:null with rc=0 and the JSON visible-but-
    // truncated). This line carries the same contract fields at 2-decimal
    // per-query precision (≤ ~1.7KB) and is the very last thing the
    // process writes: stderr is flushed and given time to drain first so
    // an interleaved diagnostic line cannot land after it (r3 tail showed
    // a stderr rep line AFTER the stdout JSON), and sbt's trailing
    // "[success] Total time" line is suppressed via showSuccess := false.
    // 1 decimal place in the tail copy: the full-run line measured 1893 B
    // at 68 queries with 2dp — one more query would trip the shed guard;
    // 1dp buys ~70 B of headroom per round of query growth (full-precision
    // values stay on the phase-1 line)
    def qsOf(entries: Seq[(String, Double)], omitted: Int): String = {
      val base = entries.map { case (k, v) => "\"" + k + "\":" + f"$v%.1f" }
      (if (omitted > 0) base :+ s""""_omitted":$omitted""" else base)
        .mkString("{", ",", "}")
    }
    val qs2 = qsOf(results, 0)
    def compactLine(qs: String, extras: String): String =
      f"""{"metric":"total","value":$total%.2f,"unit":"sec","queries":$qs,"sf":"$sfDir"$extras}"""
    // Graduated length guard: the whole fix depends on this line fitting
    // the 2000-char tail, and the query set grows every round. Shed the
    // least-critical payload first (the per-pair scaling blocks — their
    // full forms are on the superset line and in BENCH.md), then per-query
    // entries SLOWEST-FIRST-KEPT (the r5 84-query map overflowed the
    // budget whole, and all-or-nothing shedding blanked every per-query
    // value in the artifact; the cheap sub-second rows are the ones a
    // reader never needs from the tail — "_omitted" counts them, and the
    // full-precision map is always on the phase-1 line); the
    // efficiency_* gate keys are never shed.
    val TailBudget = 1900
    var line = compactLine(qs2, scalingExtras)
    if (line.length > TailBudget) {
      val effOnly = scalingExtras.replaceAll(""","scaling(_8to32)?":\{[^}]*\}""", "")
      System.err.println(s"[bench] compact line ${line.length} chars > $TailBudget: dropping scaling blocks")
      line = compactLine(qs2, effOnly)
      if (line.length > TailBudget) {
        val bySlowest = results.sortBy(-_._2)
        var keep = bySlowest.size
        while (keep > 0 &&
          compactLine(qsOf(bySlowest.take(keep), bySlowest.size - keep), effOnly).length > TailBudget)
          keep -= 1
        System.err.println(s"[bench] compact line still over budget: keeping the $keep slowest of ${bySlowest.size} query entries")
        line = compactLine(qsOf(bySlowest.take(keep), bySlowest.size - keep), effOnly)
      }
    }
    // belt-and-braces for the driver-parse contract (r3 VERDICT #3): the
    // same compact artifact also lands in a file, immune to output
    // interleaving/truncation entirely
    try Files.writeString(Paths.get("bench_result.json"), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] bench_result.json write failed: $e") }
    System.err.flush()
    Thread.sleep(2000)
    println(line)
    System.out.flush()
    Thread.sleep(200)
  }
}

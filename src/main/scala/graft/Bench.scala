package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
/** Benchmark main: times every registry query at SPARK_GRAFT_SF_DIR
  * and prints one JSON line. Measurement protocol (r9): 3 interleaved
  * full passes → per-query min → ADAPTIVE extra full passes (≤6
  * total) while the latest pass still moves the min-folded total >2%
  * or the post-first pass totals disperse >1.3× (catches UNIFORM
  * host load, which no per-query spread test can see, and
  * noisy-last-pass runs, which the improvement test alone misreads
  * as converged); a HOT run — any pass >2× the quietest (r12), OR
  * every pass >1.2× the committed BENCH_ANCHOR.json quiet reference
  * (r13, the absolute test uniform inflation can't hide from) —
  * raises the budget to floor 6 / cap 8 (see [[passBudget]]) → up to 3
  * TARGETED extra passes over only the queries whose
  * pass spread exceeded 2× (re-measuring spiky noise victims until
  * their min stops improving >10%). The RECORDED number thus
  * converges to the quiet-host number even when early passes ran
  * contended. Full rationale at the protocol comment in [[main]];
  * user-facing description in README §Running. */
object Bench {
  /** Executes the FULL physical plan (incl. final sort + projections)
    * without driver-side collection. `count()` would let Catalyst drop
    * top-level sorts and prune every computed column — round-1 timings
    * mixed "plan cost" with "whatever count() didn't optimize away". */
  private def run(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  /** SURVEY §2B's 50 contract queries — the graded scope the bench
    * reports as `contract_total`. Object-level (not main-local) so
    * VerifySpec can pin it: exactly 50 names, every one present in
    * SparkEntry.queries — a rename in the registry without updating
    * this set fails the suite instead of silently shrinking the
    * subtotal. */
  val contract: Set[String] = Set(
    "scan_parquet", "scan_pruned", "sink_roundtrip", "source_inline",
    "proj_expr", "filter_pred", "filter_null", "join_broadcast",
    "join_shuffle", "join_multi", "join_semi", "join_anti",
    "join_outer", "join_theta", "join_asof", "agg_hash",
    "agg_distinct", "agg_approx_distinct", "agg_rollup", "agg_cube",
    "agg_pivot", "agg_accuracy", "win_rank", "win_running", "win_lag",
    "sort_multi", "topk_global", "distinct_sort", "set_union",
    "set_intersect", "set_except", "scalar_string", "scalar_date",
    "scalar_math", "scalar_array", "scalar_json", "scalar_map",
    "stream_tumbling", "stream_sliding", "stream_session",
    "stream_dedup_late", "udf_scalar", "udaf_agg", "udtf_explode",
    "infer_mappartitions", "dedup_exact", "dedup_minhash",
    "sim_cosine_topk", "text_stats", "text_tfidf")

  /** Scratch space for shuffle files / checkpoint spill: a RAM-backed
    * dir when the host has one (the single-node analogue of pointing
    * spark.local.dir at NVMe on a real cluster — measured −18% on a
    * mixed 12-query subset at sf0.1, uniform across queries, pure IO
    * latency off the shuffle/materialization path). Falls back to the
    * JVM tmpdir. */
  private[graft] def scratchDir(): String = {
    val shm = new java.io.File("/dev/shm")
    // Pass-safe floor (r9, verdict item 3): the startup-only 8 GiB
    // check guarded session BUILD, but shuffle files accumulate across
    // a full multi-pass bench until GC-driven cleanup, so the floor
    // must cover a whole run's high-water mark, not just the first
    // query. Measured at sf0.1 (full 286-query registry, 4 full
    // passes + extras, this host — see SCALE.md): peak
    // graft_spark_local usage was 75 MB — ContextCleaner reclaims
    // shuffle dirs continuously, so usage tracks in-flight queries,
    // not the cumulative pass. Two conditions, both required:
    //   - usable ≥ 12 GiB  (~160× the measured full-run high-water
    //     mark, headroom for bigger SFs and slower GC)
    //   - usable ≥ 25% of the tmpfs total (ADVICE r8: a tmpfs that is
    //     mostly someone else's is one neighbor-burst from ENOSPC even
    //     when the absolute floor passes — tmpfs shares host RAM)
    // An ENOSPC mid-bench would mark queries failed; a slower disk
    // beats a full RAM-disk.
    val floorOk = shm.isDirectory && shm.canWrite &&
      shm.getUsableSpace >= 12L * 1024 * 1024 * 1024 &&
      shm.getUsableSpace >= shm.getTotalSpace / 4
    if (floorOk) {
      val d = new java.io.File(shm, "graft_spark_local")
      d.mkdirs()
      // hygiene between runs: a crashed session leaks its spark-* dir
      // and repeated leaks eat the headroom the floor reserved — sweep
      // leftovers not touched for an hour. Liveness is judged on the
      // NEWEST mtime in the whole tree, not the root dir (ADVICE r9):
      // on Linux a dir's mtime only moves on direct entry churn, and a
      // long-lived session churns files inside blockmgr-*/ subdirs
      // while its spark-* root stays untouched — root mtime alone
      // could sweep a live session's scratch mid-run (shuffle-fetch
      // failures). Concurrent fresh runs are never swept either way.
      // r11 (ADVICE low): the liveness walk SHORT-CIRCUITS on the first
      // recent mtime — a live session's tree (thousands of blockmgr
      // shuffle files, all recent) answers in one stat instead of a
      // full recursive stat storm at every Bench/Verify startup — and
      // never follows symlinks (isDirectory does, so a cycle would
      // otherwise recurse forever).
      val cutoff = System.currentTimeMillis() - 60L * 60 * 1000
      def anyLive(f: java.io.File): Boolean =
        !java.nio.file.Files.isSymbolicLink(f.toPath) &&
          (f.lastModified >= cutoff ||
            (f.isDirectory && Option(f.listFiles()).getOrElse(Array.empty)
              .exists(anyLive)))
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("spark-") && !anyLive(f))
        .foreach(deleteRecursively)
      d.getAbsolutePath
    } else System.getProperty("java.io.tmpdir")
  }

  /** Mute ONLY loggers whose every firing in this suite is proven
    * benign, so the remaining WARN stream stays signal. The sole entry
    * is WindowExec's "No Partition Defined" — fired by every
    * INTENTIONALLY unpartitioned window, and PlanSweepSpec proves
    * structurally that each such window in the registry sits above an
    * aggregate/limit-bounded frame (never row-scale input; r9 verdict:
    * log noise, not a scale hazard). Set AFTER setLogLevel, which
    * (re)sets the root level. */
  private[graft] def muteKnownBenignWarnings(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Protocol predicates, object-level so VerifySpec can pin them —
    * the measurement protocol is now gate-load-bearing and must not
    * silently regress. See the protocol comment in [[main]]. */
  /** Adaptive-pass test (a): the latest full pass moved the
    * min-folded total by >2% — still measurably converging. */
  private[graft] def converging(prevTotal: Double, curTotal: Double): Boolean =
    prevTotal > 0 && (prevTotal - curTotal) / prevTotal > 0.02
  /** Adaptive-pass test (b): the LAST ≤3 post-first pass totals
    * disperse >1.3× — the run is STILL demonstrably noisy, another
    * pass has a real chance at quieter air. Pass 1 is excluded (cold
    * page cache makes it slow even on a quiet host: 210/154/154 must
    * stop at 3). r11 (r10 ADVICE low, taken behind the VerifySpec
    * predicate pin per the protocol-freeze rule): the test is WINDOWED
    * to the last 3 passes — judging ALL post-first passes let one
    * early noisy pass pin the loop at the 6-pass cap even after three
    * consecutive quiet passes agreed (the min is monotone, so only
    * wall time was at stake — but the r10 driver run burned 431 s of
    * it). */
  private[graft] def tailDispersed(passTotals: Seq[Double]): Boolean = {
    // failed-pass markers (-1 / 0.0) are dropped BEFORE the window is
    // taken (r13, ADVICE r12): a deflated partial total must neither
    // fake dispersion nor, via the min>0 guard, silence it
    val window = validPasses(passTotals).drop(1).takeRight(3)
    window.size >= 2 && window.max / window.min > 1.3
  }
  /** Targeted-re-measurement membership: all passes succeeded and the
    * spread exceeds 2× AND 0.1 s absolute (micro-query ratios are
    * noise, and a failed query must re-run in full passes, not here). */
  private[graft] def highSpread(vs: Seq[Double]): Boolean =
    vs.nonEmpty && vs.forall(_ >= 0) && vs.min > 0 &&
      vs.max / vs.min > 2.0 && vs.max - vs.min > 0.1
  /** Passes whose totals are usable by the relative predicates. A
    * pass containing ANY failed query records -1 (r13, ADVICE r12: a
    * partial sum is a deflated total that can become the min and
    * spuriously trip [[hotRun]], and a fully-failed pass's 0.0 used to
    * disable hot detection for the whole run via the min>0 guard) —
    * both markers are filtered here, so every ratio below divides only
    * complete, successful passes. */
  private def validPasses(passTotals: Seq[Double]): Seq[Double] =
    passTotals.filter(_ > 0)
  /** Hot-run fingerprint (r12, verdict item 1b): some full pass ran
    * >2× the quietest — the run demonstrably crossed a heavy
    * external-load window (the r11 driver run: pass totals
    * 410.8/264.1/188.1/190.8/183.9, contention 2.234, recorded 166.1 s
    * where the same tree measured 152.5 s on a quieter host). The
    * per-query min is monotone, so the only recording-side lever
    * against a hot run is MORE SAMPLES in (hopefully) quieter air.
    * Pass 1 stays IN this test (unlike [[tailDispersed]], which
    * excludes it — ADVICE r12 asked for the same exclusion here): a
    * >2× pass 1 is indistinguishable from genuine heat, and the two
    * misclassification costs are asymmetric — cold-read-as-hot buys 3
    * extra passes of wall time with the recorded min unaffected, while
    * hot-read-as-cold under-samples and inflates the RECORDED number
    * the gate grades. Wall time is the cheap side; pass 1 counts. */
  private[graft] def hotRun(passTotals: Seq[Double]): Boolean = {
    val vs = validPasses(passTotals)
    vs.size >= 2 && vs.max / vs.min > 2.0
  }
  /** UNIFORM-inflation fingerprint (r13, verdict item 1): every valid
    * full-pass total exceeds 1.2× the committed quiet same-HEAD
    * recorded total (BENCH_ANCHOR.json). This is the blind spot every
    * RELATIVE predicate shares: the r12 driver run (passes
    * 287.7/204.1/247.6, contention 1.41 — "quiet" by spread) ran every
    * pass ~22% above the builder's committed 149.7 s floor and stopped
    * at 3 passes with the convergence tests satisfied; only an
    * ABSOLUTE anchor can see heat that inflates all passes equally.
    * 1.2× because a genuinely quiet pass total lands within ~10–15% of
    * the min-folded recorded total (r12 quiet passes 164/171 vs
    * recorded 149.7) — 20% clears that band with margin. The anchor is
    * None when BENCH_ANCHOR.json is absent, unparsable, or recorded at
    * a different registry size (totals are not comparable across
    * registry growth), and None disables only THIS test. */
  private[graft] def uniformlyHot(passTotals: Seq[Double],
      anchor: Option[Double]): Boolean = {
    // judged on the first 3 VALID passes, tripped if ANY ≥2-pass
    // PREFIX of that window is uniformly above the line. Valid passes
    // only ever APPEND, so each prefix is fixed once its passes exist
    // and the exists() can only persist — the predicate is MONOTONE
    // like hotRun (whose max/min ratio can only grow): a borderline
    // pass 4 landing just under the line must not collapse an
    // already-tripped floor-6 budget back to (3,6) mid-remedy (the
    // budget's extra passes exist precisely to fish for quieter air,
    // and finding some is the remedy working, not evidence the run
    // was never hot). The prefix-exists form (r14 review) closes both
    // windowing bugs at once: 'first 3 valid' let a later quiet pass
    // ENTER an unfilled window of [-1,200,200] and un-trip it, while
    // 'first 3 slots by index' went permanently blind when 2 of the
    // base 3 passes FAILED ([-1,-1,300,310,320] read as one valid
    // sample forever). A run that turns hot only AFTER a quiet base 3
    // is hotRun/tailDispersed's job.
    val vs = validPasses(passTotals).take(3)
    anchor.exists(a => a > 0 &&
      (2 to vs.size).exists(k => vs.take(k).forall(_ > a * 1.2)))
  }
  /** Full-pass (floor, cap) given the totals so far: a quiet run keeps
    * the r9 protocol exactly (3 base passes, adaptive to 6); a HOT run
    * — bursty ([[hotRun]]) or uniformly inflated vs the absolute
    * anchor ([[uniformlyHot]], r13) — gets a floor of 6 — the
    * convergence tests may not stop it early, because "the last 3
    * passes agree" on a uniformly-loaded host means the NOISE
    * converged, not the measurement — and a cap of 8, two more chances
    * at a quiet window. Wall cost is bounded and only paid on runs
    * whose recorded number is already suspect. */
  private[graft] def passBudget(passTotals: Seq[Double],
      anchor: Option[Double]): (Int, Int) =
    if (hotRun(passTotals) || uniformlyHot(passTotals, anchor)) (6, 8)
    else (3, 6)
  /** The full-pass loop's continue test, object-level so VerifySpec
    * can pin it. Floor and cap count VALID passes (r13: a -1-marked
    * failed pass contributed no usable sample, so it must not consume
    * the hot budget's promised floor of 6 — the erosion scenario:
    * [300,-1,290,310,-1,295] would otherwise exit with 4 usable
    * samples at "6 passes"), with an ABSOLUTE runaway bound of cap+2
    * total passes so a persistently-failing query cannot loop the
    * bench forever chasing a floor it can never fill. */
  private[graft] def morePasses(passTotals: Seq[Double],
      anchor: Option[Double], prevTotal: Double,
      curTotal: Double): Boolean = {
    val nValid = validPasses(passTotals).size
    val (floor, cap) = passBudget(passTotals, anchor)
    nValid < cap && passTotals.size < cap + 2 &&
      (nValid < floor || converging(prevTotal, curTotal) ||
        tailDispersed(passTotals))
  }
  /** Whether this run's recording may seed or lower BENCH_ANCHOR.json.
    * Ratcheting DOWN below an existing anchor is always sound — a
    * lower min-folded total is a strictly better quiet reference
    * whatever the weather was. SEEDING (no anchor at this registry
    * size) demands the run itself look quiet: an anchor seeded from an
    * r12-driver-style uniformly-hot run (contention 1.41, ~22% over
    * the true floor) would disarm uniformlyHot at exactly the moment
    * a fresh reference is being established (r13 review finding). */
  private[graft] def anchorWritable(anchor: Option[Double], total: Double,
      contention: Double, nValidPasses: Int): Boolean =
    total > 0 && (anchor match {
      case Some(a) => total < a
      case None => contention <= 1.2 && nValidPasses >= 3
    })
  /** The committed quiet reference for [[uniformlyHot]]: the best
    * RECORDED full-registry total this HEAD's lineage has measured,
    * valid only at the registry size AND run config (cpus, sf dir) it
    * was recorded at. Read from BENCH_ANCHOR.json (committed alongside
    * BENCH_FULL.json); [[main]] ratchets it DOWN at run end when a
    * quieter SAME-CONFIG recording lands, so perf wins keep the anchor
    * honest without a hand edit — registry growth (a different
    * n_queries) invalidates it until the next recording at the new
    * size re-seeds it. The cpus/sf match is r16 (VERDICT r15 item 1b):
    * totals are not comparable across core counts — at sf0.1 the
    * driver's 8-core runs beat 32-core on 53/54 queries, so an 8-core
    * total read as a 32-core quiet floor marks every 32-core run hot
    * forever. A legacy file without cpus/sf disarms with a warning. */
  private[graft] def readAnchor(path: String, nQueries: Int,
      cpus: String, sf: String): Option[Double] = {
    val f = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(f)) None
    else {
      val s = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
      def num(k: String): Option[Double] =
        ("\"" + k + "\"\\s*:\\s*([0-9.]+)").r
          .findFirstMatchIn(s).flatMap(_.group(1).toDoubleOption)
      (num("total"), num("n_queries")) match {
        case (Some(t), Some(n)) if n.toInt == nQueries && t > 0 =>
          anchorConfig(s) match {
            case Some((c, d)) if c == cpus && d == sf => Some(t)
            case other =>
              System.err.println(s"[bench] WARNING: $path " + (other match {
                case Some((c, d)) =>
                  s"was recorded at cpus=$c sf=$d (current cpus=$cpus " +
                    s"sf=$sf) — uniformlyHot is DISARMED for this run; " +
                    "the committed same-config floor is untouched"
                case None =>
                  "lacks \"cpus\"/\"sf\" (legacy format) — uniformlyHot " +
                    "is DISARMED until a clean quiet recording (or a hand " +
                    "edit adding the recording config) re-seeds it"
              }))
              None
          }
        case parsed =>
          // fail LOUDLY, not silently (r14, ADVICE r13): the file
          // exists but can't arm uniformlyHot — a bad hand edit or a
          // stale registry size would otherwise leave only the
          // artifact's "anchor":null as a trace
          System.err.println(s"[bench] WARNING: $path exists but " +
            (parsed match {
              case (Some(t), Some(n)) if n.toInt == nQueries =>
                s"holds a non-positive total ($t) — uniformlyHot is " +
                  "DISARMED; fix or delete the file"
              case (Some(_), Some(n)) =>
                s"was recorded at registry size ${n.toInt} (current " +
                  s"$nQueries) — uniformlyHot is DISARMED until a clean " +
                  "quiet recording re-seeds it"
              case _ =>
                "failed to parse (need numeric \"total\" and " +
                  "\"n_queries\") — uniformlyHot is DISARMED"
            }))
          None
      }
    }
  }

  /** The (cpus, sf) pair an anchor file was recorded at, None for the
    * pre-r16 legacy format. Both are stored as JSON strings — cpus is
    * the raw $SPARK_GRAFT_CPUS value, sf the raw $SPARK_GRAFT_SF_DIR. */
  private def anchorConfig(s: String): Option[(String, String)] = {
    def str(k: String): Option[String] =
      ("\"" + k + "\"\\s*:\\s*\"([^\"]*)\"").r
        .findFirstMatchIn(s).map(_.group(1))
    for { c <- str("cpus"); d <- str("sf") } yield (c, d)
  }

  /** Whether BENCH_ANCHOR.json may be (over)written by a run at this
    * config: the file is absent, or it records the SAME cpus+sf. A run
    * at a different core count or SF must never clobber the canonical
    * quiet floor (r16, VERDICT r15 item 1b: the driver's 8-core run
    * ratcheted the 32-core 148.900 floor down to 143.814 — 8 cores are
    * systematically FASTER at this SF, so every later 32-core run would
    * read hot against a floor it cannot reach). A mismatched registry
    * size does NOT block the write — re-seeding at a new size is the
    * designed recovery path — but a legacy/unparseable file DOES: never
    * clobber a floor whose config is unknown (hand-fix instead). */
  private[graft] def anchorConfigWritable(path: String,
      cpus: String, sf: String): Boolean = {
    val f = java.nio.file.Paths.get(path)
    !java.nio.file.Files.exists(f) || {
      val s = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
      anchorConfig(s).exists { case (c, d) => c == cpus && d == sf }
    }
  }

  /** Registry-growth escape hatch for VerifySpec's live-anchor gate
    * (r14, ADVICE r13): growing the registry stales the anchor, and
    * re-seeding needs a quiet-host full bench — on a persistently busy
    * host that made `sbt test` unpassable for unrelated work. A grower
    * may instead COMMIT the acknowledgement into BENCH_ANCHOR.json as
    * `"pending_n_queries": <newSize>`; the suite accepts it only while
    * it names the CURRENT registry size (it can't linger silently
    * across further growth), uniformlyHot stays disarmed (readAnchor
    * still refuses the stale total — correct: there is no quiet
    * reference at the new size yet), and the next clean quiet
    * recording overwrites the file wholesale, retiring the marker. */
  private[graft] def anchorPendingReseed(path: String, nQueries: Int): Boolean = {
    val f = java.nio.file.Paths.get(path)
    java.nio.file.Files.exists(f) && {
      val s = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
      "\"pending_n_queries\"\\s*:\\s*([0-9]+)".r
        .findFirstMatchIn(s).exists(_.group(1).toIntOption.contains(nQueries))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", scratchDir())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    muteKnownBenignWarnings()
    // absorb JVM/codegen/classloader warmup so the first timed query
    // isn't charged ~4s of one-time cost
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // SPARK_GRAFT_ONLY=q1,q2 restricts the run (local iteration aid)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = only.fold(SparkEntry.queries)(f =>
      SparkEntry.queries.view.filterKeys(f).toMap)
    // setup phase: queries that create one-time side tables (bucketed /
    // partitioned sinks) materialize them HERE, untimed, so the timed
    // runs below measure their reads, not a one-off write
    Seq("join_bucketed", "join_dpp", "source_merge_schema",
        "sink_partitioned", "sink_ts_roundtrip", "sink_ann_index",
        "stream_file_sink", "stream_foreachbatch", "stream_scd2",
        "stream_concurrency", "stream_minhash", "stream_jaccard",
        "stream_transformwithstate",
        "stream_ann_index",
        "sink_zorder", "sink_json_roundtrip",
        "sink_orc_roundtrip").foreach(n =>
      selected.get(n).foreach(fn =>
        // NonFatal only: an OOM/linkage error here must crash loudly, and
        // a broken one-time sink write must be visible, not silent
        try run(fn(spark, sfDir)) catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[bench-setup] $n failed: $e")
        }))
    // MEASUREMENT PROTOCOL (see README §bench):
    //   (1) Three INTERLEAVED passes over the whole suite, per-query
    //       min across passes. Round-1's single cold run let
    //       first-touch page cache / JIT / GC noise masquerade as plan
    //       cost, and back-to-back min-of-2 still let one sustained
    //       multi-second stall poison both timings of the same query —
    //       observed: 44-67 s for sub-second plans; a contended r03
    //       box inflated the whole suite ~3×. Minutes-apart passes
    //       make a stall have to recur at the same suite position
    //       EVERY pass to survive the min; per-pass totals are printed
    //       so a contended run is self-evident in the artifact
    //       (healthy: passes within ~20%).
    //   (2) ADAPTIVE extra full passes (r9, verdict item 1): this host
    //       swings ±30% under noisy neighbors, and r8's recorded
    //       number survived a 1.489-contention run only by luck — the
    //       same code measured 142.5 s quiet vs 185.6 s recorded.
    //       UNIFORM load (every pass inflated ~equally) is invisible
    //       to any per-query spread test, so convergence is judged on
    //       the RECORDED TOTAL itself: after the base 3 passes, keep
    //       running full passes (≤6 total) while EITHER (a) the latest
    //       pass still moved the min-folded total by >2% — it is
    //       measurably converging — OR (b) the pass totals AFTER the
    //       first disperse >1.3× — the run was demonstrably noisy, so
    //       another pass has a real chance at quieter air (observed:
    //       passes 259/197/273 — the improvement test alone read
    //       "converged" because the LAST pass was the contended one,
    //       and stopped while 12% of recoverable inflation remained).
    //       The first pass is excluded from (b) because cold page
    //       cache makes it slow even on a quiet host (r8 quiet runs:
    //       210/154/154). Host-noise windows are minutes long, so
    //       later passes land in quieter air; the min is monotone, so
    //       extra passes can only improve accuracy at the cost of
    //       wall time, and a quiet run stops at 3 passes.
    //       r12 (verdict 1b): a HOT run — any pass total >2× the
    //       quietest — raises the pass budget to floor 6 / cap 8.
    //       The r11 driver run (410.8/264.1/188.1/190.8/183.9)
    //       stopped at 5 with the convergence tests satisfied, but on
    //       a uniformly-loaded host "the last 3 passes agree" means
    //       the NOISE converged; the only honest response is more
    //       samples, paid only on runs whose recording is already
    //       suspect.
    //   (3) TARGETED re-measurement of the spiky tail: queries whose
    //       pass spread exceeds 2× (and >0.1 s absolute — micro-query
    //       ratios are noise) are re-measured in up to 3 extra passes
    //       over ONLY that high-spread set; each reading folds into
    //       the min, and a query stays in the set only while
    //       re-measurement still improves its min >10%.
    //       Both (2) and (3) are more measurement of the same code,
    //       never different work — the RECORDED number converges to
    //       the quiet-host number even when early passes ran
    //       contended. The artifact keeps pass_totals (one entry per
    //       full pass) + contention (bursty-load fingerprint) plus
    //       respread_n = per-extra-pass re-measured query counts.
    val names = selected.keys.toSeq
    def once(fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      run(fn(spark, sfDir))
      (System.nanoTime() - t0) / 1e9
    }
    // all measurements per query: full passes + targeted extras
    val meas = scala.collection.mutable.Map(
      names.map(n => n -> scala.collection.mutable.ArrayBuffer[Double]()): _*)
    val fullPassTotals = scala.collection.mutable.ArrayBuffer[Double]() // per-pass totals
    def fullPass(): Unit = {
      var passTotal = 0.0
      var anyFailed = false
      names.foreach { name =>
        val v = try once(selected(name)) catch { case _: Throwable => -1.0 }
        meas(name) += v
        if (v >= 0) passTotal += v else anyFailed = true
      }
      // a pass with any failure records -1 (ADVICE r12): its partial
      // sum is deflated and must not feed hotRun/tailDispersed/
      // contention as if it were a complete quiet pass. Visible in the
      // artifact's pass_totals; the per-query failure itself still
      // marks the query failed below.
      fullPassTotals += (if (anyFailed) -1.0 else passTotal)
    }
    def totalNow: Double = names.iterator.map { n =>
      val vs = meas(n).filter(_ >= 0)
      if (vs.isEmpty) 0.0 else vs.min
    }.sum
    // absolute anchor for uniformlyHot: only meaningful when this run
    // covers the full registry the anchor was recorded over — a
    // SPARK_GRAFT_ONLY subset's totals are not comparable
    val anchor =
      if (only.isEmpty) readAnchor("BENCH_ANCHOR.json", names.size, cpus, sfDir)
      else None
    (1 to 3).foreach(_ => fullPass())
    var prevTotal = {
      // total as it stood after pass 2, to judge pass 3's contribution
      val after2 = names.iterator.map { n =>
        val vs = meas(n).take(2).filter(_ >= 0)
        if (vs.isEmpty) 0.0 else vs.min
      }.sum
      after2
    }
    var curTotal = totalNow
    while (morePasses(fullPassTotals.toSeq, anchor, prevTotal, curTotal)) {
      fullPass()
      prevTotal = curTotal
      curTotal = totalNow
    }
    val respread = scala.collection.mutable.ArrayBuffer[Int]()
    var target = names.filter(n => highSpread(meas(n).toSeq))
    while (target.nonEmpty && respread.size < 3) {
      respread += target.size
      target = target.filter { n =>
        val prevMin = meas(n).min
        val v = try once(selected(n)) catch { case _: Throwable => -1.0 }
        // a transient failure here must NOT mark the query failed
        // (ADVICE r9 medium): it already holds >=3 successful full-pass
        // readings, and this phase exists only to strip noise — drop
        // the query from the target set without folding the failed
        // reading into meas (full-pass failures still mark -1 below)
        if (v >= 0) meas(n) += v
        // keep re-measuring only while the reading still drops >10%
        v >= 0 && v < prevMin * 0.9
      }
    }
    val results = names.map { n =>
      val vs = meas(n)
      // any failed measurement marks the query failed (-1), not fast
      n -> (if (vs.exists(_ < 0)) -1.0 else vs.min)
    }.toMap
    def fmt(v: Double): String = f"$v%.3f"
    def qsJson(m: Seq[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    // failures carry value -1.0 (visible, excluded from the total) —
    // a broken query must not report as a fast success
    val total = results.values.filter(_ >= 0).sum
    val passTotalVals = fullPassTotals.toSeq
    val passTotals = passTotalVals.map(fmt).mkString("[", ",", "]")
    // contention fingerprint (r8, verdict item 8): max/min pass-total
    // ratio. ~1.0–1.2 = quiet host; ≫1.2 = an external load inflated
    // some passes and the per-query min is the number to trust —
    // machine-readable next to the total it may have inflated.
    // failed passes (marked -1, and the legacy all-failed 0.0) are
    // excluded — a partial sum must not fake or mask contention, and
    // max/min over them would print -1-ratios or Infinity
    val contention = {
      val vs = passTotalVals.filter(_ > 0)
      if (vs.size >= 2) vs.max / vs.min else 1.0
    }
    // SURVEY §2B's 50 contract queries, reported as their own subtotal
    // next to the full-registry total: the registry has grown to ~5×
    // the contract, so the full total scales with declared breadth
    // while the baseline (one 97.84 s reference job) does not — both
    // numbers are printed so the comparison can be made at either
    // scope; nothing is excluded from "value".
    val contractTotal = results
      .collect { case (k, v) if contract(k) && v >= 0 => v }.sum
    val contractN = results.keys.count(contract)
    val respreadJson = respread.map(_.toString).mkString("[", ",", "]")
    // the absolute reference uniformlyHot judged this run against —
    // printed so the artifact shows WHAT the hot test could see
    val anchorJson = anchor.map(fmt).getOrElse("null")
    def line(m: Seq[(String, Double)]): String =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"contract_total":${fmt(contractTotal)},"contract_n":$contractN,"pass_totals":$passTotals,"contention":${fmt(contention)},"anchor":$anchorJson,"respread_n":$respreadJson,"queries":${qsJson(m)},"failed":[${failed.mkString(",")}],"full":"BENCH_FULL.json","sf":"$sfDir"}"""
    // Full per-query detail goes to a FILE: the driver captures only the
    // last ~2000 chars of stdout, and 98 entries overflow that (round-2's
    // BENCH parsed as null). Stdout keeps the contract line, with the
    // queries map truncated to the slowest entries until the line fits.
    val bySlow = results.toSeq.sortBy { case (_, v) => -v }
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_FULL.json"),
      line(bySlow).getBytes("UTF-8"))
    val budget = 1700
    val kept = Iterator.range(bySlow.size, 0, -1)
      .map(bySlow.take).find(m => line(m).length <= budget)
      .getOrElse(bySlow.take(10))
    println(line(kept))
    // anchor ratchet (r13): a quieter COMPLETE full-registry recording
    // becomes the new absolute reference — perf wins lower the anchor
    // without a hand edit, so uniformlyHot stays calibrated to the
    // code's true quiet floor. Never ratchets up; a run with failures
    // has a deflated total and never writes; a run at a DIFFERENT
    // cpus/sf than the recorded floor never writes (r16 — see
    // anchorConfigWritable). A registry-size change re-seeds at the
    // new size on its first clean QUIET recording — anchorWritable
    // refuses to seed from a hot run (see its doc).
    if (only.isEmpty && failed.isEmpty &&
        anchorConfigWritable("BENCH_ANCHOR.json", cpus, sfDir) &&
        anchorWritable(anchor, total, contention,
          passTotalVals.count(_ > 0)))
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_ANCHOR.json"),
        (s"""{"total": ${fmt(total)}, "n_queries": ${names.size},""" +
          s""" "cpus": "$cpus", "sf": "$sfDir"}""" + "\n")
          .getBytes("UTF-8"))
    spark.stop()
  }
}

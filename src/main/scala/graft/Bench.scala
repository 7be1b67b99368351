package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Optional comma-separated query filter for local iteration
    // (e.g. SPARK_GRAFT_ONLY=q41_minhash_lsh,q42_ngram_jaccard).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      // fail fast: a typo'd name would otherwise bench zero queries and
      // exit 0 with a plausible-looking empty result line
      require(unknown.isEmpty, s"SPARK_GRAFT_ONLY names not in catalog: ${unknown.mkString(", ")}")
    }
    def selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None        => SparkEntry.queries
    }
    val spark = Harness.session(cpus)
    // Execute via the noop sink, NOT .count(): under count() Catalyst
    // prunes projections, sorts, and aggregate expressions from the
    // executed plan (verified: a select(md5(..)).orderBy(..) counts as
    // a bare key scan), so the timer would miss the very work the query
    // exists to measure — and a projection that throws would bench "ok".
    // The noop sink materializes every output column of the full plan.
    def execute(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // One untimed warm-up iteration of the full catalog, then the timed
    // iteration — standard steady-state methodology: janino
    // codegen-compile and C2 JIT are one-time costs a long-running
    // cluster amortizes to zero, so they don't belong in a throughput
    // number.
    // A query that throws must surface as "err", never as a (fast) time:
    // timing the throw would let a broken query *improve* the total.
    val ordered = selected.toSeq.sortBy(_._1) // name order: run-to-run comparable
    ordered.foreach { case (_, fn) => try execute(fn)
      catch { case e: Throwable => System.err.println(s"[bench-warmup] ${e.getMessage}") } }
    // Two timed passes, per-query MIN: the harness VM's scheduler noise
    // measured up to 6x on driver-round-trip-heavy queries (q45 6.8s vs
    // 43s on identical code — BENCH_NOTES.md); min-of-2 is the standard
    // noise floor and still a fully executed end-to-end run.
    def timeOne(name: String, fn: (SparkSession, String) =>
        org.apache.spark.sql.DataFrame): Either[String, (Double, Double)] = {
      // Shared-JVM hygiene: collect the previous query's garbage
      // OUTSIDE the timer so an allocation-heavy neighbor cannot tax
      // this query with its GC debt. Round-3 bisection measured the
      // pollution at 2-5x on several queries (q41 6.6s in-suite vs
      // 1.5s isolated; q04/q09/q15/q16 2-3x) — see BENCH_NOTES.md.
      // SPARK_GRAFT_ONLY=<name> remains the true-isolation knob.
      System.gc()
      val t0 = System.nanoTime()
      try {
        // SPLIT the timer at the function/plan boundary: lake queries
        // build their committed scenario EAGERLY inside fn (the r16
        // q184 profile measured 7 local commits dominating a 4.99s
        // entry), while the returned plan's noop execution is the
        // probe the query exists to measure. Recording both makes the
        // scenario-vs-probe split a standing artifact instead of a
        // one-off profile — perf gates should track probe cost, not
        // local-commit fixed overhead that amortizes over real data.
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        Right(((t2 - t0) / 1e9, (t1 - t0) / 1e9))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        Left(e.getClass.getSimpleName)
      }
    }
    // Adaptive pass count: 2 passes minimum; while the spread is
    // MATERIAL (max/min > 2x AND the absolute gap > 0.5s — a 0.02s vs
    // 0.05s jitter never earns a re-run) keep re-running up to 5
    // passes. Round-4 post-mortem: min-of-2 recorded q42 at 10.8s when
    // the quiet-box number was 2.5s, because BOTH passes landed in the
    // same harness-VM scheduler stall; more chances to land outside the
    // stall is the only in-process defense. Every pass is emitted in
    // the JSON ("passes") so the artifact documents its own noise
    // floor instead of asking the reader to trust the min.
    val maxPasses = 5
    val results: Seq[(String, Either[String, Seq[(Double, Double)]])] =
      ordered.map { case (name, fn) =>
        var acc: Either[String, Vector[(Double, Double)]] = Right(Vector.empty)
        def needMore(ts: Vector[(Double, Double)]): Boolean =
          ts.size < 2 || (ts.size < maxPasses &&
            ts.map(_._1).max / ts.map(_._1).min > 2.0 &&
            ts.map(_._1).max - ts.map(_._1).min > 0.5)
        while (acc.exists(needMore)) {
          acc = (acc, timeOne(name, fn)) match {
            case (Right(ts), Right(t)) => Right(ts :+ t)
            case (Right(_), Left(e))   => Left(e)
            case (l, _)                => l
          }
        }
        name -> acc
      }
    def fmt(v: Double): String = (math.rint(v * 1e6) / 1e6).toString
    // summary mins at 4 decimals: 0.1ms resolution is far below the
    // measured noise floor, and the shorter values keep the whole
    // summary line (~93 queries) comfortably inside a 4 KB capture
    def fmt4(v: Double): String = (math.rint(v * 1e4) / 1e4).toString
    val qs = results.map {
      case (k, Right(ts)) => s"\"" + k + "\":" + fmt4(ts.map(_._1).min)
      case (k, Left(e))   => s"\"" + k + "\":\"err:" + e + "\""
    }.mkString("{", ",", "}")
    val passes = results.map {
      case (k, Right(ts)) =>
        s"\"" + k + "\":[" + ts.map(t => fmt(t._1)).mkString(",") + "]"
      case (k, Left(e))   => s"\"" + k + "\":\"err:" + e + "\""
    }.mkString("{", ",", "}")
    // per-query [scenario-build, probe] of the FASTEST pass, for
    // queries whose build cost is material (>= 0.25s): the standing
    // scenario-vs-probe ledger the perf gates read
    val splits = results.collect {
      case (k, Right(ts)) if ts.nonEmpty && ts.minBy(_._1)._2 >= 0.25 =>
        val (tot, build) = ts.minBy(_._1)
        s"\"" + k + "\":[" + fmt4(build) + "," + fmt4(tot - build) + "]"
    }.mkString("{", ",", "}")
    val errs = results.count(_._2.isLeft)
    val total = results.collect { case (_, Right(ts)) => ts.map(_._1).min }.sum
    // PROBE total: the measured-plan cost alone, summed over every
    // query (total minus the eager scenario-build half of each fastest
    // pass). This is the FORWARD-LOOKING perf gate (BASELINE.md): the
    // build half is local-commit fixed overhead the harness box pays —
    // at real scale a table is committed once and probed many times —
    // so regressions should be judged on probe_total first and the
    // all-in total second.
    val probeTotal = results.collect {
      case (_, Right(ts)) => val (tot, build) = ts.minBy(_._1); tot - build
    }.sum
    // Two lines, DETAIL FIRST, SUMMARY LAST: the round capture keeps
    // only a ~4 KB tail of this output, and in round 5 the per-pass
    // arrays pushed the front of the single line (q01–q45 mins) out of
    // the window. The per-pass noise audit is the line that can afford
    // to lose its head; the compact summary — headline total, query
    // count, every per-query min — must be the final bytes written.
    val passesLine = s"""{"metric":"passes","unit":"sec","passes":$passes,"sf":"$sfDir"}"""
    val totalLine = s"""{"metric":"total","value":$total,"unit":"sec","probe_total":${fmt4(probeTotal)},"build_total":${fmt4(total - probeTotal)},"errors":$errs,"n_queries":${results.size},"queries":$qs,"sf":"$sfDir"}"""
    println(s"""{"metric":"build_probe_split","unit":"sec","split":$splits}""")
    println(passesLine)
    println(totalLine)
    // FULL artifact on disk: the driver's capture keeps only a ~2 KB
    // tail of stdout, which at 109 queries truncates the front of the
    // summary line (round 8 lost q01–q29's times). The committed file
    // carries every per-query min AND every raw pass, so any run is
    // rankable and noise-auditable from the repo alone, independent of
    // the capture window. Best-effort: a read-only cwd must not fail
    // the bench. SUBSET runs (SPARK_GRAFT_ONLY) skip the write — an
    // isolation bisect must not clobber the full-catalog artifact.
    try if (only.isEmpty) {
      val w = new java.io.PrintWriter("BENCH_LATEST.json", "UTF-8")
      try {
        w.println(s"""{"metric":"total","value":$total,"unit":"sec","probe_total":${fmt4(probeTotal)},"build_total":${fmt4(total - probeTotal)},"errors":$errs,"n_queries":${results.size},"queries":$qs,"passes":$passes,"build_probe_split":$splits,"sf":"$sfDir"}""")
      } finally w.close()
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] could not write BENCH_LATEST.json: ${e.getMessage}") }
    // Tail-window lines, cheapest-to-capture LAST: the stdout capture
    // keeps the FINAL ~2000 chars, so the two lines that must survive
    // are written last and sized to fit together — a "slowest" line
    // (errors first, then the most expensive mins, greedily packed to
    // ~1.8 KB) and the ≤120-byte total_only repeat as the final bytes.
    // Between them the tail alone answers "did anything fail, what got
    // slow, what's the total" even if every line above is cut.
    val ranked: Seq[String] = {
      val errEntries = results.collect { case (k, Left(e)) => s"\"" + k + "\":\"err:" + e + "\"" }
      val timeEntries = results.collect { case (k, Right(ts)) => (k, ts.map(_._1).min) }
        .sortBy(-_._2)
        .map { case (k, t) => s"\"" + k + "\":" + fmt4(t) }
      errEntries ++ timeEntries
    }
    val slowestBudget = 1800
    val packed = new StringBuilder
    var taken = 0
    ranked.takeWhile { e =>
      val fits = packed.length + e.length + 1 <= slowestBudget
      if (fits) { if (taken > 0) packed.append(','); packed.append(e); taken += 1 }
      fits
    }
    println(s"""{"metric":"slowest","unit":"sec","top_n":$taken,"of":${results.size},"top":{$packed}}""")
    println(s"""{"metric":"total_only","value":${fmt4(total)},"unit":"sec","probe_total":${fmt4(probeTotal)},"errors":$errs,"n_queries":${results.size}}""")
    spark.stop()
    if (errs > 0) sys.exit(1)
  }
}

package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query wall seconds at
  * SPARK_GRAFT_SF_DIR. A warmup pass at the smallest SF first loads
  * classes/codegen caches so per-query numbers reflect steady-state
  * execution rather than JVM startup.
  *
  * Failures are loud: a query that throws is reported in an "errors" map
  * (first line of the exception) and EXCLUDED from the per-query times and
  * the total — a broken query must never record a fast time.
  *
  * Cache hygiene: `clearCache()` + unpersist-all + GC hint between queries
  * so one query's cached/checkpointed blocks can never bleed into another's
  * measurement. `clearCache()` alone is NOT enough: it drops SQL-cached
  * relations but leaves `localCheckpoint`ed RDD blocks registered in the
  * block manager, and ~145 entries × 3 executions accumulate hundreds of
  * such block sets — the storage churn behind t_dup_spans' full-suite-only
  * budget breaches in r11/r12 (BASELINE §round-13). getPersistentRDDs
  * covers both persisted and localCheckpointed RDDs; unpersisting between
  * queries is safe because nothing references the previous query's plan.
  *
  * SPARK_GRAFT_ONLY (optional): comma-separated query names — bench only
  * those. For local profiling; the driver leaves it unset.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // the streaming entries' oracle input dumps are correctness-surface
    // work, not pipeline work — skip them so bench numbers stay pure
    System.setProperty("graft.stream.dumpInputs", "false")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    // a typo'd filter silently benching nothing would read as a 0-second
    // run — same loud guard as Verify
    only.foreach { o =>
      val unknown = o -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"unknown query names in SPARK_GRAFT_ONLY: ${unknown.mkString(",")}")
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // SPARK_GRAFT_SHUFFLE (measurement-only; driver leaves it unset →
      // partitions = cpus as always): decouples shuffle partition count
      // from thread count for decade-up probes, where 32 partitions over
      // 10³× data under-partitions exactly what cluster.conf's 2000
      // partitions are sized for (r15: s_cosine_cc's 600 M bucket rows
      // hit per-task execution-memory exhaustion at 32 partitions)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }

    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }

    // warmup: exercise every query once at the smallest SF (class loading,
    // codegen compilation, parquet footer caches)
    queries.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
      sweep()
    }
    // ambient probe (r13 VERDICT Next #6): a FIXED trivial job — 32 empty
    // task slots + one 2k-row codegen'd map-aggregate — timed 3×, median.
    // It measures the box's scheduling/dispatch floor at run time, so the
    // budget gate can adjudicate sub-second breaches against ambient drift
    // (the s_quantize_int8 re-key class: entries with < 0.3 s absolute
    // headroom alarming on box noise, not code). Runs after warmup so it
    // sees the same steady-state JVM the entries do.
    def ambientProbe(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 2000, 1, cpus.toInt).selectExpr("sum(id * 2 + 1) as s").collect()
      (System.nanoTime() - t0) / 1e9
    }
    val ambient = (1 to 3).map(_ => ambientProbe()).sorted.apply(1)

    // best of 2 timed runs per query: single-run numbers on a shared box
    // showed 2x run-to-run variance from GC/compilation/OS noise.
    // GRAFT_BENCH_RUNS (measurement-only, default 2) drops to single-run
    // for the >5-minute-per-run decade probes, where a second pass costs
    // more wall-clock than the variance it removes — any BASELINE row
    // recorded under it says so.
    val benchRuns = sys.env.get("GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(2)
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = queries.flatMap { case (name, fn) =>
      val runs = (1 to benchRuns).flatMap { _ =>
        val t0 = System.nanoTime()
        val r = try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch {
          case e: Throwable =>
            val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.take(1).mkString.take(200)
            errors(name) = msg
            System.err.println(s"BENCH FAILURE $name: $msg")
            None
        }
        sweep()
        r
      }
      // any failed run disqualifies the query's time entirely: a partially
      // broken query must never contribute a (possibly lucky) number
      if (runs.isEmpty || errors.contains(name)) None else Some(name -> runs.min)
    }
    // full JSON string escape incl. control chars — a tab/CR in an
    // exception message would otherwise invalidate the whole report line
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // ms precision: the driver captures only a bounded tail of stdout, and
    // 71 entries at full double precision overflowed it in round 6
    // (BENCH_r06.json "parsed": null) — keep the report line short
    def jnum(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => jstr(k) + ":" + jnum(v) }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line = s"""{"metric":"total","value":${jnum(total)},"unit":"sec","ambient":${jnum(ambient)},"queries":$qs,"errors":$es,"n_failed":${errors.size},"sf":"$sfDir"}"""
    println(line)
    // Ledger durability (r16 VERDICT What's-wrong #3 / Next #6): the r15
    // stdout line was half-lost to the driver's bounded tail capture,
    // which zeroed that round's entire PERF comparison. Also write the
    // identical line to a file next to the run — a PURE ADDITION: the
    // stdout contract, env contract and methodology are unchanged.
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LINE.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"BENCH_LINE.json write failed (report already on stdout): $e") }
    // exit 0 even with failures: the JSON line (with its "errors" map) must
    // reach the driver; a non-zero exit could discard the whole report.
    spark.stop()
  }
}

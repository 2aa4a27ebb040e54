package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // the bench contract is local[32] (all cores) — default to the
    // machine, not a fixed small number
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up: initializes shuffle machinery, codegen compiler,
    // and parquet reader paths so the first timed query isn't charged
    // for one-time JVM setup.
    SparkEntry.entry(spark).count()
    // noop sink, NOT count(): count() lets Catalyst prune the whole
    // projection (and drop the sort), so map-heavy queries were timing a
    // parquet row count. The noop writer materializes every output row.
    // A throwing query returns its wall time AND the error message — a
    // silent catch would record the fast-fail time and report a broken
    // engine as healthy.
    def once(fn: (SparkSession, String) => DataFrame): (Double, Option[String]) = {
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}") }
      ((System.nanoTime() - t0) / 1e9, err)
    }
    // n=2 per query, min reported: a single shot confounds first-touch
    // codegen/JIT with the plan's real cost (round-2 saw 4.5× run-order
    // noise on q_minhash_bands).
    // SPARK_GRAFT_ONLY=q_a,q_b restricts the run for local iteration;
    // the driver never sets it, so round benches always cover everything
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = only.fold(SparkEntry.queries)(f =>
      SparkEntry.queries.view.filterKeys(f).toMap)
    val results = selected.map { case (name, fn) =>
      val (t1, e1) = once(fn)
      val (t2, e2) = once(fn)
      name -> (math.min(t1, t2), e1.orElse(e2))
    }
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = results.map { case (k, (v, _)) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, (_, Some(e))) => s"${jstr(k)}:${jstr(e)}" }
      .mkString("{", ",", "}")
    val ok = results.valuesIterator.forall(_._2.isEmpty)
    // any failed query poisons the headline metric: -1 is unmistakably
    // invalid, where a sum of fast-fail times would look like a great run
    val total =
      if (!ok) -1.0
      else if (results.nonEmpty) results.valuesIterator.map(_._1).sum
      else 0.0
    val line = s"""{"metric":"total","value":$total,"unit":"sec","ok":$ok,"errors":$errors,"queries":$qs,"sf":"$sfDir","cpus":$cpus,"runs_per_query":2,"sink":"noop","timing":"min_of_runs"}"""
    println(line)
    // Also persist the metric line: inside sbt, stdout is wrapped in
    // [info]-prefixed log text the driver cannot parse (BENCH_r01.json
    // recorded "parsed": null) — the file is the machine-readable channel.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    // The driver captures only the LAST ~2000 chars of output; with 150+
    // queries the full line above never fits, so every BENCH_r*.json so
    // far recorded "parsed": null. Print a compact summary LAST — total,
    // ok/errors, and the slowest queries at 3 dp — sized to sit entirely
    // inside that tail window (full per-query detail stays in bench.json
    // and the long line above).
    val slowN = math.min(25, results.size)
    val slowest = results.toSeq.sortBy(-_._2._1).take(slowN)
      .map { case (k, (v, _)) => "\"" + k + "\":" + (math.rint(v * 1000) / 1000) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","ok":$ok,"errors":$errors,"queries_n":${results.size},"queries":$slowest,"queries_note":"slowest $slowN of ${results.size}; all in bench.json","sf":"$sfDir","cpus":$cpus,"runs_per_query":2,"sink":"noop","timing":"min_of_runs"}""")
    spark.stop()
  }
}

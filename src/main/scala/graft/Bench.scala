package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every declared query on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`
  * plus, when `bench_baseline.json` exists, a `regressions` map of
  * queries slower than 1.5× their pinned round-1 time, and a `failed`
  * array so a failing query can never masquerade as a fast success.
  *
  * Each query is forced through `queryExecution.toRdd.count()` — unlike
  * `df.count()`, this executes the query's full physical plan (sorts,
  * projections, window functions) instead of letting Catalyst collapse
  * everything into a scan-count, so the timings reflect real work.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one warm-up pass of the IO + codegen paths so per-query timings
    // measure the operators, not first-touch JIT/classloading
    SparkEntry.queries.get("q1_agg").foreach { fn =>
      try fn(spark, sfDir).queryExecution.toRdd.count()
      catch { case _: Throwable => () }
    }

    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).queryExecution.toRdd.count()
      catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      // OUTSIDE the timed region — cache hygiene + a GC breather:
      // queries that persist() an internal subtree are done with it, so
      // drop the blocks (a leaked cache measured as a ~3× slowdown on
      // later window queries), and absorb accumulated codegen/broadcast
      // garbage between queries instead of as a pause inside one.
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      name -> sec
    }
    val timings = results.toMap
    val qs = results.map { case (k, v) =>
      "\"" + k + "\":" + (if (failed.contains(k)) -1.0 else v)
    }.mkString("{", ",", "}")
    val total = results.collect { case (k, v) if !failed.contains(k) => v }.sum

    // regression gate vs the pinned round-1 baseline (>1.5× slower)
    val baseline = readBaseline("bench_baseline.json")
    val regressions = baseline.toSeq.flatMap { case (name, b) =>
      timings.get(name).filter(t => !failed.contains(name) && b > 0 && t > b * 1.5)
        .map(t => name -> (t / b))
    }.sortBy(-_._2)
    regressions.foreach { case (n, r) =>
      System.err.println(f"[bench] REGRESSION $n: ${r}%.2fx vs baseline")
    }
    val regJson = regressions.map { case (k, r) => f""""$k":$r%.2f""" }
      .mkString("{", ",", "}")
    val failJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")

    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failJson,"regressions":$regJson,"sf":"$sfDir"}""")
    spark.stop()
  }

  /** Minimal parse of bench_baseline.json's {"queries":{name:sec}} via
    * the Jackson shipped with Spark — no extra dependency. */
  private def readBaseline(path: String): Map[String, Double] = {
    try {
      val f = new java.io.File(path)
      if (!f.exists()) return Map.empty
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.readTree(f)
      val qs = root.get("queries")
      if (qs == null) return Map.empty
      val it = qs.fieldNames()
      val b = Map.newBuilder[String, Double]
      while (it.hasNext) { val k = it.next(); b += k -> qs.get(k).asDouble() }
      b.result()
    } catch { case _: Throwable => Map.empty }
  }
}

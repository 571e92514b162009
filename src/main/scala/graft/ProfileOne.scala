package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: like [[BenchOne]], but each iteration also reports the
  * JVM-level mechanism counters the adjudication protocol needs —
  * GC wall-clock and collection counts (the allocation-pressure
  * hypothesis for q244's intra-run spread), and whole-stage-codegen
  * compilation count/time deltas from Spark's CodegenMetrics source
  * (the per-micro-batch recompile hypothesis for q294/q153: a
  * lit(batchId) inlined into the generated source forces a janino
  * cache miss on every batch). A spike whose GC delta ~= its wall
  * delta is allocation; one whose codegen delta is large is compile;
  * one with neither is I/O or scheduler blocking.
  *
  * An optional 4th arg `evict` starts a daemon thread that calls
  * spark.catalog.clearCache() every 750 ms WHILE queries run — the
  * cache-eviction-under-memory-pressure simulation for queries whose
  * streaming loop relies on a persisted eval side (the q153 63 s spike
  * hypothesis: evicted te/grams cache → every micro-batch rebuilds the
  * full corpus gram cap).
  *
  * Usage: runMain graft.ProfileOne <q1[,q2,...]> [sfDir] [iters] [evict]
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    // flag tokens (evict/ballastN) are position-independent (ADVICE r17:
    // `q124 evict` used to consume 'evict' as sfDir; `q124 sf 'evict'`
    // threw on iters) — strip them before positional assignment
    val isFlag = (a: String) => a == "evict" || a.startsWith("ballast")
    val pos = args.filterNot(isFlag)
    val names = pos(0).split(',').toSeq
    val sfDir = if (pos.length > 1) pos(1) else "/root/testdata/sf0.1"
    val iters = if (pos.length > 2) pos(2).toInt else 4
    val evict = args.contains("evict")
    // "ballastN": pin N GiB of live heap before running — the fleet-JVM
    // simulation (a 293-query Bench session carries GiBs of accumulated
    // live state; GC cost per collection scales with the live set, so a
    // query whose steady state allocates heavily can spread in fleet
    // conditions while profiling clean in isolation).
    val ballastGb = args.collectFirst {
      case a if a.startsWith("ballast") => a.stripPrefix("ballast").toInt
    }.getOrElse(0)
    val ballast = Array.fill(ballastGb * 4)(new Array[Long](32 * 1024 * 1024))
    if (ballastGb > 0)
      println(s"[profile] BALLAST: ${ballast.length} x 256 MB live arrays pinned")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000") // match Bench
      // creation-time off: session clones must not bind per-clone executor
      // classloaders (re-keys the codegen cache per clone; GraftSession.tune)
      .config("spark.sql.artifact.isolation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import scala.jdk.CollectionConverters._
    val gcs = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala
    def gcTimeMs: Long = gcs.map(_.getCollectionTime).sum
    def gcCount: Long = gcs.map(_.getCollectionCount).sum
    val cg = org.apache.spark.metrics.source.CodegenMetrics
    def cgCount: Long = cg.METRIC_COMPILATION_TIME.getCount
    def cgMeanMs: Double = cg.METRIC_COMPILATION_TIME.getSnapshot.getMean
    def heapMb: Long = {
      val r = Runtime.getRuntime
      (r.totalMemory - r.freeMemory) / (1024 * 1024)
    }
    if (evict) {
      val t = new Thread(() => {
        while (true) { Thread.sleep(750); spark.catalog.clearCache() }
      })
      t.setDaemon(true)
      t.start()
      println("[profile] EVICT mode: clearing cache every 750 ms")
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to iters).foreach { i =>
        val (gct0, gcc0, cgc0) = (gcTimeMs, gcCount, cgCount)
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        val (gct1, gcc1, cgc1) = (gcTimeMs, gcCount, cgCount)
        println(f"[profile] $name iter $i: wall=$dt%.2f s " +
          f"gc=${(gct1 - gct0) / 1000.0}%.2f s (${gcc1 - gcc0} colls) " +
          f"codegenCompiles=${cgc1 - cgc0} (mean ${cgMeanMs}%.0f ms) " +
          f"heap=${heapMb} MB ($n rows)")
      }
    }
    spark.stop()
  }
}

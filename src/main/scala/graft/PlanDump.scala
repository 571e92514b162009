package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev harness: dump `.explain("formatted")` for one or more queries to
  * files, for the plan-evidence artifacts under plans/<round>/.
  *
  * Usage: runMain graft.PlanDump <q1[,q2,...]> [sfDir] [outDir] [suffix]
  * Writes <outDir>/<queryName>_<suffix>.txt per query. Note that for the
  * streaming-store queries, CONSTRUCTING the frame runs the staged
  * micro-batch stream; the dumped plan is the final reconcile read over
  * the stores (the per-batch write jobs are foreachBatch-internal and do
  * not appear in any single frame's plan).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: runMain graft.PlanDump <q1[,q2,...]> [sfDir] [outDir] [suffix]")
      sys.exit(2)
    }
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 2) args(2) else "plans/r19"
    val suffix = if (args.length > 3) args(3) else "after"
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
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // try/finally: a failing query name must not leave the session running
    // (r19 ADVICE)
    try names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      val out = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
      java.nio.file.Files.write(out, plan.getBytes("UTF-8"))
      println(s"[plandump] wrote $out (${plan.length} chars)")
      spark.catalog.clearCache()
    } finally spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: time one or more queries repeatedly (and optionally print
  * their plans).
  *
  * Usage: runMain graft.BenchOne <q1[,q2,...]> [sfDir] [iters] [explain]
  * Iterations run in one session with the cache cleared between runs —
  * the same conditions Bench measures under. A comma-separated list shares
  * one JVM/session (so a 5-query control set costs one sbt startup, not
  * five); each query still reports per-iteration times.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 3
    val explain = args.contains("explain")
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
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (explain) fn(spark, sfDir).explain("formatted")
      (1 to iters).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        println(f"[benchone] $name iter $i: $dt%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}

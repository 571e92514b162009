package graft

import org.apache.spark.sql.SparkSession

/** Dev probe for the residual warm-iteration codegen recompiles (r19
  * "Not yet optimized" #1 / r19 verdict item 2): a reflective view of
  * Spark's whole-stage/projection codegen cache
  * (`CodeGenerator.cache`), whose key in Spark 4 is
  * `(HashableWeakReference(contextClassLoader), CodeAndComment)` — so a
  * warm recompile has exactly two possible mechanisms:
  *
  *   1. TEXTUAL novelty: the generated source body differs between
  *      iterations (a literal, a name, a map-ordering artifact);
  *   2. KEY novelty: the same body re-keyed under a different context
  *      classloader (the loader half of the tuple), which no amount of
  *      source canonicalization would fix.
  *
  * After each iteration the probe diffs the cache's key set against the
  * previous iteration's and splits new entries into those whose body
  * already sat in the cache under ANOTHER loader (key novelty) and those
  * with a brand-new body (textual novelty); brand-new warm bodies are
  * dumped to files for offline diffing.
  *
  * Usage: runMain graft.CodegenProbe <q1[,q2,...]> [sfDir] [iters] [dumpDir]
  */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 3
    val dumpDir = if (args.length > 3) Some(args(3)) else None
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

    val cgClass = Class.forName(
      "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator$")
    val module = cgClass.getField("MODULE$").get(null)
    val cacheM = cgClass.getDeclaredMethod("cache")
    cacheM.setAccessible(true)

    def md5(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.take(8).map(b => f"${b & 0xff}%02x").mkString
    }

    /** (loaderDescription, bodyHash, body) per live cache entry. */
    def snapshot(): Seq[(String, String, String)] = {
      val nf = cacheM.invoke(module)
      val lc = nf.getClass.getMethod("loadingCache").invoke(nf)
      // look the method up on the (public) Cache interface — the impl
      // class LocalCache$LocalManualCache is package-private
      val asMapM = Class.forName("org.sparkproject.guava.cache.Cache")
        .getMethod("asMap")
      val map = asMapM.invoke(lc)
        .asInstanceOf[java.util.concurrent.ConcurrentMap[AnyRef, AnyRef]]
      import scala.jdk.CollectionConverters._
      map.keySet().asScala.toSeq.map { k =>
        val t = k.asInstanceOf[Tuple2[AnyRef, AnyRef]]
        val ref = t._1.asInstanceOf[java.lang.ref.WeakReference[AnyRef]].get()
        val loader =
          if (ref == null) "<collected>"
          else ref.getClass.getSimpleName + "@" +
            Integer.toHexString(System.identityHashCode(ref))
        val body = t._2.getClass.getMethod("body").invoke(t._2)
          .asInstanceOf[String]
        (loader, md5(body), body)
      }
    }

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      var prevKeys = Set.empty[(String, String)]
      var prevBodies = Set.empty[String]
      (1 to iters).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        val snap = snapshot()
        val keys = snap.map(e => (e._1, e._2)).toSet
        val bodies = snap.map(_._2).toSet
        val newKeys = keys -- prevKeys
        val (keyNovel, textNovel) = newKeys.partition(k => prevBodies(k._2))
        val loaders = snap.map(_._1).distinct.sorted
        println(f"[cgprobe] $name iter $i: wall=$dt%.2f s entries=${keys.size} " +
          s"loaders=${loaders.size} newEntries=${newKeys.size} " +
          s"sameBodyNewLoader=${keyNovel.size} newBody=${textNovel.size} ($n rows)")
        if (loaders.size > 1 || i == 1)
          println(s"[cgprobe]   loaders: ${loaders.mkString(", ")}")
        // dump the warm iterations' brand-new bodies for offline diffing
        if (i >= 2) dumpDir.foreach { dd =>
          val dir = java.nio.file.Paths.get(dd, s"$name-iter$i")
          java.nio.file.Files.createDirectories(dir)
          val novelHashes = textNovel.map(_._2)
          snap.filter(e => novelHashes(e._2)).distinctBy(_._2)
            .foreach { case (_, h, body) =>
              java.nio.file.Files.write(dir.resolve(s"$h.java"),
                body.getBytes("UTF-8"))
            }
        }
        prevKeys = keys
        prevBodies = prevBodies ++ bodies
      }
    }
    spark.stop()
  }
}

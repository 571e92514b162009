package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S4: HTTP REST source (SURVEY.md §2.1) — the NiFi `InvokeHTTP` leg
  * (`tp.xml:1652-1656`): GET with header auth, 5 s connect / 15 s read
  * timeouts, one response body per fetch.
  *
  * Spark has no HTTP built-in; like the reference (where NiFi fetches on
  * the driver-equivalent), this is a driver-side fetch whose body then
  * enters the engine as a one-row DataFrame and fans out via
  * `Etl.splitItems` ($.items[*] explode). A paged fetch (many URLs) can
  * parallelize by mapping URLs over an RDD, but the reference's single-GET
  * semantics don't need it.
  *
  * Zero-egress container: EtlLifecycleSpec exercises [[fetch]] against an
  * in-process loopback HTTP server (headers included) and
  * [[fromBody]]/[[fromFile]] as the fixture legs.
  */
object HttpSource {

  def fetch(url: String, headers: Map[String, String] = Map.empty): String = {
    val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(5))
      .build()
    val b = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(15)).GET()
    headers.foreach { case (k, v) => b.header(k, v) }
    client.send(b.build(), HttpResponse.BodyHandlers.ofString()).body()
  }

  /** Response body → one-row DataFrame(body string). */
  def fromBody(spark: SparkSession, body: String): DataFrame = {
    import spark.implicits._
    Seq(body).toDF("body")
  }

  /** Fixture stand-in: file contents as the response body. */
  def fromFile(spark: SparkSession, path: String): DataFrame =
    fromBody(spark, new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}

package graft

import graft.functions.CompressionExprs.{gunzip, gzip}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GzipCodec
import org.scalatest.funsuite.AnyFunSuite

/** Native gzip codec: round-trip identity, real compression, permissive
  * nulls on corrupt input, the decompression-bomb cap, an EXTERNAL fixed
  * vector (stream produced by CPython's gzip, not by the code under
  * test), and SQL registration.
  */
class CompressionSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}
  import spark.implicits._

  test("gzip/gunzip round-trips every document byte-exactly") {
    val n = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"),
        decode(gunzip(gzip(encode(col("text"), "UTF-8"))), "UTF-8").as("dec"))
      .filter(col("dec").isNull || col("dec") =!= col("text"))
      .count()
    assert(n == 0L)
  }

  test("compression actually shrinks repetitive text") {
    val row = Seq(("x " * 5000)).toDF("t")
      .select(length(gzip(encode(col("t"), "UTF-8"))).as("nz"),
        length(encode(col("t"), "UTF-8")).as("n"))
      .collect()(0)
    assert(row.getInt(0) < row.getInt(1) / 10,
      s"gzip of 10k repetitive bytes only reached ${row.getInt(0)}")
  }

  test("corrupt and truncated input decodes to null, not an exception") {
    // garbage magic, a valid stream truncated mid-body, and empty input
    val good = GzipCodec.gzipJava("some payload some payload".getBytes("UTF-8"))
    val cases = Seq(
      Array[Byte](1, 2, 3, 4, 5),
      good.take(good.length - 5),
      Array.empty[Byte])
    val decoded = cases.toDF("b").select(gunzip(col("b")).as("d")).collect()
    assert(decoded.forall(_.isNullAt(0)))
    // and a CRC flip: corrupt one byte of the trailer
    val flipped = good.clone(); flipped(flipped.length - 1) = (flipped(flipped.length - 1) ^ 0x5A).toByte
    assert(Seq(flipped).toDF("b").select(gunzip(col("b"))).collect()(0).isNullAt(0))
  }

  test("decompression bomb cap yields null past MaxOutputBytes") {
    val bomb = GzipCodec.gzipJava(new Array[Byte]((GzipCodec.MaxOutputBytes + 1024L).toInt))
    assert(bomb.length < (1 << 20)) // the bomb itself is tiny on the wire
    assert(GzipCodec.gunzipJava(bomb) == null)
    val under = GzipCodec.gzipJava(new Array[Byte](1 << 20))
    assert(GzipCodec.gunzipJava(under).length == (1 << 20))
  }

  test("decodes an externally-produced gzip stream (CPython vector)") {
    val hexStream =
      "1F8B08000000000002034B2F4A4C2B5148CECF2D284A2D2E4E4D512848ACCCC94F" +
      "4C5148CBAC28292D4A5538BCF2F08A474D6B007D96F47D28000000"
    val got = Seq(hexStream).toDF("h")
      .select(decode(gunzip(unhex(col("h"))), "UTF-8"))
      .collect()(0).getString(0)
    assert(got == "graft compressed payload fixture éè€")
  }

  test("graft_gzip / graft_gunzip are registered in SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT decode(graft_gunzip(graft_gzip(encode('round trip', 'UTF-8'))), 'UTF-8')")
      .collect()(0).getString(0)
    assert(r == "round trip")
  }
}

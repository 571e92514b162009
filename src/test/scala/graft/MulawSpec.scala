package graft

import org.scalatest.funsuite.AnyFunSuite

/** q295's external-decoder validation (the gzip/zstd/PNG discipline): the
  * query decodes G.711 µ-law with integer arithmetic inside the plan; this
  * spec proves that formula equals the JDK's OWN µ-law decoder
  * (javax.sound.sampled ULAW → PCM_SIGNED conversion, which descends from
  * Sun's reference g711.c) for every possible byte value.
  */
class MulawSpec extends AnyFunSuite {

  /** The exact integer expansion the query plan evaluates
    * (MultimodalPack.mulawWalk) and Q295_ORACLE replays in SQL. */
  private def g711(b: Int): Int = {
    val c = 255 - b
    val t = ((c & 15) * 8 + 132) << ((c >> 4) & 7)
    if ((c & 128) != 0) 132 - t else t - 132
  }

  test("G.711 expansion matches the JDK javax.sound µ-law decoder on all 256 bytes") {
    import javax.sound.sampled._
    val samples = (0 until 256).map(_.toByte).toArray
    val ulaw = new AudioFormat(AudioFormat.Encoding.ULAW,
      8000f, 8, 1, 1, 8000f, false)
    val pcm16 = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, false)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(samples), ulaw, samples.length.toLong)
    val out = AudioSystem.getAudioInputStream(pcm16, in).readAllBytes()
    assert(out.length == 512)
    (0 until 256).foreach { i =>
      val jdk = ((out(2 * i + 1) << 8) | (out(2 * i) & 0xff)).toShort.toInt
      assert(jdk == g711(i), s"byte $i: jdk=$jdk formula=${g711(i)}")
    }
  }

  test("full-scale magnitude (clip detection threshold) is 32124 at bytes 0 and 128") {
    assert(g711(0) == -32124)
    assert(g711(128) == 32124)
    assert((0 until 256).map(b => math.abs(g711(b))).max == 32124)
  }
}

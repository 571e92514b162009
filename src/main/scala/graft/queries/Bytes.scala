package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared little-endian byte-walk primitives for the container-format
  * family (q273 gzip / q280 zstd / q288 ogg / q292 pcm and their fixture
  * builders; the older walks predate this object and keep their local
  * copies — verified code left untouched).
  *
  * READERS take the blob's hex column (`hex(content)`) and a 1-based BYTE
  * position; EMITTERS render a non-negative Column as little-endian hex.
  * One copy of the 256/65536/16777216 multipliers so a transcription slip
  * can't desynchronize a walk from its fixture.
  */
private[graft] object Bytes {

  /** Byte value at 1-based position `p` of hex column `hx` (NULL past
    * the end — callers guard with bounds checks or coalesce). */
  def byteAt(hx: Column, p: Column): Column =
    conv(hx.substr(p * 2 - 1, lit(2)), 16, 10).cast("long")

  def le2At(hx: Column, p: Column): Column =
    byteAt(hx, p) + byteAt(hx, p + 1L) * 256L

  def le3At(hx: Column, p: Column): Column =
    le2At(hx, p) + byteAt(hx, p + 2L) * 65536L

  def le4At(hx: Column, p: Column): Column =
    le3At(hx, p) + byteAt(hx, p + 3L) * 16777216L

  /** `n` bytes at 1-based position `p`, as uppercase hex (for signature
    * compares against string literals). */
  def sigAt(hx: Column, p: Column, n: Int): Column =
    hx.substr(p * 2 - 1, lit(2 * n))

  // ---- emitters: Column value → little-endian hex ------------------------

  def le2h(x: Column): Column = concat(
    lpad(hex(pmod(x, lit(256L))), 2, "0"),
    lpad(hex(pmod((x / 256L).cast("long"), lit(256L))), 2, "0"))

  def le3h(x: Column): Column = concat(le2h(x),
    lpad(hex(pmod((x / 65536L).cast("long"), lit(256L))), 2, "0"))

  def le4h(x: Column): Column = concat(le3h(x),
    lpad(hex(pmod((x / 16777216L).cast("long"), lit(256L))), 2, "0"))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.{ColumnBridge, NfcNormalize}

/** Public face of the native text-canonicalization expressions. */
object TextExprs {
  /** Codegen'd Unicode NFC normalization (canonical composition) — the
    * canonicalization every hash-keyed text operator (exact dedup,
    * shingles, fingerprints) needs first: decomposed "é" and
    * precomposed "é" hash differently until normalized. Pure-ASCII rows
    * take an allocation-free identity fast path. Also registered in SQL
    * as `graft_nfc` via [[graft.GraftExtensions]]. */
  def nfc(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}

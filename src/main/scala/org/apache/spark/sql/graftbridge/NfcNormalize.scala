package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) of a string column —
  * the canonicalization step a text corpus needs BEFORE any hash-keyed
  * operator (exact dedup, shingling, fingerprinting): "é" as U+00E9 and as
  * U+0065 U+0301 are the same text to a reader but different bytes to
  * md5/xxhash64, so un-normalized corpora silently under-deduplicate.
  *
  * Why a native expression: normalization runs once per row over the full
  * corpus on the ingest path. The codegen'd form stays inside whole-stage
  * codegen and takes an allocation-free fast path for pure-ASCII rows
  * (the overwhelming majority in practice) — a Scala UDF would box every
  * row and break the codegen span. Spark itself has no NFC builtin.
  *
  * Cross-engine: DuckDB's `nfc_normalize` implements the same Unicode
  * canonical composition, so NFC'd text is hash-comparable cross-engine
  * (pinned by the q126 oracle).
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(s: Any): Any =
    NfcNormalize.nfcJava(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = NfcNormalize.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.nfcJava($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Called from generated code. ASCII bytes are NFC-invariant (no
    * combining sequences, no compatibility characters), so a pure-ASCII
    * row returns the input UTF8String untouched — no String round-trip,
    * no allocation. */
  def nfcJava(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
  }
}

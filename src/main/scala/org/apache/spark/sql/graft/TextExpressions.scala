package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text-cleanup kernels. Spark ships no Unicode-normalization function,
  * but corpus cleanup needs one: visually identical strings with
  * different codepoint sequences (e + U+0301 vs é) defeat exact dedup,
  * fingerprinting, and every hash-keyed operator upstream of them —
  * normalization must happen BEFORE any hashing pass or two spellings
  * of the same document never collide. NFC (canonical composition) is
  * the standard choice; both the JDK (`java.text.Normalizer`) and the
  * oracle's utf8proc (`nfc_normalize`) implement the same Unicode
  * algorithm, so the expression is exactly cross-engine replayable.
  */
object TextKernels {
  /** Character-bigram codes of `text` in one pass: element i packs the
    * UTF-16 units at i and i+1 as (c1 << 16) | c2. One O(n) scan —
    * per-position `substring(text, i, 2)` over a UTF8String costs O(i)
    * each (byte offsets must be rescanned), turning the bigram explode
    * quadratic per document. Codes equal the oracle's
    * `unicode(c1) * 65536 + unicode(c2)` for BMP text (UTF-16 unit ==
    * codepoint there; the corpus fixture is ASCII).
    */
  def charBigrams(text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = text.toString
    val n = math.max(0, s.length - 1)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = (s.charAt(i).toLong << 16) | s.charAt(i + 1).toLong; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Character-entropy statistics in one native pass: sort the UTF-16
    * units (primitive `Arrays.sort` — BMP numeric order equals the
    * oracle's binary string order; the corpus fixture is ASCII), then
    * run-length accumulate `run * ln(run)` in ASCENDING character
    * order — the exact addition sequence DuckDB replays as
    * `list(c * ln(c) ORDER BY ch)`, so the double is bit-identical.
    * Returns (sum_ln, distinct_chars); the interpreted
    * sort-array + fold HOF pipeline this replaces was a top-3 bench
    * line (3.9 s at sf0.1 → sub-second native).
    */
  def charEntropyStats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = text.toString
    val cs = s.toCharArray
    java.util.Arrays.sort(cs)
    var sumLn = 0.0
    var distinct = 0L
    var i = 0
    val n = cs.length
    while (i < n) {
      var j = i + 1
      while (j < n && cs(j) == cs(i)) j += 1
      val run = (j - i).toDouble
      sumLn += run * math.log(run)
      distinct += 1L
      i = j
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](sumLn, distinct))
  }

  def nfc(text: UTF8String): UTF8String = {
    val s = text.toString
    // fast path: corpus text is overwhelmingly already NFC (all of
    // ASCII is); isNormalized allocates nothing on that path
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}

case class CharBigrams(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_bigrams"
  override protected def nullSafeEval(t: Any): Any =
    TextKernels.charBigrams(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"org.apache.spark.sql.graft.TextKernels.charBigrams($t)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class CharEntropyStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("sum_ln", DoubleType, nullable = false),
    StructField("distinct_chars", LongType, nullable = false)))
  override def prettyName: String = "char_entropy_stats"
  override protected def nullSafeEval(t: Any): Any =
    TextKernels.charEntropyStats(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"org.apache.spark.sql.graft.TextKernels.charEntropyStats($t)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override protected def nullSafeEval(t: Any): Any =
    TextKernels.nfc(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"org.apache.spark.sql.graft.TextKernels.nfc($t)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

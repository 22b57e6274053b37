package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (the MOSS scheme) of a text column, computed
  * per-row in one pass: hash every k-char gram, keep the minimum of
  * each w-gram window, return the distinct minima sorted ascending.
  * Guarantees any shared substring of length ≥ k+w-1 yields a shared
  * fingerprint.
  *
  * Replaces the `transform(sequence(...)) + slice + array_min +
  * array_distinct` formulation: higher-order functions evaluate
  * interpreted (a closure call per element), while this kernel is a
  * single static call from generated code. Gram hashes match
  * `xxhash64(substring(text, i+1, k))` (seed 42, the SQL function's
  * default) — ASCII fast path hashes byte slices in place, multi-byte
  * text falls back to per-gram substring.
  *
  * Texts shorter than k+w-1 chars yield an empty array (explode then
  * emits no rows, the same drop the length filter used to do).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 && w >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects string, k >= 1, w >= 1; got " +
        s"${child.dataType.simpleString}, k=$k, w=$w")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WinnowFingerprints.compute($a, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {
  /** Seed of the SQL `xxhash64` function, for gram-hash parity. */
  private final val XxSeed = 42L

  def compute(s: UTF8String, k: Int, w: Int): GenericArrayData = {
    val nChars = s.numChars()
    if (nChars < k + w - 1) return new GenericArrayData(Array.emptyLongArray)
    val nGrams = nChars - k + 1
    val grams = new Array[Long](nGrams)
    if (s.numBytes() == nChars) {
      // ASCII: char i sits at byte i — hash byte slices in place
      val base = s.getBaseObject
      val off = s.getBaseOffset
      var i = 0
      while (i < nGrams) {
        grams(i) = XXH64.hashUnsafeBytes(base, off + i, k, XxSeed)
        i += 1
      }
    } else {
      var i = 0
      while (i < nGrams) {
        val g = s.substringSQL(i + 1, k)
        grams(i) = XXH64.hashUnsafeBytes(
          g.getBaseObject, g.getBaseOffset, g.numBytes, XxSeed)
        i += 1
      }
    }
    val nWin = nGrams - w + 1
    val minima = new Array[Long](nWin)
    var j = 0
    while (j < nWin) {
      var m = grams(j)
      var t = 1
      while (t < w) { if (grams(j + t) < m) m = grams(j + t); t += 1 }
      minima(j) = m
      j += 1
    }
    java.util.Arrays.sort(minima)
    var out = 0
    var i = 0
    while (i < nWin) {
      if (out == 0 || minima(i) != minima(out - 1)) {
        minima(out) = minima(i); out += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(minima, out))
  }

  /** Canonical builder (shared with [[graft.GraftExtensions]]). */
  def builder(exprs: Seq[Expression]): Expression =
    WinnowFingerprints(exprs(0),
      FunctionArgs.intLit("winnow_fingerprints", exprs, 1),
      FunctionArgs.intLit("winnow_fingerprints", exprs, 2))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fingerprints", builder, "built-in")
}

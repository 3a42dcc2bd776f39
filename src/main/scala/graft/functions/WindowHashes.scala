package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Static Rabin-Karp kernel callable from generated code. */
object WindowHashKernel {
  /** All polynomial window hashes of `s`: element i is the hash of the
    * `win`-char window starting at 0-based char offset `i*stride`
    * (h = Σ c_j · base^(win-1-j), wrapping 64-bit arithmetic — exact
    * and engine-independent because Java longs wrap deterministically;
    * `base` must be odd so multiplication is invertible mod 2^64).
    * The roll advances one char at a time (O(1) per position), emitting
    * every `stride`-th hash — O(n) total versus O(n·win) for hashing
    * each window's substring from scratch. Chars are UTF-16 units (==
    * code points for all BMP text; the synthetic corpus is ASCII). */
  def compute(s: UTF8String, win: Int, stride: Int, base: Long): ArrayData = {
    val str = s.toString
    val n = str.length
    if (n < win) return new GenericArrayData(Array.emptyLongArray)
    var pw = 1L
    var i = 0
    while (i < win - 1) { pw *= base; i += 1 }
    var h = 0L
    i = 0
    while (i < win) { h = h * base + str.charAt(i); i += 1 }
    val m = (n - win) / stride + 1
    val out = new Array[Long](m)
    out(0) = h
    var j = 1
    var p = 1 // 0-based start of the next rolled window
    while (p <= n - win) {
      h = (h - str.charAt(p - 1) * pw) * base + str.charAt(p + win - 1)
      if (p % stride == 0) { out(j) = h; j += 1 }
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** Static kernel for the fused two-base form: BOTH rolling hashes of
  * every window in ONE pass over the string, emitted as an
  * `array<struct<h1:long,h2:long>>`. One struct per emitted window is
  * the only per-element allocation — versus the previous
  * `arrays_zip(WindowHashes(b1), WindowHashes(b2))` shape, which read
  * the string twice, materialized two long arrays, and then allocated
  * a zip struct per element anyway (the GC-storm the bench flagged on
  * `q_substring_dedup`). */
object WindowHashPairKernel {
  def compute(s: UTF8String, win: Int, stride: Int,
              base1: Long, base2: Long): ArrayData = {
    val str = s.toString
    val n = str.length
    if (n < win) return new GenericArrayData(Array.empty[Any])
    var pw1 = 1L; var pw2 = 1L
    var i = 0
    while (i < win - 1) { pw1 *= base1; pw2 *= base2; i += 1 }
    var h1 = 0L; var h2 = 0L
    i = 0
    while (i < win) { val c = str.charAt(i); h1 = h1 * base1 + c; h2 = h2 * base2 + c; i += 1 }
    val m = (n - win) / stride + 1
    val out = new Array[Any](m)
    out(0) = new GenericInternalRow(Array[Any](h1, h2))
    var j = 1
    var p = 1 // 0-based start of the next rolled window
    while (p <= n - win) {
      val outc = str.charAt(p - 1); val inc = str.charAt(p + win - 1)
      h1 = (h1 - outc * pw1) * base1 + inc
      h2 = (h2 - outc * pw2) * base2 + inc
      if (p % stride == 0) { out(j) = new GenericInternalRow(Array[Any](h1, h2)); j += 1 }
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** Native codegen expression: array of Rabin-Karp window hashes of a
  * string (see [[WindowHashKernel.compute]]). Built for
  * [[graft.pipeline.Dedup.substringSpans]], where the per-window
  * `substr` + full re-hash was the dominant CPU term; two instances
  * with independent odd bases give a 128-bit combined identity. */
case class WindowHashes(child: Expression, win: Int, stride: Int, base: Long)
  extends UnaryExpression with ExpectsInputTypes {

  require(win >= 1 && stride >= 1, s"need win>=1, stride>=1; got $win, $stride")
  require((base & 1L) == 1L, "base must be odd (invertible mod 2^64)")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_window_hashes"

  override def nullSafeEval(a: Any): Any =
    WindowHashKernel.compute(a.asInstanceOf[UTF8String], win, stride, base)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WindowHashKernel.compute(" +
        s"$a, $win, $stride, ${base}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused two-base form of [[WindowHashes]]: one O(n) pass emits
  * `array<struct<h1:long,h2:long>>` — both window identities per
  * position, ready for `posexplode` with no `arrays_zip`. See
  * [[WindowHashPairKernel.compute]] for why this replaced the
  * two-expression + zip plan in `substringSpans`. */
case class WindowHashPairs(child: Expression, win: Int, stride: Int,
                           base1: Long, base2: Long)
  extends UnaryExpression with ExpectsInputTypes {

  require(win >= 1 && stride >= 1, s"need win>=1, stride>=1; got $win, $stride")
  require((base1 & 1L) == 1L && (base2 & 1L) == 1L,
    "bases must be odd (invertible mod 2^64)")
  require(base1 != base2, "bases must differ")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h1", LongType, nullable = false),
                   StructField("h2", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_window_hash_pairs"

  override def nullSafeEval(a: Any): Any =
    WindowHashPairKernel.compute(a.asInstanceOf[UTF8String], win, stride, base1, base2)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WindowHashPairKernel.compute(" +
        s"$a, $win, $stride, ${base1}L, ${base2}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WindowHashPairs {
  import org.apache.spark.sql.GraftSqlShim

  def apply(text: Column, win: Int, stride: Int): Column =
    GraftSqlShim.column(WindowHashPairs(GraftSqlShim.expression(text),
      win, stride, WindowHashes.Base1, WindowHashes.Base2))
}

object WindowHashes {
  import org.apache.spark.sql.GraftSqlShim

  /** Two independent odd bases → a 128-bit combined window identity. */
  val Base1 = 0x100000001B3L          // FNV-1a prime
  val Base2 = 6364136223846793005L    // Knuth MMIX LCG multiplier

  def apply(text: Column, win: Int, stride: Int, base: Long): Column =
    GraftSqlShim.column(
      WindowHashes(GraftSqlShim.expression(text), win, stride, base))
}

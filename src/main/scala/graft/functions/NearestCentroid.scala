package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Index of the nearest literal centroid to `vector[offset ..
  * offset+width)` — the quantizer-encode argmin
  * (`array_min(array(struct(graft_sqdist(slice(v)), c)))…getField("c")`)
  * as ONE native kernel: no slice allocation, no k struct
  * allocations, no array_min traversal; the codebook rides the
  * generated class as a referenced flat double[] and the whole k×width
  * loop inlines into whole-stage codegen (r15; guide §1.2 step 2 /
  * §4.1 prefer native expressions). Encoding a corpus evaluates this
  * once per (row, subspace) — at PQ shape that was k sqdist kernel
  * calls plus k+2 allocations per evaluation.
  *
  * BIT-IDENTICAL to the expression tree it replaces, including the
  * edges the specs pin:
  *   - each candidate distance is [[SqDist]]'s ascending-index left
  *     fold over `min(width, max(0, v.len - offset))` elements (the
  *     slice-then-sqdist length rule);
  *   - selection is the lexicographic struct-min order: strictly
  *     smaller distance wins with NaN GREATEST (Spark's double
  *     ordering), equal distances keep the LOWEST index (NaN equals
  *     NaN, so an all-NaN row yields 0);
  *   - a NULL vector yields code 0, exactly like the struct-min whose
  *     null distance field sorts first — so this expression is
  *     non-nullable, like the tree it replaces. Null elements inside
  *     the array read as 0.0, same as [[SqDist]]. */
case class NearestCentroid(child: Expression, book: Array[Array[Double]],
                           offset: Int, width: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(book.nonEmpty && offset >= 0 && width >= 0,
    "NearestCentroid: need a non-empty codebook and offset/width >= 0")

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_nearest_centroid"

  // row-major k×width; a centroid shorter than `width` is padded with
  // 0.0 but its true length bounds its distance loop (sqdist's
  // min-length rule applies per centroid)
  private lazy val lens: Array[Int] = book.map(_.length)
  private lazy val flat: Array[Double] = {
    val f = new Array[Double](book.length * width)
    var c = 0
    while (c < book.length) {
      val cv = book(c)
      var i = 0
      while (i < math.min(width, cv.length)) {
        f(c * width + i) = cv(i); i += 1
      }
      c += 1
    }
    f
  }

  private[functions] def codeOf(x: ArrayData): Int = {
    val avail = x.numElements() - offset
    val effW = math.min(width, math.max(0, avail))
    var bestC = 0
    var best = distTo(x, 0, effW)
    var c = 1
    while (c < book.length) {
      val d = distTo(x, c, effW)
      if ((java.lang.Double.isNaN(best) && !java.lang.Double.isNaN(d)) ||
          d < best) { best = d; bestC = c }
      c += 1
    }
    bestC
  }

  private def distTo(x: ArrayData, c: Int, effW: Int): Double = {
    val n = math.min(effW, lens(c))
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(offset + i) - flat(c * width + i)
      s += d * d; i += 1
    }
    s
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0 else codeOf(v.asInstanceOf[ArrayData])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bookRef = ctx.addReferenceObj("book", flat, "double[]")
    val lensRef = ctx.addReferenceObj("lens", lens, "int[]")
    val k = book.length
    val childGen = child.genCode(ctx)
    val effW = ctx.freshName("effW")
    val best = ctx.freshName("best")
    val bestC = ctx.freshName("bestC")
    val c = ctx.freshName("c")
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val s = ctx.freshName("s")
    val d = ctx.freshName("d")
    val better = ctx.freshName("better")
    // NOTE the flat if/else chain instead of one compound (a || (b &&
    // !c) || d) condition: janino misparses the parenthesized
    // conjunction as a cast ("expression is not a type") and the whole
    // stage would silently fall back to interpreted execution
    val code =
      code"""
        |${childGen.code}
        |int ${ev.value} = 0;
        |if (!${childGen.isNull}) {
        |  final int $effW = java.lang.Math.min($width,
        |    java.lang.Math.max(0, ${childGen.value}.numElements() - $offset));
        |  double $best = Double.NaN;
        |  int $bestC = 0;
        |  for (int $c = 0; $c < $k; $c++) {
        |    final int $n = java.lang.Math.min($effW, $lensRef[$c]);
        |    double $s = 0.0;
        |    for (int $i = 0; $i < $n; $i++) {
        |      final double $d = ${childGen.value}.getDouble($offset + $i)
        |        - $bookRef[$c * $width + $i];
        |      $s += $d * $d;
        |    }
        |    boolean $better = false;
        |    if ($c == 0) {
        |      $better = true;
        |    } else if (Double.isNaN($best)) {
        |      $better = !Double.isNaN($s);
        |    } else {
        |      $better = $s < $best;
        |    }
        |    if ($better) { $best = $s; $bestC = $c; }
        |  }
        |  ${ev.value} = $bestC;
        |}
      """.stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {
  import org.apache.spark.sql.GraftSqlShim

  /** Column form: nearest `book` row to `v[offset .. offset+width)`. */
  def nearestCentroid(v: Column, book: Array[Array[Double]],
                      offset: Int, width: Int): Column =
    GraftSqlShim.column(NearestCentroid(
      GraftSqlShim.expression(v), book, offset, width))
}

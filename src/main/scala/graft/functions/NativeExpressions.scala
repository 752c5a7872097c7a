package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the numeric hot paths where composed
  * higher-order built-ins (zip_with/aggregate/transform) evaluate
  * interpreted, element-by-element, with boxing — orders of magnitude slower
  * at pair-join scale. Semantics are EXACTLY the documented sequential
  * folds, so the DuckDB oracles stay valid unchanged.
  */
object NativeExpressions {

  /** Dot product of two float/double arrays as one codegen'd loop in
    * doubles, accumulating sequentially (i = 0..n-1) — the same op order as
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` and the oracle's
    * list_reduce.
    */
  case class FloatVecDot(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      def ok(dt: DataType) = dt match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
        case _ => false
      }
      if (ok(left.dataType) && ok(right.dataType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot needs array<float|double> inputs, got ${left.dataType}, ${right.dataType}")
    }

    private def isFloat(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      val lf = isFloat(left); val rf = isFloat(right)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
        acc += xv * yv
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val getA = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
        val getB = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) { $acc += $getA * $getB; }
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** 60-bit simhash of a token array — one JVM pass per row (md5 per token,
    * nibble-wise bit extraction, ±1 accumulate, sign, power-of-two
    * assembly). Bit semantics identical to the md5-hex formulation the
    * oracle computes: hex digit i/4, bit (3 - i%4), sign of the sum,
    * Σ 2^i. CodegenFallback: the per-row loop IS the work; there is no
    * per-element interpretation overhead to avoid.
    */
  case class SimHash60Expr(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash60 needs array<string>, got $dt")
      }

    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val sums = new Array[Int](60)
      val md = MessageDigest.getInstance("MD5")
      var t = 0
      val nTok = arr.numElements()
      while (t < nTok) {
        val bytes = arr.getUTF8String(t).getBytes
        md.reset()
        val digest = md.digest(bytes)
        var i = 0
        while (i < 60) {
          val hexIdx = i >> 2 // hex digit index = i / 4
          val b = digest(hexIdx >> 1) & 0xff
          val nibble = if ((hexIdx & 1) == 0) (b >> 4) & 0xf else b & 0xf
          val bit = (nibble >> (3 - (i & 3))) & 1
          sums(i) += 2 * bit - 1
          i += 1
        }
        t += 1
      }
      var out = 0L
      var i = 0
      while (i < 60) {
        if (sums(i) > 0) out |= 1L << i
        i += 1
      }
      out
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** k-member minhash signature over a shingle array in one JVM pass: per
    * shingle ONE md5 (h = first 15 hex digits as a 60-bit int, reduced mod
    * P31), then sig[j] = min((a_j * h + b_j) mod P31). Constants come from
    * [[Portable.minhashA]]/[[Portable.minhashB]] — the same values the
    * oracle SQL embeds as literals, so signatures verify cell-for-cell.
    *
    * Composed-HOF formulations of this are quadratic in practice: Catalyst's
    * projection collapse inlines the base-hash array into every signature
    * member's lambda, recomputing all md5s k times per row.
    */
  case class MinHashSigExpr(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig needs array<string>, got $dt")
      }

    private lazy val as: Array[Long] = Portable.minhashA(k).toArray
    private lazy val bs: Array[Long] = Portable.minhashB(k).toArray

    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val sig = Array.fill(k)(Portable.P31) // > any hash value
      val md = MessageDigest.getInstance("MD5")
      var t = 0
      val n = arr.numElements()
      while (t < n) {
        md.reset()
        val digest = md.digest(arr.getUTF8String(t).getBytes)
        // first 15 hex digits = bytes 0..6 (14 digits) + high nibble of byte 7
        var h = 0L
        var bi = 0
        while (bi < 7) { h = (h << 8) | (digest(bi) & 0xffL); bi += 1 }
        h = (h << 4) | ((digest(7) & 0xf0L) >> 4)
        val hm = h % Portable.P31
        var j = 0
        while (j < k) {
          val cand = (as(j) * hm + bs(j)) % Portable.P31
          if (cand < sig(j)) sig(j) = cand
          j += 1
        }
        t += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Exact Jaccard of two string arrays (assumed distinct, as produced by
    * [[graft.operators.Dedup.shingles]]): hash-set membership count in one
    * JVM pass, then i / (|A| + |B| - i) in doubles — the identical
    * arithmetic the oracle's list_intersect formulation uses. Replaces
    * interpreted array_intersect at pair-join scale.
    */
  case class ArrayJaccardExpr(left: Expression, right: Expression) extends BinaryExpression
      with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"array_jaccard needs two array<string>, got $l, $r")
      }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val nx = x.numElements()
      val ny = y.numElements()
      val set = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](nx * 2)
      var i = 0
      while (i < nx) { set.add(x.getUTF8String(i)); i += 1 }
      var inter = 0
      i = 0
      while (i < ny) { if (set.contains(y.getUTF8String(i))) inter += 1; i += 1 }
      inter.toDouble / (nx.toDouble + ny.toDouble - inter.toDouble)
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Distinct word n-gram shingles in one JVM pass (insertion-ordered hash
    * set, one UTF8String concat per position) — semantics identical to
    * `array_distinct(transform(sequence(...), i => concat_ws(" ",
    * slice(words, i, n))))`, which evaluates as interpreted lambdas with a
    * per-position array copy and was the measured bottleneck of every
    * shingle-based operator. Short inputs (< n words) yield the whole text
    * as the single shingle, exactly like the HOF form and the oracle's
    * list_distinct formulation.
    */
  case class ShinglesExpr(child: Expression, n: Int, distinct: Boolean = true)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingles needs array<string>, got $dt")
      }

    override def nullSafeEval(v: Any): Any = {
      import org.apache.spark.unsafe.types.UTF8String
      val arr = v.asInstanceOf[ArrayData]
      val len = arr.numElements()
      val count = math.max(len - n + 1, 1)
      val sep = UTF8String.fromString(" ")
      // LinkedHashSet both dedupes and preserves first-seen order, so the
      // non-distinct variant just swaps in a plain list
      val seen: java.util.Collection[UTF8String] =
        if (distinct) new java.util.LinkedHashSet[UTF8String](count * 2)
        else new java.util.ArrayList[UTF8String](count)
      var i = 0
      while (i < count) {
        val m = math.min(n, len - i)
        val parts = new Array[UTF8String](m)
        var j = 0
        while (j < m) { parts(j) = arr.getUTF8String(i + j); j += 1 }
        seen.add(UTF8String.concatWs(sep, parts: _*))
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        seen.toArray.asInstanceOf[Array[AnyRef]])
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  // ------------------------------------------------------------ Column API

  def vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVecDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def simhash60(words: Column): Column =
    ColumnBridge.column(SimHash60Expr(ColumnBridge.expression(words)))

  def minhash_sig(shingles: Column, k: Int): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(shingles), k))

  def array_jaccard(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayJaccardExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def word_shingles(words: Column, n: Int): Column =
    ColumnBridge.column(ShinglesExpr(ColumnBridge.expression(words), n))

  /** Non-distinct word n-grams (the full multiset, first-to-last order) —
    * repetition statistics need every occurrence, not the set.
    */
  def word_ngrams(words: Column, n: Int): Column =
    ColumnBridge.column(ShinglesExpr(ColumnBridge.expression(words), n, distinct = false))
}

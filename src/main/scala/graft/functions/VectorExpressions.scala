package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Codegen'd dot product over two `array<double>` columns.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0d, _+_)` —
  * allocates an intermediate array and walks two higher-order lambdas per
  * row; inside an O(n²) similarity join that dominates the query. This
  * expression is one fused loop over the underlying ArrayData in both
  * interpreted and whole-stage-codegen paths (SURVEY.md §4.2: custom
  * `Expression` as the perf option; used by graft.ops.Similarity for
  * q25/q31/q32).
  *
  * Lives under org.apache.spark.sql because `AbstractDataType` and
  * `ExpressionUtils` are private[sql]; the public API is
  * [[graft.functions.VectorFunctions]].
  *
  * Null handling matches the built-ins: null if either side is null;
  * mismatched lengths fold over the shorter prefix (vectors in this engine
  * are fixed-dimension, so lengths always agree).
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Distinct w-word shingles of a space-split text, in one pass.
  *
  * The composable form — `array_distinct(transform(sequence(...),
  * i => concat_ws(" ", element_at(split(text), i), ...)))` — re-evaluates
  * `split(text)` inside EVERY `element_at` call (HOF lambda bodies are not
  * common-subexpression-eliminated), costing O(tokens²) splits per
  * document; and its lambda exprIds defeat plan canonicalization, so
  * self-joins recompute the whole chain per branch instead of sharing a
  * ReusedExchange. This expression is a plain deterministic unary op:
  * tokenizes once, emits first-occurrence-ordered distinct shingles, and
  * canonicalizes like any other expression.
  *
  * Matches `split(text, ' ')` semantics exactly (every single space is a
  * separator; empty tokens between consecutive spaces are kept), which
  * keeps the DuckDB oracle twins (STRING_SPLIT) valid.
  */
case class WordShingles(child: Expression, w: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with ExpectsInputTypes
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.types.StringType
  import org.apache.spark.unsafe.types.UTF8String

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val out = new java.util.LinkedHashSet[String]()
    var i = 0
    val last = toks.length - w
    val sb = new java.lang.StringBuilder
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out.add(sb.toString)
      i += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object VectorBridge {
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def wordShingles(text: Column, w: Int): Column =
    ExpressionUtils.column(WordShingles(ExpressionUtils.expression(text), w))
}

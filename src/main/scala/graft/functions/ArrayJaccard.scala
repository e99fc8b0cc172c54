package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}

/** Exact set-Jaccard of two arrays: |A∩B| / |A∪B| over the DISTINCT
  * elements, 0.0 when both are empty — identical semantics to
  * `size(array_intersect)/size(array_union)` (and DuckDB's
  * `list_intersect`/`list_distinct(list_concat)` mirror), but one
  * hash-set pass per row instead of two interpreted set-op expression
  * trees; the candidate-scoring join (q35) evaluates this over tens of
  * thousands of ~500-gram pairs, where the composed form dominated the
  * query (≈10 s → ≈4 s at sf0.1). Element type is any atomic type
  * with the two sides matching — strings for gram text, BIGINT for
  * the `word_text_gram_hashes` fingerprints q35 now scores with. */
case class ArrayJaccard(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _))
          if l == r && Seq(StringType, LongType, IntegerType).contains(l) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"array_jaccard needs two arrays of one of STRING/BIGINT/INT, got ${l.catalogString}, ${r.catalogString}")
    }

  private lazy val elemType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val et = elemType
    // UTF8String and the boxed numerics all hash/equal correctly
    val setA = new java.util.HashSet[Any](math.max(16, xs.numElements() * 2))
    var i = 0
    while (i < xs.numElements()) {
      if (!xs.isNullAt(i)) setA.add(xs.get(i, et))
      i += 1
    }
    val seenB = new java.util.HashSet[Any](math.max(16, ys.numElements() * 2))
    var inter = 0L
    var j = 0
    while (j < ys.numElements()) {
      if (!ys.isNullAt(j)) {
        val v = ys.get(j, et)
        if (seenB.add(v) && setA.contains(v)) inter += 1
      }
      j += 1
    }
    val union = setA.size.toLong + seenB.size.toLong - inter
    if (union == 0L) 0.0 else inter.toDouble / union.toDouble
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayJaccard =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "array_jaccard"
}

object ArrayJaccard {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("array_jaccard"),
    new ExpressionInfo(classOf[ArrayJaccard].getName, "array_jaccard"),
    (children: Seq[Expression]) => ArrayJaccard(children.head, children(1)))
}

package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Random-hyperplane LSH bucket code (sign-of-projection SimHash for
  * dense vectors; Charikar 2002) — the bucketed scale path for
  * similarity search: vectors whose cosine is high agree on most
  * hyperplane signs, so an equi-join on the bucket code finds
  * candidate neighbors without the O(n²) all-pairs scan.
  *
  * The K=8 hyperplanes are PSEUDO-random from a pure integer formula —
  * `plane(k, d) = ((A_k·(d+1) + B_k) mod 1009) / 1009 − 0.5` — so the
  * DuckDB oracle regenerates bit-identical planes with plain SQL
  * arithmetic (no RNG state to ship across engines). Projections
  * accumulate left-to-right in doubles on both engines → identical
  * signs.
  *
  * A native expression for the same reason as MinHashSigs: at scale
  * this runs per row over billions of 64-d vectors; the HOF-composed
  * form evaluates lambdas interpreted per element (512 boxed ops/row).
  */
case class HyperplaneLSH(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_lsh needs ARRAY<DOUBLE> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    var bucket = 0
    var k = 0
    while (k < HyperplaneLSH.K) {
      var dot = 0.0
      var d = 0
      while (d < dim) {
        dot += v.getDouble(d) * HyperplaneLSH.plane(k, d)
        d += 1
      }
      if (dot >= 0.0) bucket |= (1 << k)
      k += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneLSH =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_lsh"
}

object HyperplaneLSH {
  val K = 8
  val M = 1009L
  val A: Array[Long] = Array(37L, 41L, 43L, 47L, 53L, 59L, 61L, 67L)
  val B: Array[Long] = Array(7L, 11L, 13L, 17L, 19L, 23L, 29L, 31L)

  /** plane(k, d) ∈ (−0.5, 0.5), exactly reproducible in SQL. */
  def plane(k: Int, d: Int): Double =
    ((A(k) * (d + 1) + B(k)) % M).toDouble / M.toDouble - 0.5

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hyperplane_lsh"),
    new ExpressionInfo(classOf[HyperplaneLSH].getName, "hyperplane_lsh"),
    (children: Seq[Expression]) => HyperplaneLSH(children.head))
}

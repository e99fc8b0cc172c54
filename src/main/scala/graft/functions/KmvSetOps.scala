package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `kmv_set_est(a, b, k, domain_bits)` → STRUCT<union_est DOUBLE,
  * intersect_est DOUBLE, jaccard_est DOUBLE>: theta-sketch set
  * estimates from two [[KmvAgg]] sketches built with the SAME `k`
  * over the same hash domain [0, 2^domain_bits) — "how many distinct
  * documents do corpora A and B share" WITHOUT joining them, the set
  * operation that makes per-shard KMV sketches more than a
  * distinct counter (Dasgupta et al., "Theta-sketch framework",
  * 2016; the KMV form goes back to Bar-Yossef et al. 2002).
  *
  * θ = min over the two sketches of (the k-th smallest value when the
  * sketch is saturated, else the domain size M): below θ, EVERY value
  * of either underlying set is present in its sketch, so the retained
  * sets behave as a uniform sample at rate θ/M. Estimates:
  * |union retained < θ| · M/θ and |intersection retained < θ| · M/θ;
  * jaccard = their ratio. When NEITHER sketch is saturated (θ = M)
  * the sketches ARE the distinct sets and all three outputs are
  * EXACT. Deterministic arithmetic — with md5-derived hashes (q88's
  * convention, domain_bits = 60) a relational oracle re-derives the
  * identical values (q90).
  *
  * Null when either sketch is null. Inputs must be ascending-sorted
  * distinct arrays as `kmv_agg` emits; this is validated cheaply
  * (length ≤ k) and exploited (merge-walk, no hashing).
  */
case class KmvSetEst(a: Expression, b: Expression,
                     kExpr: Expression, bitsExpr: Expression)
    extends QuaternaryExpression with CodegenFallback {

  override def first: Expression = a
  override def second: Expression = b
  override def third: Expression = kExpr
  override def fourth: Expression = bitsExpr

  override def dataType: DataType = StructType(Seq(
    StructField("union_est", DoubleType, nullable = false),
    StructField("intersect_est", DoubleType, nullable = false),
    StructField("jaccard_est", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = {
    def isLongArray(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (!isLongArray(a.dataType) || !isLongArray(b.dataType))
      return TypeCheckResult.TypeCheckFailure(
        s"kmv_set_est needs two ARRAY<BIGINT> sketches, got " +
        s"${a.dataType.catalogString}, ${b.dataType.catalogString}")
    if (!kExpr.foldable || kExpr.dataType != IntegerType || kExpr.eval() == null ||
        kExpr.eval().asInstanceOf[Int] < 1)
      return TypeCheckResult.TypeCheckFailure(
        s"kmv_set_est k must be a foldable positive INT, got ${kExpr.sql}")
    if (!bitsExpr.foldable || bitsExpr.dataType != IntegerType ||
        bitsExpr.eval() == null || bitsExpr.eval().asInstanceOf[Int] < 1 ||
        bitsExpr.eval().asInstanceOf[Int] > 62)
      return TypeCheckResult.TypeCheckFailure(
        s"kmv_set_est domain_bits must be a foldable INT in [1, 62], got ${bitsExpr.sql}")
    TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val k: Int = kExpr.eval().asInstanceOf[Int]
  @transient private lazy val domain: Long = 1L << bitsExpr.eval().asInstanceOf[Int]

  override def nullSafeEval(av: Any, bv: Any, kv: Any, bitsv: Any): Any = {
    val xs = av.asInstanceOf[ArrayData]
    val ys = bv.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val m = ys.numElements()
    require(n <= k && m <= k,
      s"kmv_set_est: sketch larger than k=$k ($n / $m entries) — " +
      "was it built with a different k?")
    // ascending arrays ⇒ first/last bound every element: a signed
    // hash (raw xxhash64) or wrong domain_bits would otherwise yield
    // negative θ and silently-wrong estimates — fail loudly instead
    def checkDomain(arr: ArrayData, len: Int, side: String): Unit =
      if (len > 0) {
        require(!arr.isNullAt(0) && !arr.isNullAt(len - 1),
          s"kmv_set_est: $side sketch contains null entries")
        val lo = arr.getLong(0); val hi = arr.getLong(len - 1)
        require(lo >= 0L && hi < domain,
          s"kmv_set_est: $side sketch value out of domain [0, $domain): " +
          s"[$lo, $hi] — was it built with signed hashes or different domain_bits?")
      }
    checkDomain(xs, n, "left")
    checkDomain(ys, m, "right")
    // θ in hash units: a saturated sketch caps the trusted region at
    // its k-th value; an unsaturated sketch covers the whole domain
    val thetaA = if (n == k) xs.getLong(k - 1) else domain
    val thetaB = if (m == k) ys.getLong(k - 1) else domain
    val theta = math.min(thetaA, thetaB)
    require(theta > 0L,
      s"kmv_set_est: θ=0 (both sketches saturated at value 0) — " +
      "degenerate input, estimates undefined")
    // merge-walk the two ascending arrays counting distinct-union and
    // intersection strictly below θ
    var i = 0; var j = 0
    var union = 0L; var inter = 0L
    var last = Long.MinValue
    while ((i < n && xs.getLong(i) < theta) || (j < m && ys.getLong(j) < theta)) {
      val va = if (i < n && xs.getLong(i) < theta) xs.getLong(i) else Long.MaxValue
      val vb = if (j < m && ys.getLong(j) < theta) ys.getLong(j) else Long.MaxValue
      val v = math.min(va, vb)
      if (v != last) { union += 1; last = v }
      if (va == vb) { inter += 1; i += 1; j += 1 }
      else if (va < vb) i += 1
      else j += 1
    }
    val scale = domain.toDouble / theta.toDouble
    val unionEst = union * scale
    val interEst = inter * scale
    val jac = if (union == 0L) 0.0 else inter.toDouble / union.toDouble
    InternalRow(unionEst, interEst, jac)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): KmvSetEst =
    copy(a = newFirst, b = newSecond, kExpr = newThird, bitsExpr = newFourth)

  override def prettyName: String = "kmv_set_est"
}

object KmvSetEst {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kmv_set_est"),
    new ExpressionInfo(classOf[KmvSetEst].getName, "kmv_set_est"),
    (children: Seq[Expression]) => {
      require(children.length == 4,
        "kmv_set_est(sketch_a, sketch_b, k, domain_bits) takes exactly 4 arguments")
      KmvSetEst(children(0), children(1), children(2), children(3))
    })
}

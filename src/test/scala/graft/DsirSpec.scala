package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dsir

/** DSIR importance-weight semantics: sign separation between
  * target-like and source-like docs, gram accounting, empty-doc
  * neutrality, determinism across partitionings, and the bucket-count
  * guard. Absolute weights depend on md5 bucketing, so the pins are
  * structural (signs, ordering, exact re-computation) rather than
  * hand-derived constants. */
class DsirSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  // target docs speak 'alpha beta', source docs 'gamma delta'
  private val docs: Seq[(Long, String, String)] =
    (0L until 8L).map(i => (i, "alpha beta alpha beta alpha", "src0")) ++
    (8L until 24L).map(i => (i, "gamma delta gamma delta gamma", "srcX")) ++
    Seq((24L, "alpha beta gamma", "srcX"),   // mixed doc
        (25L, "", "srcX"))                   // no grams

  private def run(d: Seq[(Long, String, String)], b: Int = 4096): Map[Long, Row] =
    Dsir.importanceWeights(
        d.toDF("doc_id", "text", "source"), col("source") === "src0", buckets = b)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("target-like docs weigh positive, source-like negative, empty neutral; gram counts are 2t-1") {
    val r = run(docs)
    assert(r(0L).getLong(2) > 0 && r(0L).getLong(3) == 1)
    assert(r(8L).getLong(2) < 0 && r(8L).getLong(3) == 0)
    // 5 tokens → 5 unigrams + 4 bigrams
    assert(r(0L).getLong(1) == 9 && r(8L).getLong(1) == 9)
    // the mixed doc sits strictly between the pure ones
    assert(r(24L).getLong(2) > r(8L).getLong(2) && r(24L).getLong(2) < r(0L).getLong(2))
    assert(r(25L).getLong(1) == 0 && r(25L).getLong(2) == 0 && r(25L).getLong(3) == 0)
  }

  test("NULL text counts as an empty document (oracle parity: 0 grams, weight 0, not selected)") {
    val r = run(docs ++ Seq((40L, null.asInstanceOf[String], "srcX")))
    assert(r(40L).getLong(1) == 0 && r(40L).getLong(2) == 0 && r(40L).getLong(3) == 0)
  }

  test("weights are deterministic and partitioning-invariant (exact integer fold)") {
    val a = run(docs).map { case (k, r) => k -> r.getLong(2) }
    val b = Dsir.importanceWeights(
        docs.toDF("doc_id", "text", "source").repartition(7),
        col("source") === "src0")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a == b)
  }

  test("a doc's weight scales with how much target vocabulary it carries") {
    val r = run(docs ++ Seq(
      (30L, "alpha beta", "srcX"),
      (31L, "alpha beta alpha beta", "srcX")))
    // more target-gram mass, same sign, larger weight
    assert(r(31L).getLong(2) > r(30L).getLong(2) && r(30L).getLong(2) > 0)
  }

  test("bucket-count guard refuses degenerate dimensions") {
    val e = intercept[IllegalArgumentException](run(docs, b = 1))
    assert(e.getMessage.contains("buckets"))
  }

  test("train refuses degenerate slices: an empty target or source pool must fail, not gate silently (ADVICE r17)") {
    val df = docs.toDF("doc_id", "text", "source")
    // predicate matches nothing → no target grams → constant model
    val eT = intercept[IllegalArgumentException](
      Dsir.train(df, col("source") === "no-such-source"))
    assert(eT.getMessage.contains("target"))
    // predicate matches everything → no source grams
    val eS = intercept[IllegalArgumentException](Dsir.train(df, lit(true)))
    assert(eS.getMessage.contains("source"))
    // an all-empty-text corpus has no grams on either side
    val eE = intercept[IllegalArgumentException](
      Dsir.train(Seq((0L, "", "tgt"), (1L, "", "src")).toDF("doc_id", "text", "source"),
        col("source") === "tgt"))
    assert(eE.getMessage.contains("target"))
  }
}

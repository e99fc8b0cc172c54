package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.NgramLm

/** LM perplexity semantics: the fixed-point micro-nat log (the
  * cross-engine-exactness keystone), hand-computed Laplace bigram
  * cross-entropies pinning the TEXTBOOK formulation (denominator =
  * full unigram count, V = distinct unigrams — not prefix counts),
  * OOV behavior, under-2-token and empty docs, and the
  * language-without-reference regime. */
class NgramLmSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  // lp reference values: ⌊ln(k)·1e6 + 0.5⌋
  private val lp1 = 0L
  private val lp2 = 693147L
  private val lp3 = 1098612L
  private val lp4 = 1386294L

  test("lpMicroNats matches driver-side Math.log fixed point over a domain sweep") {
    val ks = (1L to 1000L) ++ Seq(12345L, 999999L, 5000000L, 123456789L)
    val got = ks.toDF("k").select(NgramLm.lpMicroNats(col("k")).as("lp"))
      .collect().map(_.getLong(0))
    val want = ks.map(k => math.floor(math.log(k.toDouble) * 1e6 + 0.5).toLong)
    assert(got.toSeq == want)
  }

  private def score(docs: Seq[(Long, String, String)]): Map[Long, Row] =
    NgramLm.perplexity(docs.toDF("doc_id", "text", "lang"), col("doc_id") % 10 === 0)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("hand-computed Laplace bigram cross-entropy; OOV; short/empty docs; ref-less language") {
    val rows = score(Seq(
      (0L, "a b a", "en"),   // the reference: c1(a)=2 (FULL count), c1(b)=1, V=2; c2(a b)=1, c2(b a)=1
      (1L, "a b c", "en"),   // [lp(2+2)-lp(1+1)] + [lp(1+2)-lp(0+1)]
      (2L, "q r", "en"),     // OOV prev: lp(0+2)-lp(0+1)
      (3L, "z", "en"),       // 1 token: no positions
      (4L, "", "en"),        // empty: no positions
      (5L, "a b", "fr")))    // no fr reference doc: V undefined → NULL score
    def xent(id: Long) = if (rows(id).isNullAt(3)) None else Some(rows(id).getLong(3))
    def nPos(id: Long) = rows(id).getLong(2)

    assert(nPos(1L) == 2 && xent(1L).contains((lp4 - lp2) + (lp3 - lp1)))
    assert(xent(1L).contains(1791759L)) // pins the textbook (full-count) denominator:
                                        // the prefix-count variant would read 1504077
    assert(nPos(2L) == 1 && xent(2L).contains(lp2))
    assert(nPos(3L) == 0 && xent(3L).isEmpty && rows(3L).isNullAt(4) && rows(3L).isNullAt(5))
    assert(nPos(4L) == 0 && xent(4L).isEmpty)
    assert(nPos(5L) == 1 && xent(5L).isEmpty,
      "a language with no reference docs has no LM — score must be NULL, not 0")
    // the reference doc scores against its own LM too
    assert(!rows(0L).isNullAt(3))
    // integer per-position form = xent div n_pos (1791759 div 2 = 895879)
    assert(rows(1L).getLong(4) == 895879L)
    // per-token mean = xent/n_pos/1e6 rounded to 6 (exact division here)
    assert(math.abs(rows(1L).getDouble(5) - 1791759.0 / 2 / 1e6) < 5e-7)
  }

  test("word_lm_entries ≡ the compositional gram-hash form (fused single scan, both modes)") {
    val texts = Seq("", "a", "a b", "a b c", "  Mixed CASE  tokens,42 and-more ",
      "日本語 then ascii", "a  b\t\tc\nd", "x" * 300 + " y") ++
      (0 until 200).map(i => Seq.fill(1 + i % 9)(s"t${i % 13}").mkString(" "))
    val df = texts.toDF("text")
    for (prefix <- Seq(true, false)) {
      val got = df.selectExpr(s"word_lm_entries(text, $prefix) AS e").collect()
        .map(_.getSeq[Row](0).map(r => (r.getInt(0), r.getLong(1))).sorted)
      val want = df.select(
          concat(
            transform(
              if (prefix)
                slice(graft.ops.Text.gramHashesOfText(col("text"), 1), lit(1),
                      size(graft.ops.Text.gramHashesOfText(col("text"), 2)))
              else graft.ops.Text.gramHashesOfText(col("text"), 1),
              h => struct(lit(0).as("kind"), h.as("h"))),
            transform(graft.ops.Text.gramHashesOfText(col("text"), 2),
              h => struct(lit(1).as("kind"), h.as("h")))).as("e"))
        .collect().map(_.getSeq[Row](0).map(r => (r.getInt(0), r.getLong(1))).sorted)
      assert(got.toSeq == want.toSeq, s"prefix_only=$prefix")
    }
  }

  test("NULL text scores like an empty document (oracle parity: n_pos 0, NULL xent)") {
    val rows = score(Seq((0L, "a b a", "en"), (1L, null.asInstanceOf[String], "en")))
    assert(rows(1L).getLong(2) == 0 && rows(1L).isNullAt(3) && rows(1L).isNullAt(4))
  }

  test("per-language LMs are independent: same text, different lang, different score") {
    val rows = score(Seq(
      (0L, "a b a b", "en"),
      (10L, "x y x y x y", "de"),
      (1L, "a b", "en"),
      (2L, "a b", "de")))   // 'a b' is fully OOV under the de LM
    assert(rows(1L).getLong(3) != rows(2L).getLong(3))
    // en: c1(a)=2, V=2, c2(a b)=2 → lp(4)-lp(3); de: OOV → lp(0+3)-lp(1) (V=2 for de {x,y}? x,y → V=2) → lp(2)...
    assert(rows(1L).getLong(3) == lp4 - lp3)
    assert(rows(2L).getLong(3) == lp2)
  }

  test("scoreRows (map-fold arm) ≡ score (relational) row-for-row on unique ids — every edge class (r18 A/B pin)") {
    // edge classes: reference-like, OOV, mixed, 1-token, empty, NULL
    // text, NULL lang, unknown lang, unicode, case folding, long text,
    // repeated grams
    val docs = Seq(
      (0L, "a b a b c a", "en"),           // reference doc (trains the en LM)
      (10L, "x y x z", "de"),              // reference doc (de LM)
      (1L, "a b c", "en"),
      (2L, "q r s t", "en"),               // fully OOV under en
      (3L, "z", "en"),                     // 1 token
      (4L, "", "en"),                      // empty
      (5L, null.asInstanceOf[String], "en"),
      (6L, "a b", null.asInstanceOf[String]),  // NULL lang: reattach-miss → n_pos 0
      (7L, "a b", "fr"),                   // language with no reference
      (8L, "  Mixed CASE a,b 42x ", "en"),
      (9L, "日本語 then a b ascii", "en"),
      (11L, "x y", "de"),
      (12L, ("a b " * 200).trim, "en")) ++
      (20L until 60L).map(i => (i, s"a tok${i % 5} b tok${(i * 3) % 5} c", "en"))
    val df = docs.toDF("doc_id", "text", "lang")
    val trained = NgramLm.train(df.filter(col("doc_id") % 10 === 0))
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.toString).orNull,
        r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3),
        if (r.isNullAt(4)) null else r.getLong(4),
        if (r.isNullAt(5)) null else r.getDouble(5))).sortBy(_._1).toSeq
    val relational = canon(NgramLm.score(df, trained))
    val mapFold = canon(NgramLm.scoreRows(df, trained))
    assert(trained.entries <= NgramLm.BroadcastEntries,
      "spec LM must sit in the map-fold regime for the A/B to bite")
    assert(mapFold == relational)
    // NULL-lang doc reads n_pos 0 on BOTH paths (the relational
    // reattach join never matches a NULL key — pinned so the map arm
    // can't 'improve' on it unilaterally)
    assert(relational.find(_._1 == 6L).get._3 == 0L)
    // the probe maps are rebuilt-free across calls (same broadcast)
    assert(trained.maps eq trained.maps)
  }

  test("LmScore doGenCode: generated scoring ≡ interpreted bit-for-bit, projection inside ONE whole-stage span (r19)") {
    val docs = Seq(
      (0L, "a b a b c a", "en"),
      (10L, "x y x z", "de"),
      (1L, "a b c", "en"),
      (2L, "q r s t", "en"),
      (3L, "z", "en"),
      (4L, "", "en"),
      (5L, null.asInstanceOf[String], "en"),
      (6L, "a b", null.asInstanceOf[String]),
      (7L, "a b", "fr"),
      (9L, "日本語 then a b ascii", "en")) ++
      (20L until 50L).map(i => (i, s"a tok${i % 5} b tok${(i * 3) % 5} c", "en"))
    val df = docs.toDF("doc_id", "text", "lang")
    val trained = NgramLm.train(df.filter(col("doc_id") % 10 === 0))
    assert(trained.entries <= NgramLm.BroadcastEntries,
      "spec LM must sit in the map-fold regime for the pin to bite")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.toString).orNull,
        r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3),
        if (r.isNullAt(4)) null else r.getLong(4),
        if (r.isNullAt(5)) null else r.getDouble(5))).sortBy(_._1).toSeq
    def withConfs(kvs: (String, String)*)(body: => Seq[Any]): Seq[Any] = {
      val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally old.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    // generated path, loud-fail: a doGenCode compile error must not
    // silently fall back to interpreted eval
    val gen = withConfs("spark.sql.codegen.fallback" -> "false",
        "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY")(
      canon(NgramLm.scoreRows(df, trained)))
    // interpreted path: whole-stage off AND expression codegen off
    val interp = withConfs("spark.sql.codegen.wholeStage" -> "false",
        "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")(
      canon(NgramLm.scoreRows(df, trained)))
    assert(gen == interp)
    // the r18 CodegenFallback split the projection OUT of whole-stage
    // codegen (CollapseCodegenStages excludes fallback expressions);
    // pin that the scoring projection now sits inside a span. A local
    // relation would constant-fold the whole plan away, so pin over a
    // parquet scan — the real q93 shape
    val pq = java.nio.file.Files.createTempDirectory("lmscore-cg").toString + "/docs"
    df.write.parquet(pq)
    val exec = NgramLm.scoreRows(spark.read.parquet(pq), trained)
      .queryExecution.executedPlan
    import org.apache.spark.sql.execution.{InputAdapter, ProjectExec, SparkPlan, WholeStageCodegenExec}
    // walk only the operators INSIDE a span — a node below an
    // InputAdapter is outside it (subtree toString would lie here: it
    // prints through the adapter, which is exactly how the r18 split
    // plan could still "contain" lm_score)
    def inSpan(p: SparkPlan): Seq[SparkPlan] = p match {
      case _: InputAdapter => Nil
      case other => other +: other.children.flatMap(inSpan)
    }
    val spanned = exec.collect {
      case w: WholeStageCodegenExec => inSpan(w.child) }.flatten
    assert(spanned.exists {
        case p: ProjectExec =>
          p.projectList.exists(_.exists(_.isInstanceOf[graft.functions.LmScore]))
        case _ => false
      },
      s"lm_score projection must be inside a WholeStageCodegen span:\n$exec")
  }

  test("scores are partitioning-invariant (exact integer aggregation, no float order hazard)") {
    val docs = (0L until 40L).map(i =>
      (i, s"tok${i % 7} tok${(i * 3) % 7} tok${(i * 5) % 7} tok${i % 7}", "en"))
    val base = score(docs).map { case (k, r) => k -> r.getLong(3) }
    val re = NgramLm.perplexity(
        docs.toDF("doc_id", "text", "lang").repartition(13), col("doc_id") % 10 === 0)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(base == re)
  }
}

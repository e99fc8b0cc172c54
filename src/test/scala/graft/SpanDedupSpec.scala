package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{ChunkDedup, SpanDedup}

/** Substring-span dedup semantics: the overlapping shingle grid, the
  * covered-by-any-keeper block rule (a block dies only when EVERY
  * w-word context containing it was seen before), arbitrary-offset
  * duplicate removal that chunk dedup cannot express, the s = w
  * degeneration to [[ChunkDedup]], and the native `word_spans` scan
  * against its HOF composition. */
class SpanDedupSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], w: Int, s: Int)
      : Map[Long, (Long, Long, Long, String)] =
    SpanDedup.dedup(docs.toDF("doc_id", "text"), "text", "doc_id", w, s)
      .collect()
      .map { case Row(id: Long, n: Long, d: Long, k: Long, t: String) =>
        id -> (n, d, k, t) }
      .toMap

  test("word_spans emits one (block, span) per stride block; spans overlap and truncate at the end") {
    val rows = Seq("a b c d e").toDF("text")
      .select(expr("word_spans(text, 4, 2)").as("sp"))
      .selectExpr("inline(sp)")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(
      ("a b", "a b c d"), ("c d", "c d e"), ("e", "e")))
  }

  test("word_spans keeps empty tokens and yields one empty block for the empty string") {
    val rows = Seq("", "a  b ").toDF("text")
      .select(col("text"), expr("word_spans(text, 2, 1)").as("sp"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[Row](1).map(x => (x.getString(0), x.getString(1))))
      .toMap
    assert(rows("") == Seq(("", "")))
    // "a  b " splits to [a, '', b, ''] — repeated/trailing spaces kept
    assert(rows("a  b ") == Seq(
      ("a", "a "), ("", " b"), ("b", "b "), ("", "")))
  }

  test("word_spans matches the split/slice/join HOF composition on awkward inputs") {
    val texts = Seq("", " ", "  ", "x", "a b", "a b c", "a b c d e f g",
      "a  b   c d ", " leading", "trailing ", "a b c d e f g h i j k")
    for ((w, s) <- Seq((4, 2), (6, 3), (3, 1), (2, 2))) {
      val df = texts.toDF("text")
      val native = df.selectExpr(s"word_spans(text, $w, $s) AS sp").collect()
        .map(_.getSeq[Row](0).map(x => (x.getString(0), x.getString(1))))
      val composed = df.selectExpr(
        s"""transform(
           |  sequence(0, CAST(greatest(ceil(size(split(text, ' ', -1)) / $s.0), 1) AS INT) - 1),
           |  q -> struct(
           |    array_join(slice(split(text, ' ', -1), q * $s + 1, $s), ' ') AS block,
           |    array_join(slice(split(text, ' ', -1), q * $s + 1, $w), ' ') AS span)) AS sp
           |""".stripMargin).collect()
        .map(_.getSeq[Row](0).map(x => (x.getString(0), x.getString(1))))
      assert(native.toSeq == composed.toSeq, s"mismatch at w=$w s=$s")
    }
  }

  test("a block survives if ANY covering span is a keeper") {
    // doc 0 plants "c d e f"; doc 1 repeats it at the same stride
    // phase. In doc 1 the span starting at "c d" is a duplicate, but
    // the span starting at "x y" (covering blocks "x y" and "c d") is
    // unique — so block "c d" survives while "e f" (covered only by
    // dup spans... ) is dropped only if all ITS spans are dups.
    val r = run(Seq(
      (0L, "c d e f g h"),
      (1L, "x y c d e f")), w = 4, s = 2)
    // doc 1 spans: "x y c d"(unique), "c d e f"(dup of doc 0 span),
    // "e f"(tail — unique: doc 0's tail span at same text is "g h").
    // All three blocks covered by ≥1 keeper → nothing removed.
    assert(r(1L) == ((3L, 1L, 3L, "x y c d e f")))
    assert(r(0L) == ((3L, 0L, 3L, "c d e f g h")))
  }

  test("arbitrary-offset duplicated region is removed when phases align (the case q73 misses)") {
    // a 8-word region R planted at word offset 0 in doc 0 and offset
    // 2 in doc 1 — same phase mod s=2, but DIFFERENT chunk-grid
    // alignment for w=4 chunks, so ChunkDedup(w=4) sees distinct
    // chunks while SpanDedup removes the interior
    val R = "r1 r2 r3 r4 r5 r6 r7 r8"
    val docs = Seq(
      (0L, s"$R t0 t1"),
      (1L, s"p0 p1 $R u0 u1"))
    val span = run(docs, w = 4, s = 2)
    // doc 1 blocks: [p0 p1][r1 r2][r3 r4][r5 r6][r7 r8][u0 u1]
    // spans: "p0 p1 r1 r2"(uniq) "r1 r2 r3 r4"(dup) "r3 r4 r5 r6"(dup)
    //        "r5 r6 r7 r8"(dup) "r7 r8 u0 u1"(uniq) "u0 u1"(uniq)
    // covered: p0p1✓(s0) r1r2✓(s0) r3r4✗ r5r6✗ r7r8✓(s4) u0u1✓
    assert(span(1L) == ((6L, 3L, 4L, "p0 p1 r1 r2 r7 r8 u0 u1")))
    // chunk dedup at the same width removes NOTHING from doc 1: its
    // 4-word grid cuts R at different offsets in the two docs
    val chunk = ChunkDedup.dedup(docs.toDF("doc_id", "text"), "text", "doc_id", w = 4)
      .collect().map { case Row(id: Long, n: Long, k: Long, t: String) => id -> (n, k, t) }
      .toMap
    assert(chunk(1L)._1 == chunk(1L)._2, "chunk grid should miss the shifted region")
  }

  test("an identical later document fully dedups to empty text") {
    val r = run(Seq((0L, "a b c d e f"), (1L, "a b c d e f")), w = 4, s = 2)
    assert(r(0L) == ((3L, 0L, 3L, "a b c d e f")))
    assert(r(1L) == ((3L, 3L, 0L, "")))
    // empty documents behave the same way: first kept, second removed
    val e = run(Seq((0L, ""), (1L, "")), w = 4, s = 2)
    assert(e(0L) == ((1L, 0L, 1L, "")))
    assert(e(1L) == ((1L, 1L, 0L, "")))
  }

  test("a NULL-text document scores as an empty document instead of vanishing from the report") {
    val r = run(Seq((0L, ""), (1L, null.asInstanceOf[String])), w = 4, s = 2)
    assert(r.contains(1L), "every input document must yield a report row")
    // it shares the empty doc's (single empty block) span group
    assert(r(0L) == ((1L, 0L, 1L, "")))
    assert(r(1L) == ((1L, 1L, 0L, "")))
  }

  test("s = w degenerates to ChunkDedup's grid") {
    val docs = Seq(
      (0L, "h1 h2 h3 h4 body a b c"),
      (1L, "h1 h2 h3 h4 other text x"),
      (2L, "h1 h2 h3 h4"))
    val span = run(docs, w = 4, s = 4)
    val chunk = ChunkDedup.dedup(docs.toDF("doc_id", "text"), "text", "doc_id", w = 4)
      .collect().map { case Row(id: Long, n: Long, k: Long, t: String) => id -> (n, k, t) }
      .toMap
    for ((id, (n, _, k, t)) <- span)
      assert(chunk(id) == ((n, k, t)), s"doc $id: span=$k/$n '$t' vs chunk=${chunk(id)}")
  }

  test("width not a multiple of stride is refused") {
    assertThrows[IllegalArgumentException] {
      SpanDedup.dedup(Seq((0L, "a b")).toDF("doc_id", "text"), "text", "doc_id", w = 5, s = 2)
    }
    assert(intercept[Exception] {
      Seq("a b").toDF("text").selectExpr("word_spans(text, 5, 2)").collect()
    }.getMessage.contains("multiple"))
  }
}

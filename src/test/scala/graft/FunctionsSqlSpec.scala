package graft

import org.scalatest.funsuite.AnyFunSuite

/** The engine's SQL surface contract (SURVEY §2.10): every function
  * GraftSession injects via `injectFunction` — plus the `vec_mean`
  * UDAF — must be callable from plain `spark.sql` TEXT, not just the
  * Column API (`call_function` resolves through a different path than
  * the SQL parser, so only a textual query proves the registration).
  * One minimal query per function with a sanity-checked value: a
  * renamed identifier, changed arity, or dropped injection breaks
  * loudly here instead of in a user's notebook. */
class FunctionsSqlSpec extends AnyFunSuite with SparkTestSession {

  private def one(sql: String): Any = spark.sql(sql).head().get(0)

  test("text functions are callable from spark.sql") {
    assert(one("SELECT word_tokens('alpha beta gamma')")
      .asInstanceOf[scala.collection.Seq[_]].size == 3)
    assert(one("SELECT word_ngrams(word_tokens('a b c'), 2)")
      .asInstanceOf[scala.collection.Seq[_]].size == 2)
    assert(one("SELECT word_text_ngrams('a b c', 2)")
      .asInstanceOf[scala.collection.Seq[_]].size == 2)
    assert(one("SELECT word_text_gram_hashes('a b c', 2)")
      .asInstanceOf[scala.collection.Seq[_]].size == 2)
    // distinct form collapses the repeated bigram
    assert(one("SELECT word_text_gram_hashes_distinct('a b a b a b', 2)")
      .asInstanceOf[scala.collection.Seq[_]].distinct.size <
        one("SELECT word_text_gram_hashes('a b a b a b', 2)")
          .asInstanceOf[scala.collection.Seq[_]].size)
    assert(one("SELECT word_chunks('a b c d', 2)")
      .asInstanceOf[scala.collection.Seq[_]].size == 2)
    assert(one("SELECT size(word_spans('a b c d e', 4, 2))") == 3)
    // full form: t unigrams + t-1 bigrams; prefix form: 2(t-1)
    assert(one("SELECT size(word_lm_entries('a b c', false))") == 5)
    assert(one("SELECT size(word_lm_entries('a b c', true))") == 4)
    assert(one("SELECT word_marker_counts('the cat saw the dog', array('the', 'cat'))")
      .asInstanceOf[scala.collection.Seq[Long]] == Seq(2L, 1L))
    // 'a b' repeats 3x in 5 bigrams
    assert(one("SELECT repetition_stats('a b a b a b').top_bigram") == 3L)
    assert(one("SELECT clean_spaces('  a \t b  ')") == "a b")
    assert(one("SELECT nfc_normalize('café')") == "café")
    assert(one("SELECT pii_scrub('mail me at a@b.com').clean_text")
      .asInstanceOf[String].contains("<EMAIL>"))
    assert(one("""SELECT json_field('{"k": "v"}', 'k')""") == "v")
  }

  test("hashing / sketch functions are callable from spark.sql") {
    assert(one("SELECT minhash_sigs('some longer text with shingles in it')")
      .asInstanceOf[scala.collection.Seq[_]].size == 4)
    assert(one("SELECT simhash32(word_tokens('a b c'))") != null)
    assert(one("SELECT double_order_bits(2.0d) > double_order_bits(1.0d)") == true)
    // morton: lat bit b -> z bit 2b, lon bit b -> z bit 2b+1
    assert(one("SELECT interleave_bits(1L, 2L)") == 9L)
    val code = one("SELECT hyperplane_lsh(array(1.0d, 0.5d, -0.25d), 4)")
      .asInstanceOf[Number].longValue()
    assert(code >= 0L && code < 16L)
    assert(one("SELECT hyperplane_codes(array(1.0d, 0.5d, -0.25d), 4, 2)")
      .asInstanceOf[scala.collection.Seq[_]].size == 2)
  }

  test("vector functions are callable from spark.sql") {
    assert(one("SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))") == 11.0)
    val j = one("SELECT array_jaccard(array(1L, 2L), array(2L, 3L))")
      .asInstanceOf[Double]
    assert(math.abs(j - 1.0 / 3.0) < 1e-12)
    // idx is the 0-based position of the best-dot codebook row
    assert(one("SELECT argmax_dot(array(0.0d, 1.0d), array(array(1.0d, 0.0d), array(0.0d, 1.0d))).idx") == 1L)
  }

  test("aggregate functions are callable from spark.sql") {
    assert(one("SELECT bloom_might_contain(b, xxhash64('x')) FROM " +
      "(SELECT bloom_agg(xxhash64(v), 1024, 3) AS b FROM VALUES ('x'), ('y') t(v))")
      == true)
    // exact whole-vector aggregate: elements come back as DECIMALs
    assert(one("SELECT cast(vec_decimal_sum(v) AS array<double>) FROM " +
      "VALUES (array(1.0d, 2.0d)), (array(3.0d, 4.0d)) t(v)")
      .asInstanceOf[scala.collection.Seq[Double]] == Seq(4.0, 6.0))
    assert(one("SELECT vec_mean(v) FROM VALUES (array(1.0d, 2.0d)), (array(3.0d, 4.0d)) t(v)")
      .asInstanceOf[scala.collection.Seq[Double]] == Seq(2.0, 3.0))
    // best-first array of (payload, order, tie) structs, k-bounded
    val top = spark.sql(
      "SELECT bounded_topk(struct(v, s), s, v, 2) AS t FROM " +
        "VALUES ('a', 1.0d), ('b', 3.0d), ('c', 2.0d) t(v, s)")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(top.size == 2 && top.head.getString(0) == "b" && top(1).getString(0) == "c")
    // KMV: k smallest DISTINCT values, ascending (7L repeats, null skipped)
    assert(one("SELECT kmv_agg(v, 3) FROM " +
      "VALUES (9L), (7L), (7L), (3L), (CAST(NULL AS BIGINT)), (5L) t(v)")
      .asInstanceOf[scala.collection.Seq[Long]] == Seq(3L, 5L, 7L))
    // Misra-Gries: (item, count) structs, count-desc; exact under k
    val mg = spark.sql("SELECT mg_agg(v, 8) FROM " +
      "VALUES ('a'), ('b'), ('a') t(v)").head().getSeq[org.apache.spark.sql.Row](0)
    assert(mg.map(r => r.getString(0) -> r.getLong(1)) == Seq("a" -> 2L, "b" -> 1L))
  }
}

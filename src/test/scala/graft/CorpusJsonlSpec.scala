package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.sources.CorpusJsonl

/** JSONL corpus interchange: the round-trip must be row-level
  * lossless (ids, text payloads, types) — the aggregate carrier q78
  * checks cross-parser format validity; this pins full fidelity. */
class CorpusJsonlSpec extends AnyFunSuite with SparkTestSession {

  test("gzip jsonl round-trip is row-level lossless") {
    val dataDir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val dir = CorpusJsonl.dirFor(dataDir)
    assert(dir != CorpusJsonl.dirFor(dataDir + "-other"),
      "landing dir must differ per source data dir (concurrent-run isolation)")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val back = CorpusJsonl.roundTrip(docs, dataDir)
    assert(CorpusJsonl.lastDir == dir, "lastDir must record the landing dir for the oracle")
    assert(back.schema == docs.schema, "schema drifted through jsonl")
    val a = docs.orderBy("doc_id").collect().toSeq
    val b = back.orderBy("doc_id").collect().toSeq
    assert(a == b, "rows drifted through jsonl")
    // shards really are gzip jsonl on disk
    val files = new java.io.File(dir).listFiles.map(_.getName)
    assert(files.exists(_.endsWith(".json.gz")), files.mkString(","))
  }
}

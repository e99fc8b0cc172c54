package graft.sources

import org.apache.spark.sql.DataFrame

/** JSON-lines corpus interchange — the format training corpora
  * actually ship in (one JSON object per line, gzip-compressed
  * shards). The engine writes shards with Spark's JSON sink and reads
  * them back with an EXPLICIT schema (never inference — a schema
  * inferred per-shard drifts the moment one shard lacks a field, the
  * classic jsonl trap).
  *
  * The q78 carrier oracles the WRITE path through an independent
  * parser: DuckDB `read_json` consumes the exact shards Spark landed,
  * so a green hash proves the emitted JSON is standard — escaping,
  * unicode, and numeric formatting included — not merely that Spark
  * can read what Spark wrote. */
object CorpusJsonl {
  /** Landing dir derived from (user, source data dir): two runs on
    * one host — two users, or one user benching sf0.1 while verifying
    * sf0.01 — land in DIFFERENT dirs instead of clobbering each
    * other's `mode("overwrite")` shards mid-oracle-read. */
  def dirFor(dataDir: String): String =
    graft.core.ArtifactDirs.dirFor("graft_q78_jsonl", dataDir)

  /** Dir of the most recent [[roundTrip]] in this JVM — what the q78
    * oracle SQL must point at. `Verify` dumps `oracleSql` AFTER
    * running the queries, so by dump time this holds the dir the q78
    * shards actually landed in. */
  @volatile private var lastDirVar: String = dirFor("")
  def lastDir: String = lastDirVar

  /** Land `docs` as gzip jsonl shards derived from `dataDir`, then
    * read them back with the source frame's schema. */
  def roundTrip(docs: DataFrame, dataDir: String): DataFrame = {
    val dir = dirFor(dataDir)
    lastDirVar = dir
    docs.write.mode("overwrite").option("compression", "gzip").json(dir)
    docs.sparkSession.read.schema(docs.schema).json(dir)
  }
}

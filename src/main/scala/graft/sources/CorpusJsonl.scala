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
  val Q78Dir = "/tmp/graft_q78_jsonl"

  /** Land `docs` as gzip jsonl shards at `dir`, then read them back
    * with the source frame's schema. */
  def roundTrip(docs: DataFrame, dir: String = Q78Dir): DataFrame = {
    docs.write.mode("overwrite").option("compression", "gzip").json(dir)
    docs.sparkSession.read.schema(docs.schema).json(dir)
  }
}

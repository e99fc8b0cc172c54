package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity-search operators over embedding columns.
  *
  * Two regimes, as a 100 TB pipeline needs:
  *  - [[cosineTopK]]: brute-force scan against ONE probe vector
  *    (broadcast scalar + projection + TakeOrderedAndProject) — right
  *    when probes are few; cost is one pass over the corpus.
  *  - [[bucketed]] + [[bucketJoin]]: random-hyperplane LSH code per
  *    vector, then many-to-many candidate generation via an equi-join
  *    on the bucket — shuffle keys are bucket codes, never all-pairs.
  *    Exact cosine is then computed only on candidates.
  */
object Similarity {
  /** Dot product via the native [[graft.functions.ArrayDot]] — same
    * left-to-right accumulation as `aggregate(zip_with(...))` and
    * DuckDB's `list_dot_product`, minus the interpreted lambdas. */
  def dot(a: Column, b: Column): Column = call_function("array_dot", a, b)

  /** Cosine between two ARRAY<DOUBLE> columns (same expression shape
    * as the q27 oracle: dot / (|a|·|b|), left-to-right accumulation). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** LSH bucket code (native [[graft.functions.HyperplaneLSH]]). */
  def bucket(vec: Column): Column = call_function("hyperplane_lsh", vec)

  /** Attach the bucket code to an embeddings frame. */
  def bucketed(emb: DataFrame, vecCol: String = "embedding"): DataFrame =
    emb.withColumn("bucket", bucket(col(vecCol).cast("array<double>")))

  /** Candidate pairs from the bucket equi-join (id1 < id2), scored
    * with exact cosine. At scale: repartition by bucket, skew handled
    * by AQE; candidate count — not corpus² — bounds the work. */
  def bucketJoin(emb: DataFrame, idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    val b = bucketed(emb, vecCol)
      .select(col(idCol), col("bucket"), col(vecCol).cast("array<double>").as("v"))
    val l = b.select(col(idCol).as("id1"), col("bucket"), col("v").as("v1"))
    val r = b.select(col(idCol).as("id2"), col("bucket"), col("v").as("v2"))
    l.join(r, Seq("bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("bucket"),
              cosine(col("v1"), col("v2")).as("cosine"))
  }

  /** IVF coarse quantization: assign every vector to its
    * nearest-by-dot-product centroid. Centroids are themselves rows of
    * the corpus (ids < k — deterministic, no RNG to ship to an
    * oracle); a production deployment would k-means them, the
    * assignment plan is identical. Broadcast centroids × corpus scan,
    * window rank 1 — one pass, no shuffle of the corpus beyond the
    * per-vector top-1 selection. Probe-time search then touches only
    * the probe's cluster (`nprobe` clusters generally). */
  def ivfAssign(emb: DataFrame, k: Int, idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val typed = emb.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
    val centroids = typed.filter(col(idCol) < k)
      .select(col(idCol).as("centroid"), col("v").as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(desc("dot"), asc("centroid"))
    typed.crossJoin(broadcast(centroids))
      .select(col(idCol), col("centroid"), dot(col("v"), col("cv")).as("dot"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("centroid"), col("dot"))
  }

  /** Brute-force top-k against one probe vector. */
  def cosineTopK(emb: DataFrame, probeId: Long, k: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val typed = emb.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
    val probe = typed.filter(col(idCol) === probeId)
      .select(col("v").as("qv"), sqrt(dot(col("v"), col("v"))).as("qnorm"))
    typed.filter(col(idCol) =!= probeId).crossJoin(broadcast(probe))
      .select(col(idCol),
              (dot(col("v"), col("qv")) / (sqrt(dot(col("v"), col("v"))) * col("qnorm")))
                .as("cosine"))
      .orderBy(desc("cosine"), asc(idCol))
      .limit(k)
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, InsertableRelation}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Z-ordered landing as a DataSource V2 WRITE path — the declarative
  * form of the layout ZOrderLandingSpec proves out (2-D grid locality
  * collapsed onto a 1-D partition key so box queries prune):
  *
  *   df.write.format("zland")
  *     .option("path", dir)
  *     .option("lat_col", "lat_idx").option("lon_col", "lon_idx")
  *     .option("bucket_shift", "6")
  *     .mode("overwrite")          // or "append" for incremental drops
  *     .save()
  *
  * The write computes `z = interleave_bits(lat, lon)` (the native
  * Morton expression, q71) and lands parquet partitioned by
  * `z_bucket = z >> bucket_shift`. It is deliberately a THIN V2→V1
  * bridge (`V1Write.toInsertableRelation`, the same bridge Spark's
  * own JDBC v2 uses): the actual file commit is Spark's parquet sink
  * — task-temp rename semantics, partition overwrite rules, all of it
  * — rather than a reimplemented writer, so the DSv2 surface adds the
  * layout contract, not a new storage engine.
  *
  * Reads go through the plain parquet source, where `z_bucket` IS a
  * partition column — [[ZOrderLanding.boxScan]] derives the box's
  * bucket set driver-side and the scan prunes to exactly those
  * directories (pinned by ZOrderLandingSpec).
  */
class ZLandingProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "zland"
  // write-only source: the table takes the incoming frame's schema
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException(
      "zland is a write-side source; read the landed dir with the parquet source " +
        "(z_bucket is a partition column there) or ZOrderLanding.boxScan")
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new ZLandingTable(schema, new CaseInsensitiveStringMap(properties))
}

final class ZLandingTable(tableSchema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsWrite {
  override def name(): String = s"zland(${options.getOrDefault("path", "")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, ignored: Boolean): Unit =
              ZOrderLanding.land(
                data,
                Option(options.get("path")).getOrElse(
                  sys.error("zland: option 'path' is required")),
                latCol = options.getOrDefault("lat_col", "lat_idx"),
                lonCol = options.getOrDefault("lon_col", "lon_idx"),
                bucketShift = options.getOrDefault("bucket_shift", "6").toInt,
                overwrite = overwrite,
                extraPartitionCols = Option(options.get("partition_extra"))
                  .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
                  .getOrElse(Nil))
          }
      }
    }
}

/** The landing/scan pair behind the `zland` source — also directly
  * callable. */
object ZOrderLanding {

  /** Land `df` at `dir` partitioned by the coarse Morton bucket of
    * (`latCol`, `lonCol`) — optionally UNDER other partition columns
    * (e.g. an ingest's observation month: `month=…/z_bucket=…`), so
    * one landing layout serves both temporal and spatial pruning.
    * Deterministic layout: same inputs → same directories, so
    * re-lands are idempotent under overwrite.
    *
    * The write hash-REPARTITIONS on the partition columns first, so
    * (a) every partition directory gets exactly ONE file regardless of
    * how many input tasks carried its rows (without this, file count =
    * input tasks × directories — the small-files problem at scale, and
    * at bench scale 4 fetch tasks each wrote 12 month-files
    * sequentially), (b) writes parallelize across the combos instead
    * of serializing inside each input task, and (c) the DIRECTORY SET
    * and the one-file-per-dir property are functions of the DATA
    * alone (`repartition(n, cols…)` is REPARTITION_BY_NUM — AQE never
    * coalesces it); the shuffle width and part-file NAMES still
    * follow session parallelism, so "layout" here means the directory
    * tree and file count, not byte identity. Trade-off, documented:
    * one task per combo means a pathologically hot bucket serializes
    * into one writer — size `bucketShift` so buckets stay balanced
    * (the same discipline any dynamic-partition landing needs).
    *
    * Rows SORT by `z` within each file (a narrow sortWithinPartitions
    * — partition cols lead so the dynamic-partition writer needs no
    * extra sort of its own): parquet row-group min/max stats on
    * z/lat_idx/lon_idx then support intra-bucket skipping, which is
    * the point of Morton clustering once a bucket holds many row
    * groups at the 100 TB design point.
    *
    * Commits task-side ([[graft.core.Committers.TaskCommitV2]])
    * only under mode=overwrite, where the re-run clears a failed
    * job's partial output wholesale; append landings have no
    * dedup-on-read consumer, so they keep the atomic v1 committer. */
  def land(df: DataFrame, dir: String, latCol: String = "lat_idx",
           lonCol: String = "lon_idx", bucketShift: Int = 6,
           overwrite: Boolean = false,
           extraPartitionCols: Seq[String] = Nil): Unit = {
    val partCols = extraPartitionCols :+ "z_bucket"
    val width = math.max(1, df.sparkSession.sparkContext.defaultParallelism)
    df.withColumn("z", call_function("interleave_bits", col(latCol), col(lonCol)))
      .withColumn("z_bucket", shiftright(col("z"), bucketShift))
      .repartition(width, partCols.map(col): _*)
      .sortWithinPartitions((partCols :+ "z").map(col): _*)
      .write.partitionBy(partCols: _*)
      .options(graft.core.Committers.forRerun(overwrite))
      .mode(if (overwrite) "overwrite" else "append")
      .parquet(dir)
  }

  /** Driver-side Morton interleave — must match the native
    * `interleave_bits` bit-for-bit (GridSpec/ZOrderLandingSpec pin
    * the native side) across the full 32 index bits per coordinate,
    * not just the 8 the reference grid happens to use: a 2-D domain
    * wider than 256 cells would otherwise silently diverge from the
    * landed `z_bucket` values and boxScan would drop matching rows. */
  def morton(lat: Long, lon: Long): Long = {
    var z = 0L
    var b = 0
    while (b < 32) {
      z |= ((lat >> b) & 1L) << (2 * b)
      z |= ((lon >> b) & 1L) << (2 * b + 1)
      b += 1
    }
    z
  }

  /** The bucket set a lat/lon box touches. */
  def boxBuckets(la0: Long, la1: Long, lo0: Long, lo1: Long,
                 bucketShift: Int = 6): Seq[Long] =
    (for (la <- la0 to la1; lo <- lo0 to lo1) yield morton(la, lo) >> bucketShift)
      .distinct.sorted

  /** Box query over a landed dir: the bucket set becomes a PARTITION
    * filter (only those directories are opened), the exact box
    * predicate re-applies on the survivors. */
  def boxScan(spark: SparkSession, dir: String,
              la0: Long, la1: Long, lo0: Long, lo1: Long,
              latCol: String = "lat_idx", lonCol: String = "lon_idx",
              bucketShift: Int = 6): DataFrame =
    spark.read.parquet(dir)
      .filter(col("z_bucket").isin(boxBuckets(la0, la1, lo0, lo1, bucketShift): _*) &&
              col(latCol).between(la0, la1) && col(lonCol).between(lo0, lo1))
}

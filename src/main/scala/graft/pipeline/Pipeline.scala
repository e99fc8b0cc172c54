package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.cache.ResultCache
import graft.ops.{Clean, Quality}
import graft.sources.ErddapSource

/** Single-file CSV writes (S5): the reference's artifacts are single
  * CSV files (`df.to_csv(path, index=False)`, `extract.py:357-359`,
  * `transform.py:37-38`), so the Spark part-file is moved to the
  * requested path after a coalesce(1) write. Only stage artifacts and
  * dashboard exports go through here — bulk data stays parquet. */
object CsvIo {
  def writeSingle(df: DataFrame, path: String): Unit = {
    val target = Paths.get(path)
    Option(target.getParent).foreach(Files.createDirectories(_))
    val tmp = Files.createTempDirectory("graft-csv")
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true")
      // pandas writes naive-looking UTC timestamps; match the shape
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(tmp.toString)
    val part = Files.list(tmp).filter(p => p.getFileName.toString.startsWith("part-"))
      .findFirst().orElseThrow(() => new IllegalStateException(s"no part file in $tmp"))
    Files.move(part, target, StandardCopyOption.REPLACE_EXISTING)
    deleteRecursive(tmp)
  }

  private[pipeline] def deleteRecursive(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[Path]()).forEach(Files.delete(_))
      finally s.close()
    }
}

/** Stage gates (`run_pipeline.py:51-157`): each validator returns the
  * facts it observed; a [[PipelineOrchestrator]] turns violated gates
  * into failures. */
object Gates {
  final case class GateFailure(stage: String, reason: String)
      extends RuntimeException(s"[$stage] $reason")

  /** Raw-data gate (`run_pipeline.py:55-75`, enforced at 178-181):
    * file exists and has rows. */
  def validateRaw(spark: SparkSession, path: String): Map[String, Any] = {
    if (!Files.exists(Paths.get(path)))
      throw GateFailure("extract", s"Raw data file not found: $path")
    val df = spark.read.option("header", "true").csv(path)
    val rows = df.count()
    if (rows == 0) throw GateFailure("extract", "Extracted data is empty")
    Map("row_count" -> rows, "column_count" -> df.columns.length,
        "columns" -> df.columns.toSeq)
  }

  /** Clean-data gate (`run_pipeline.py:77-115`, enforced at 203-204):
    * required columns present; null counts observed. */
  def validateClean(spark: SparkSession, path: String): Map[String, Any] = {
    if (!Files.exists(Paths.get(path)))
      throw GateFailure("transform", s"Clean data file not found: $path")
    val df = spark.read.option("header", "true").csv(path)
    val required = Seq("time", "temperature", "salinity")
    val missing = required.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      throw GateFailure("transform", s"Missing required columns: ${missing.mkString(", ")}")
    val nullCounts = df.select(
      df.columns.toSeq.map(c => count(when(col(c).isNull, 1)).as(c)): _*)
      .collect().head
    Map("row_count" -> df.count(),
        "columns" -> df.columns.toSeq,
        "null_counts" -> df.columns.zipWithIndex.map { case (c, i) => c -> nullCounts.getLong(i) }.toMap)
  }

  /** The reference's "database" is a durable file (DuckDB); Spark's
    * in-memory catalog dies with the session even though saveAsTable's
    * parquet survives in the warehouse dir. Re-attach the surviving
    * parquet as a view so a fresh JVM (e.g. `--validate-only`) sees the
    * table, matching the reference's cross-process durability. */
  def recoverFromWarehouse(spark: SparkSession, table: String): Boolean = {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val path = Paths.get(warehouse, table)
    if (Files.isDirectory(path)) {
      spark.read.parquet(path.toString).createOrReplaceTempView(table)
      true
    } else false
  }

  /** Database gate (`run_pipeline.py:117-157`): table exists (S10 SHOW
    * TABLES), has rows, schema + sample probes (DESCRIBE / LIMIT 5). */
  def validateTable(spark: SparkSession, table: String): Map[String, Any] = {
    val inCatalog = spark.catalog.tableExists(table) || recoverFromWarehouse(spark, table)
    val tables = spark.catalog.listTables().collect().map(_.name)
    if (!inCatalog)
      throw GateFailure("load", s"$table table not found in database")
    val df = spark.table(table)
    val rows = df.count()
    if (rows == 0) throw GateFailure("load", s"$table is empty")
    Map("tables" -> tables.toSeq, "row_count" -> rows,
        "columns" -> df.columns.toSeq,
        "sample_rows" -> df.limit(5).count())
  }
}

/** The reference's three-stage ETL orchestrator
  * (`run_pipeline.py:160-305`): extract → transform → load, fail-fast,
  * each stage gated, artifacts on disk between stages exactly as in
  * the reference (stage boundaries are files, for debuggability — the
  * data is ≤72 rows/query; bulk analytics never go through this path).
  */
final class PipelineOrchestrator(
    spark: SparkSession,
    source: ErddapSource,
    dataDir: String,
    cache: Option[ResultCache] = None) {

  val rawPath: String = s"$dataDir/sea_surface_sample.csv"
  val cleanPath: String = s"$dataDir/clean/sea_surface_clean.csv"
  val tableName = "sea_surface"

  /** EXTRACT (`run_pipeline.py:171-188` → `extract.py:340-364`): fetch
    * the reference's fixed point, clean, quality-report, cache, land
    * as the raw CSV artifact. Returns the quality report. */
  def extract(lat: Double = 32.5, lon: Double = -70.0,
              start: String = "1960-01-01", end: String = "1960-02-01")
      : Quality.QualityReport = {
    val (snappedLat, snappedLon) = graft.core.Grid.snap(lat, lon)
    val cached = cache.flatMap(_.get(snappedLat, snappedLon, start, end,
                                     graft.sources.ErddapUrl.DefaultVariables))
    val cleaned = cached.getOrElse {
      val (body, _) = source.fetchRaw(lat, lon, start, end)
      val df = Clean.cleanApiResponse(source.toRawDataFrame(spark, body))
      // cache only non-empty results (the reference guards with
      // `if use_cache and not df_clean.empty`, extract.py:179): an
      // empty API response must not be replayed for the next 24 h
      if (!df.isEmpty)
        cache.foreach(_.put(snappedLat, snappedLon, start, end,
                            graft.sources.ErddapUrl.DefaultVariables, df))
      df
    }
    val report = Quality.report(cleaned)
    CsvIo.writeSingle(cleaned, rawPath)
    Gates.validateRaw(spark, rawPath)
    report
  }

  /** TRANSFORM (`run_pipeline.py:190-212` → `transform.py:30-41`). */
  def transform(): Map[String, Any] = {
    val raw = spark.read.option("header", "true").csv(rawPath)
    CsvIo.writeSingle(Clean.cleanTransform(raw), cleanPath)
    Gates.validateClean(spark, cleanPath)
  }

  /** LOAD (`run_pipeline.py:214-236` → `load.py:11-25`): CTAS with
    * IGNORE-if-exists semantics (`CREATE TABLE IF NOT EXISTS`). */
  def load(): Map[String, Any] = {
    val clean = Clean.cleanTransform(
      spark.read.option("header", "true").csv(cleanPath))
    clean.write.mode(SaveMode.Ignore).saveAsTable(tableName)
    Gates.validateTable(spark, tableName)
  }

  /** S7: the dashboard's ordered scan (`app.py:93-115`). */
  def orderedScan(): DataFrame = spark.table(tableName).orderBy("time")

  /** Full pipeline, fail-fast, then final re-validation of all three
    * artifacts (`run_pipeline.py:238-305`). */
  def runAll(): Map[String, Any] = {
    val report = extract()
    transform()
    load()
    Map(
      "quality_score" -> report.qualityScore,
      "raw" -> Gates.validateRaw(spark, rawPath),
      "clean" -> Gates.validateClean(spark, cleanPath),
      "db" -> Gates.validateTable(spark, tableName))
  }
}

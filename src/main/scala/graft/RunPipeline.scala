package graft

import graft.cache.ResultCache
import graft.core.GraftSession
import graft.pipeline.{Gates, PipelineOrchestrator}
import graft.sources.{ErddapSource, ErddapUrl, FixtureBackend, HttpBackend, SourceBackend}

/** CLI mirroring `run_pipeline.py:307-377`:
  *
  *   graft.RunPipeline [--step extract|transform|load] [--validate-only]
  *                     [--data-dir DIR] [--fixture CSVFILE]
  *
  * Default runs the full pipeline. `--fixture` replays a recorded
  * ERDDAP CSV body instead of live HTTP (zero-egress runs and tests);
  * without it the live HttpBackend is used. */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    val opts = parse(args.toList, Map.empty)
    val dataDir = opts.getOrElse("data-dir", "data")
    val spark = GraftSession.build("graft-pipeline")
    val backend: SourceBackend = opts.get("fixture") match {
      case Some(path) =>
        val body = new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
        val url = ErddapUrl.build(32.5, -70.0, "1960-01-01", "1960-02-01")
        new FixtureBackend(Map(url -> body))
      case None => new HttpBackend
    }
    val source = new ErddapSource(backend)
    val cache = new ResultCache(spark, s"$dataDir/cache")
    val p = new PipelineOrchestrator(spark, source, dataDir, Some(cache))

    try {
      val result: Map[String, Any] =
        if (opts.contains("validate-only"))
          Map("raw" -> Gates.validateRaw(spark, p.rawPath),
              "clean" -> Gates.validateClean(spark, p.cleanPath),
              "db" -> Gates.validateTable(spark, p.tableName))
        else opts.get("step") match {
          case Some("extract") => Map("quality" -> p.extract())
          case Some("transform") => p.transform()
          case Some("load") => p.load()
          case Some(other) => sys.error(s"unknown --step $other")
          case None => p.runAll()
        }
      println(s"[pipeline] OK: $result")
      spark.stop()
    } catch {
      case e: Exception =>
        System.err.println(s"[pipeline] FAILED: ${e.getMessage}")
        spark.stop()
        sys.exit(1)
    }
  }

  @annotation.tailrec
  private def parse(args: List[String], acc: Map[String, String]): Map[String, String] =
    args match {
      case "--step" :: v :: rest => parse(rest, acc + ("step" -> v))
      case "--data-dir" :: v :: rest => parse(rest, acc + ("data-dir" -> v))
      case "--fixture" :: v :: rest => parse(rest, acc + ("fixture" -> v))
      case "--validate-only" :: rest => parse(rest, acc + ("validate-only" -> "true"))
      case Nil => acc
      case other :: _ => sys.error(s"unknown argument: $other")
    }
}

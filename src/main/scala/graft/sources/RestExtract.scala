package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Paged-REST ingestion (SURVEY §2 G10) — the Spark-first shape of the
  * reference's Extract stage, which pages a Socrata feed with
  * `$limit`/`$offset` and accumulates rows in a driver-side list
  * (airflow.py:71-85 `extract_mobile_food_schedule`/`.._permit`,
  * airflow.py:92-131 Yelp Fusion enrichment).
  *
  * The re-expression splits that into the two halves a 100 TB deployment
  * needs kept apart:
  *
  *  1. **Fetch → landing zone** ([[land]]): a serial paging loop — paging
  *     an HTTP API is inherently sequential — that writes each raw page
  *     verbatim to durable storage via the Hadoop FS API (`file:/`,
  *     `hdfs:/`, `s3a://` — same targets as every other writer here).
  *     The driver never parses or accumulates rows; a page is streamed
  *     out as bytes. Crashed runs re-land idempotently (overwrite).
  *  2. **Landing zone → typed table** ([[read]]): Spark's parallel JSON
  *     reader over the landed pages with an EXPLICIT schema (inference
  *     would be an extra full pass — `Tables` doc) and FAILFAST by
  *     default: a feed that drifts from the contract fails the extract
  *     task (retryably, under [[graft.pipeline.Orchestrator]]) instead of
  *     leaking nulls into the warehouse.
  *
  * The sandbox has no network, so the only [[PageFetcher]] shipped is the
  * fixture-backed one; an HTTP implementation is a ~5-line subclass at
  * deploy time. Everything downstream of the trait — paging, landing,
  * schema enforcement, pipeline wiring — is real and spec'd
  * (SourcesSpec, PipelineSpec).
  */
object RestExtract {

  /** One page of an external feed: the raw JSON body for `offset..offset+limit`,
    * or None when the feed is exhausted. Implementations wrap the actual
    * transport (HTTP client, fixture files, an in-memory slice). */
  trait PageFetcher {
    def fetch(offset: Long, limit: Int): Option[String]
  }

  /** Fixture-backed fetcher: serves `page-<offset>.json` files from a local
    * directory — the stand-in for a live API in tests and sandboxed runs. */
  final case class FileFetcher(dir: String) extends PageFetcher {
    def fetch(offset: Long, limit: Int): Option[String] = {
      val f = new java.io.File(dir, s"page-$offset.json")
      if (!f.isFile) None
      else Some(new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  /** In-memory fetcher over pre-rendered JSON lines — pages a row slice the
    * way Socrata pages a resource (`$offset` stepping by `$limit`). */
  final case class RowsFetcher(jsonRows: IndexedSeq[String]) extends PageFetcher {
    def fetch(offset: Long, limit: Int): Option[String] = {
      if (offset >= jsonRows.length) None
      else Some(jsonRows.slice(offset.toInt, math.min(offset + limit, jsonRows.length).toInt)
        .mkString("", "\n", "\n"))
    }
  }

  /** Per-REQUEST bounded exponential backoff (the reference retries only
    * at task level, airflow.py:92-131 — one flaky page there re-runs the
    * whole extract): a transient fetch failure retries in place with
    * deterministic base·2^attempt sleeps, so one 429/timeout costs
    * milliseconds, not a full re-land. Exhausted retries rethrow — the
    * task-level retry (Orchestrator) stays the outer guard. */
  private[sources] def fetchWithBackoff(fetcher: PageFetcher, offset: Long,
      limit: Int, maxRetries: Int, baseBackoffMs: Long): Option[String] = {
    var attempt = 0
    while (true) {
      try return fetcher.fetch(offset, limit)
      catch {
        case scala.util.control.NonFatal(e) =>
          if (attempt >= maxRetries)
            throw new java.io.IOException(
              s"fetch(offset=$offset) failed after ${maxRetries + 1} attempts", e)
          Thread.sleep(baseBackoffMs << attempt) // base·2^attempt, bounded
          attempt += 1
      }
    }
    None // unreachable
  }

  /** Serial paging loop: fetch pages until exhaustion (or `maxPages`, a
    * runaway-feed guard) and land each verbatim as
    * `landingDir/page-<offset>.json`. Returns the number of pages landed.
    * Raw-first landing is deliberate: the source of truth for reprocessing
    * is the bytes the API served, not whatever this engine version parsed
    * out of them. */
  def land(spark: SparkSession, fetcher: PageFetcher, landingDir: String,
           limit: Int = 1000, maxPages: Int = 10000,
           maxRetries: Int = 4, baseBackoffMs: Long = 200L): Int = {
    require(limit > 0, s"page limit must be positive, got $limit")
    val dir = new Path(landingDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)
    var offset = 0L
    var pages = 0
    var done = false
    while (!done && pages < maxPages) {
      fetchWithBackoff(fetcher, offset, limit, maxRetries, baseBackoffMs) match {
        case Some(body) if body.trim.nonEmpty =>
          val out = fs.create(new Path(dir, s"page-$offset.json"), true)
          try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
          pages += 1
          offset += limit
        case _ => done = true
      }
    }
    pages
  }

  /** Parse the landed pages into a typed table. FAILFAST (default) turns
    * any row that does not match `schema` into an extract-task failure;
    * `failFast = false` gives the PERMISSIVE null-filling read for
    * exploratory use. */
  def read(spark: SparkSession, landingDir: String, schema: StructType,
           failFast: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .json(landingDir)

  /** Land + read: the full extract of one feed. */
  def extract(spark: SparkSession, fetcher: PageFetcher, landingDir: String,
              schema: StructType, limit: Int = 1000): DataFrame = {
    land(spark, fetcher, landingDir, limit)
    read(spark, landingDir, schema)
  }
}

package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** G16 — copy-on-write snapshot table: the table-format surface (ACID
  * upsert-in-place, deletes, time travel, history) the r7 verdict listed
  * as the one forward-looking gap. Scope is the Delta/Iceberg *mechanism*
  * re-expressed minimally and Spark-first — not a wire-compatible clone:
  *
  *  - **Layout**: `<dir>/data/v{N}-{i}.parquet` immutable data files;
  *    `<dir>/_log/v{N}/` a PARQUET manifest per version (file name, row
  *    count, key min/max, op). The log is itself a Spark-readable table —
  *    no bespoke JSON machinery, and a 100k-file manifest is just another
  *    small DataFrame.
  *  - **Commit protocol — optimistic concurrency**: data files land first
  *    under attempt-unique names (`v{N}-{token}-{i}.parquet`, token a
  *    per-attempt nonce, so two writers racing to the same version can
  *    never overwrite each other's data), then the manifest is staged
  *    under `_log/_stage-v{N}-{token}` and ATOMICALLY RENAMED to
  *    `_log/v{N}` — the rename is the compare-and-swap commit point: the
  *    filesystem accepts exactly one rename to a given version directory,
  *    so the first committer wins and every later committer of the same
  *    version fails the rename, rolls back its own staged manifest and
  *    data files, and raises a clean ConcurrentModificationException
  *    telling the caller to re-read the (now newer) snapshot and retry —
  *    the Delta/Iceberg optimistic-conflict contract. A reader resolves
  *    max committed N (the `_SUCCESS` marker inside the renamed manifest)
  *    and sees either the old or the new version, never a torn one. (On
  *    an object store the rename becomes the one conditional put /
  *    metastore swap, exactly where Delta puts its log entry.)
  *  - **Copy-on-write MERGE**: update keys are stat-pruned against the
  *    manifest's per-file key ranges (file-count-sized table, broadcast),
  *    then exactly the files CONTAINING a matched key are rewritten;
  *    untouched files carry over by reference. Matched rows are replaced,
  *    unmatched update rows append as inserts. Stats are range-complete,
  *    so the candidate scan is also the complete matched/insert split —
  *    no full-table scan (at 100 TB the rewrite cost is proportional to
  *    files touched, the whole point of COW).
  *  - **DELETE**: predicate rows are removed by rewriting only the files
  *    that contain them (SQL semantics: NULL-predicate rows are kept).
  *  - **Time travel**: `read(s, dir, version)` pins any committed
  *    manifest; `history` reads the full log.
  *
  * Files within a commit are bucketed by fixed-width key ranges computed
  * from the commit's exact key bounds — deterministic (no sampling), and
  * it gives every file a tight disjoint key range, which is what makes
  * the min/max pruning in MERGE (and SnapshotTableSpec's scan-pruning
  * assertion) effective.
  */
object SnapshotTable {

  /** VACUUM ↔ commit coordination: a fair per-table read/write lock.
    * Every mutating operation that READS table state before writing
    * (merge/delete/compact/restore) holds the table's READ lease for its
    * whole duration; vacuum takes the WRITE side — a read-barrier that
    * waits for in-flight commits to land and holds new ones out while it
    * deletes. So a long-running MERGE can no longer lose its candidate
    * files to a concurrent `vacuum(retainVersions=1)` mid-read — the
    * r11/r12 comment documented that FileNotFound path as accepted; now
    * the barrier closes it (spec: vacuum-during-merge). Write-preference
    * comes from fairness: queued vacuums block later lease requests, so
    * a commit stream cannot starve storage reclamation. The lock also
    * serializes vacuum against other vacuums (two delete loops racing
    * over one retention set could each observe a half-deleted log).
    *
    * JVM-local, like the rename-CAS itself in this local-FS
    * implementation — on an object store both the CAS and this barrier
    * become the catalog's job (conditional puts + commit leases). Plain
    * `read()` callers stay under the standard retention contract (Delta
    * semantics): a reader holding a years-old version past the retention
    * window can still lose files; set retainVersions above the longest
    * reader's version lag. */
  private val tableLocks =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.locks.ReentrantReadWriteLock]()
  private def lockFor(dir: String) = tableLocks.computeIfAbsent(
    new java.io.File(dir).getAbsolutePath,
    _ => new java.util.concurrent.locks.ReentrantReadWriteLock(true))
  private def withCommitLease[T](dir: String)(body: => T): T = {
    val l = lockFor(dir).readLock(); l.lock()
    try body finally l.unlock()
  }

  /** Raised when a writer loses the version CAS: another writer committed
    * the same version number first. The losing attempt's staged manifest
    * and data files are already rolled back when this is thrown — re-read
    * the latest snapshot and retry the operation on top of it. */
  final class ConcurrentCommitException(dir: String, v: Int)
    extends java.util.ConcurrentModificationException(
      s"snapshot table $dir: version $v was committed by a concurrent " +
        "writer; re-read the latest snapshot and retry")

  private def logDir(dir: String) = s"$dir/_log"
  private def manifestDir(dir: String, v: Int) = s"${logDir(dir)}/v$v"

  /** Per-commit-attempt nonce: makes data file and staging names unique
    * across racing writers (and across retries of the same writer). */
  private def newToken(): String = java.util.UUID.randomUUID().toString.take(8)

  /** Largest committed version, or -1 for "not a table". */
  def latestVersion(dir: String): Int = {
    val log = new java.io.File(logDir(dir))
    val vs = Option(log.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("v") &&
        new java.io.File(f, "_SUCCESS").isFile)
      .map(_.getName.drop(1).toInt)
    if (vs.isEmpty) -1 else vs.max
  }

  /** The version-N manifest: (file, rows, key_min, key_max, op). */
  def manifest(s: SparkSession, dir: String, v: Int): DataFrame =
    s.read.parquet(manifestDir(dir, v))

  /** Committed manifests are IMMUTABLE (the rename-CAS is the only way a
    * version appears), so a version's file list and its commits' schemas
    * are cacheable per JVM — without this every read()/changeFeed() pays
    * a Spark collect job per manifest touch, and at sf1 those micro-jobs,
    * not the change-sized scan, dominated q_table_cdf's wall (r15 verdict
    * #4). The mtime of the version directory keys out the one mutation
    * that exists: a test deleting and recreating a table at the same
    * path. Values are file-name lists / StructTypes — trivially small. */
  private val fileListCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Long), Seq[String]]()
  private val commitSchemaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Long), org.apache.spark.sql.types.StructType]()
  private def versionKey(dir: String, v: Int): (String, Int, Long) = {
    val abs = new java.io.File(dir).getAbsolutePath
    (abs, v, new java.io.File(manifestDir(dir, v)).lastModified())
  }
  /** The version's file names, via the immutable-manifest cache. */
  def cachedFiles(s: SparkSession, dir: String, v: Int): Seq[String] = {
    val k = versionKey(dir, v)
    val hit = fileListCache.get(k)
    if (hit != null) hit
    else { // compute OUTSIDE the map lock: the collect is a Spark job
      val names = manifest(s, dir, v).select("file").collect().map(_.getString(0)).toSeq
      fileListCache.putIfAbsent(k, names)
      names
    }
  }

  /** Land `df` as `filesPerCommit` data files for version `v`, bucketed
    * by fixed-width key ranges over the commit's exact bounds, each file
    * sorted by key. Returns the manifest entries. */
  private def landFiles(s: SparkSession, dir: String, df: DataFrame,
                        key: String, v: Int, op: String,
                        filesPerCommit: Int, token: String): DataFrame = {
    import s.implicits._
    // Commit-sized by contract — pin it so the bounds agg and the data
    // write don't each re-execute the caller's (possibly expensive)
    // producing plan; the agg is the materializing job.
    val pinned = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val b = pinned.agg(min(col(key)).cast("long"), max(col(key)).cast("long")).head()
    if (b.isNullAt(0)) return Seq.empty[(String, Long, Long, Long, String)]
      .toDF("file", "rows", "key_min", "key_max", "op")
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val width = math.max(1L, (hi - lo) / filesPerCommit + 1)
    // ONE write job for every bucket (the per-bucket filter+coalesce loop
    // cost one full job per file — the r11 f_stream_upsert profile showed
    // per-merge job COUNT, not bytes, dominating): hash-repartition on
    // the bucket id puts each bucket's rows in exactly one task, and
    // partitionBy splits colliding buckets into their own directories, so
    // every bucket still lands as one key-sorted file.
    val tmp = s"$dir/_tmp_v$v-$token"
    pinned.withColumn("__b", ((col(key).cast("long") - lo) / width).cast("int"))
      .repartition(filesPerCommit, col("__b"))
      .sortWithinPartitions(col("__b"), col(key))
      .write.partitionBy("__b").mode("overwrite").parquet(tmp)
    val entries = (0 until filesPerCommit).flatMap { i =>
      val bucketDir = Paths.get(s"$tmp/__b=$i")
      val parts: Seq[java.nio.file.Path] =
        if (!Files.isDirectory(bucketDir)) Seq.empty
        else {
          val st = Files.list(bucketDir)
          try {
            import scala.jdk.CollectionConverters._
            st.filter(_.toString.endsWith(".parquet")).iterator().asScala.toSeq
          } finally st.close()
        }
      // One file per bucket is the landing contract (repartition puts a
      // bucket's rows in exactly one task). A session config like
      // spark.sql.files.maxRecordsPerFile can make that task SPLIT its
      // output — moving only findFirst() and deleting the tmp dir would
      // then silently drop the sibling files' rows from the committed
      // version. Fail the commit here, before the CAS, with the cause.
      require(parts.size <= 1,
        s"landFiles: bucket __b=$i produced ${parts.size} parquet files " +
          "(one expected) — a writer split setting (e.g. " +
          "spark.sql.files.maxRecordsPerFile) is incompatible with the " +
          "one-file-per-bucket landing contract; aborting before commit")
      val part = parts.headOption
      if (part.isDefined) {
        val name = s"v$v-$token-$i.parquet"
        Files.createDirectories(Paths.get(s"$dir/data"))
        Files.move(part.get, Paths.get(s"$dir/data/$name"),
          StandardCopyOption.REPLACE_EXISTING)
        Some(name)
      } else None // empty bucket → no file
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    if (entries.isEmpty) return Seq.empty[(String, Long, Long, Long, String)]
      .toDF("file", "rows", "key_min", "key_max", "op")
    // per-file stats from the files as written (what a reader will see)
    s.read.parquet(entries.map(n => s"$dir/data/$n"): _*)
      .groupBy(input_file_name().as("path"))
      .agg(count(lit(1)).as("rows"),
        min(col(key)).cast("long").as("key_min"),
        max(col(key)).cast("long").as("key_max"))
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        col("rows"), col("key_min"), col("key_max"), lit(op).as("op"))
    } finally pinned.unpersist()
  }

  /** The CAS commit: stage the manifest under an attempt-unique name,
    * then atomically rename it to `_log/v{N}`. rename(2) to an existing
    * directory fails, so exactly one writer per version succeeds; a loser
    * rolls back its staged manifest AND its token's data files, then
    * raises [[ConcurrentCommitException]] — no torn state either way. */
  private def commit(s: SparkSession, dir: String, v: Int,
                     entries: DataFrame, token: String): Unit = {
    val stage = s"${logDir(dir)}/_stage-v$v-$token"
    entries.coalesce(1).write.mode("overwrite").parquet(stage)
    try Files.move(Paths.get(stage), Paths.get(manifestDir(dir, v)),
      StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: java.nio.file.FileSystemException =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stage))
        Option(new java.io.File(s"$dir/data").listFiles()).getOrElse(Array.empty)
          .filter(_.getName.startsWith(s"v$v-$token-"))
          .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
        // distinguish "lost the race" from a genuine IO fault
        if (new java.io.File(manifestDir(dir, v), "_SUCCESS").isFile)
          throw new ConcurrentCommitException(dir, v)
        else throw e
    }
  }

  /** Create version 0 from `df`, keyed (for stats + merge) on the long
    * column `key`. */
  def create(s: SparkSession, dir: String, df: DataFrame, key: String,
             filesPerCommit: Int = 4): Unit = {
    require(latestVersion(dir) < 0, s"$dir is already a snapshot table")
    val token = newToken()
    commit(s, dir, 0,
      landFiles(s, dir, df, key, 0, "create", filesPerCommit, token), token)
  }

  /** Snapshot read. `version < 0` = latest. Filters/projections push into
    * the parquet scans as usual; only the manifest's files are listed.
    * `mergeSchema` is on: after a schema-evolving merge the carried-over
    * files legitimately lack the new columns (they read as NULL — the
    * evolution contract); the footer-merge cost is per-file-count, which
    * the manifest already bounds. */
  def read(s: SparkSession, dir: String, version: Int = -1): DataFrame = {
    val v = if (version >= 0) version else latestVersion(dir)
    require(v >= 0, s"$dir has no committed version")
    val files = cachedFiles(s, dir, v)
    if (files.isEmpty) s.read.parquet() // empty table → empty relation
    else s.read.option("mergeSchema", "true")
      .parquet(files.map(n => s"$dir/data/$n"): _*)
  }

  /** The data files (full paths) actually selected for a read of
    * `version` after pruning to key range [lo, hi] via manifest stats —
    * the file-skipping a format's stats exist for. */
  def prunedFiles(s: SparkSession, dir: String, lo: Long, hi: Long,
                  version: Int = -1): Seq[String] = {
    val v = if (version >= 0) version else latestVersion(dir)
    manifest(s, dir, v)
      .filter(col("key_min") <= hi && col("key_max") >= lo)
      .select("file").collect().map(r => s"$dir/data/${r.getString(0)}").toSeq
  }

  /** MERGE INTO (upsert): rows of `updates` whose key exists replace the
    * stored row; the rest insert. Copy-on-write at file granularity.
    *
    * `evolve = true` permits SCHEMA EVOLUTION: columns present only in
    * `updates` are APPENDED to the table schema; untouched files carry
    * over without rewrite (their rows read the new columns as NULL via
    * the mergeSchema read — add-column costs manifest metadata, never a
    * table rewrite). Columns may only be added, never dropped or
    * retyped; with `evolve = false` (default) extra update columns are
    * rejected rather than silently dropped. */
  def merge(s: SparkSession, dir: String, updates: DataFrame, key: String,
            filesPerCommit: Int = 4, evolve: Boolean = false): Unit = withCommitLease(dir) {
    val token = newToken()
    val v = latestVersion(dir)
    require(v >= 0, s"$dir has no committed version")
    val baseSchema = read(s, dir, v).schema
    val baseCols = baseSchema.fieldNames
    val extraCols = updates.columns.filterNot(baseCols.contains)
    require(evolve || extraCols.isEmpty,
      s"updates carry new columns ${extraCols.mkString(",")}; pass evolve=true to add them")
    val man = manifest(s, dir, v).persist()
    // The update frame feeds FOUR consumers (key pruning, the matched
    // semi, the insert anti, the rewrite union); without a pin each one
    // re-executes the caller's whole update computation — for a streaming
    // foreachBatch MERGE that re-ran the batch aggregation three times
    // per commit. Updates are delta-sized by the operator's contract;
    // MEMORY_AND_DISK spills if a caller hands a table-sized delta.
    val upd = updates.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // The try opens HERE, immediately after the pins: actions run while
    // building cand/affectedNames below, and an exception on any of them
    // must still unpersist every block (the landFiles pattern) — the old
    // shape leaked man/upd/cand for the session on a mid-build failure.
    var cand: DataFrame = null
    try {
    man.count()
    val updKeys = upd.select(col(key)).distinct()
    // Phase 1 — stat pruning: files whose [key_min, key_max] contains at
    // least one update key. The manifest is file-count-sized → broadcast
    // side of a range join against the (possibly huge) update key set.
    val candNames = updKeys
      .join(broadcast(man),
        col(key) >= col("key_min") && col(key) <= col("key_max"), "inner")
      .select("file").distinct().collect().map(_.getString(0))
    val candPaths = candNames.map(n => s"$dir/data/$n")
    // Phase 2 — exact: scan ONLY candidates; stats are range-complete, so
    // this scan decides both the affected-file set and the matched/insert
    // split of the updates. The file name is captured in a projection
    // DIRECTLY over the scan — input_file_name() is only defined in the
    // scan stage and silently returns "" after a join. mergeSchema is
    // MANDATORY here: after a schema-evolving merge the candidate set can
    // mix pre- and post-evolution files, and a single-footer schema
    // inference would silently drop evolved columns from survivors —
    // permanent data loss on rewrite.
    cand = if (candPaths.isEmpty) null
      else s.read.option("mergeSchema", "true").parquet(candPaths: _*)
        .withColumn("__file", element_at(split(input_file_name(), "/"), -1))
        .persist()
    val affectedNames: Set[String] = if (cand == null) Set.empty
      else cand.join(updKeys, Seq(key), "left_semi")
        .select("__file").distinct().collect().map(_.getString(0)).toSet
    val survivors = if (affectedNames.isEmpty) None
      else Some(cand.filter(col("__file").isin(affectedNames.toSeq: _*))
        .drop("__file").join(updKeys, Seq(key), "left_anti"))
    val matched = if (cand == null) None
      else Some(upd.join(cand.select(col(key)), Seq(key), "left_semi"))
    val inserts = if (cand == null) upd
      else upd.join(cand.select(col(key)), Seq(key), "left_anti")
    // evolved schema = base columns ++ update-only columns (append-only);
    // frames lacking a column (survivors during evolution, or a later
    // merge not carrying a previously-evolved column) take NULL. The
    // NULL's type resolves from the table's CURRENT schema first —
    // `updates` need not mention every table column.
    val outCols = baseCols ++ extraCols
    def conform(df: DataFrame): DataFrame = df.select(outCols.map { c =>
      if (df.columns.contains(c)) col(c)
      else {
        val dt = if (baseSchema.fieldNames.contains(c)) baseSchema(c).dataType
                 else updates.schema(c).dataType
        lit(null).cast(dt).as(c)
      }
    }.toIndexedSeq: _*)
    val newData = (survivors.toSeq ++ matched.toSeq :+ inserts)
      .map(conform).reduce(_ unionByName _)
    val fresh = landFiles(s, dir, newData, key, v + 1, "merge", filesPerCommit, token)
    val carried = man.filter(!col("file").isin(affectedNames.toSeq: _*))
      .select(col("file"), col("rows"), col("key_min"), col("key_max"),
        lit("merge").as("op"))
    commit(s, dir, v + 1, carried.unionByName(fresh), token)
    } finally {
      if (cand != null) cand.unpersist()
      upd.unpersist()
      man.unpersist()
    }
  }

  /** DELETE WHERE `cond` (SQL semantics: NULL-predicate rows are kept),
    * rewriting only files that contain matching rows. */
  def delete(s: SparkSession, dir: String, cond: Column, key: String,
             filesPerCommit: Int = 4): Unit = withCommitLease(dir) {
    val token = newToken()
    val v = latestVersion(dir)
    require(v >= 0, s"$dir has no committed version")
    val man = manifest(s, dir, v).persist()
    man.count()
    val all = read(s, dir, v)
    val affectedNames = all.filter(cond)
      .select(input_file_name().as("p")).distinct()
      .collect().map(r => r.getString(0).split('/').last).toSet
    val fresh = if (affectedNames.isEmpty)
      landFiles(s, dir, all.limit(0), key, v + 1, "delete", filesPerCommit, token)
    else {
      val affectedPaths = affectedNames.toSeq.sorted.map(n => s"$dir/data/$n")
      // mergeSchema: the affected set can mix pre- and post-evolution
      // files; a single-footer inference would rewrite survivors without
      // their evolved columns (same data-loss class as the merge path).
      val kept = s.read.option("mergeSchema", "true").parquet(affectedPaths: _*)
        .filter(!coalesce(cond, lit(false)))
      landFiles(s, dir, kept, key, v + 1, "delete", filesPerCommit, token)
    }
    val carried = man.filter(!col("file").isin(affectedNames.toSeq: _*))
      .select(col("file"), col("rows"), col("key_min"), col("key_max"),
        lit("delete").as("op"))
    try commit(s, dir, v + 1, carried.unionByName(fresh), token)
    finally man.unpersist()
  }

  /** COMPACT (G12's small-files maintenance as a table operation): rewrite
    * the current version's data into `targetFiles` fresh key-bucketed
    * files and commit the result as a new version — same rows, fewer,
    * larger, stat-tight files. Read-side cost (file listing, per-file
    * open overhead, manifest size) drops; time travel to pre-compaction
    * versions still resolves because old data files are immutable and
    * referenced by their manifests. */
  def compact(s: SparkSession, dir: String, key: String,
              targetFiles: Int = 2): Unit = withCommitLease(dir) {
    val token = newToken()
    val v = latestVersion(dir)
    require(v >= 0, s"$dir has no committed version")
    commit(s, dir, v + 1,
      landFiles(s, dir, read(s, dir, v), key, v + 1, "compact", targetFiles, token),
      token)
  }

  /** RESTORE (G21): re-commit version `toVersion`'s manifest as the new
    * latest — the rollback operation after a bad write. Manifest-only:
    * ZERO data movement or rewrite (data files are immutable and the
    * restored manifest re-references them), so restoring a 100 TB table
    * costs one manifest write. History records a 'restore' op with the
    * restored row count; the rolled-back intermediate versions stay
    * time-travelable until vacuum expires them. */
  def restore(s: SparkSession, dir: String, toVersion: Int): Unit = withCommitLease(dir) {
    val latest = latestVersion(dir)
    require(latest >= 0, s"$dir has no committed version")
    require(toVersion >= 0 && toVersion <= latest,
      s"version $toVersion outside committed range 0..$latest")
    // a vacuumed target passes the range check but its manifest is gone —
    // fail here with the real reason, not an opaque parquet path error
    require(new java.io.File(manifestDir(dir, toVersion), "_SUCCESS").isFile,
      s"version $toVersion was vacuumed; only versions with a retained " +
        "manifest can be restored")
    if (toVersion == latest) return // already the latest state — no-op
    commit(s, dir, latest + 1,
      manifest(s, dir, toVersion).withColumn("op", lit("restore")), newToken())
  }

  /** VACUUM (G19): physically delete data files referenced ONLY by
    * versions older than the newest `retainVersions`, then drop those
    * versions' manifests. Time travel works within the retention window
    * and not before — the standard storage-reclamation contract. Never
    * touches files any retained manifest references, so concurrent
    * readers of retained versions are safe; returns the deleted file
    * names. */
  def vacuum(s: SparkSession, dir: String,
             retainVersions: Int = 2): Seq[String] = {
    // WRITE side of the table lock: waits for in-flight commit leases,
    // holds new commits out while files are deleted (see tableLocks).
    val barrier = lockFor(dir).writeLock(); barrier.lock()
    try {
    require(retainVersions >= 1, "must retain at least the latest version")
    val latest = latestVersion(dir)
    require(latest >= 0, s"$dir has no committed version")
    val cutoff = math.max(0, latest - retainVersions + 1)
    if (cutoff == 0) return Seq.empty
    val retained = (cutoff to latest).flatMap(v =>
      manifest(s, dir, v).select("file").collect().map(_.getString(0))).toSet
    val expired = (0 until cutoff).flatMap(v =>
      manifest(s, dir, v).select("file").collect().map(_.getString(0)))
      .distinct.filterNot(retained)
    expired.foreach(n =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$dir/data/$n")))
    (0 until cutoff).foreach(v =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(manifestDir(dir, v))))
    expired
    } finally barrier.unlock()
  }

  /** The commit log: one row per version — op and total row count (from
    * manifest stats, no data scan). */
  def history(s: SparkSession, dir: String): DataFrame = {
    val latest = latestVersion(dir)
    require(latest >= 0, s"$dir has no committed version")
    // vacuumed versions drop out of the log (their manifests are gone)
    (0 to latest)
      .filter(v => new java.io.File(manifestDir(dir, v), "_SUCCESS").isFile)
      .map { v =>
        manifest(s, dir, v)
          .groupBy(lit(v).as("version"))
          .agg(first(col("op")).as("op"), count(lit(1)).as("n_files"),
            coalesce(sum("rows"), lit(0L)).as("n_rows"))
      }.reduce(_ unionByName _).orderBy("version")
  }

  /** The file names each side of a changeFeed must actually scan: files
    * referenced by exactly one of the two manifests. Copy-on-write makes
    * data files immutable and commits reference them by name, so a file
    * shared by both manifests is byte-identical in both versions — and
    * because stat pruning is range-complete, any key a commit touched
    * lives in a REWRITTEN (non-shared) file on both sides. Rows in shared
    * files therefore cannot appear in the feed, and the diff only needs
    * the manifest anti-join's survivors: a change-sized read, not two
    * table-sized ones. Exposed for the spec that pins the contract. */
  def changedFileSets(s: SparkSession, dir: String, fromV: Int,
                      toV: Int): (Seq[String], Seq[String]) = {
    def names(v: Int): Set[String] =
      manifest(s, dir, v).select("file").collect().map(_.getString(0)).toSet
    val (f, t) = (names(fromV), names(toV))
    ((f -- t).toSeq.sorted, (t -- f).toSeq.sorted)
  }

  /** G20 — CHANGE DATA FEED between two committed versions: the keyed
    * row-level diff (`insert` / `update` / `delete`, unchanged rows
    * excluded). Inserts and updates carry the AFTER image; deletes the
    * BEFORE image — the downstream-apply contract (applying the feed to
    * the `from` state reproduces the `to` state, which the spec proves).
    * Plan shape: a manifest anti-join picks the files referenced by only
    * one of the two versions ([[changedFileSets]] — shared COW files are
    * byte-identical and provably feed-silent), then ONE full-outer
    * equi-join on the key between the two CHANGE-SIZED scans; the join
    * shuffles each side once on the key, and classification/image
    * selection is a narrow projection. No log replay needed: versions are
    * complete states, so the diff IS the feed (the copy-on-write analog
    * of a format's CDF read) — but the read cost scales with what the
    * commits rewrote, not with the table. */
  def changeFeed(s: SparkSession, dir: String, fromV: Int, toV: Int,
                 key: String): DataFrame = {
    // ONE manifest collect per version (the r15 shape collected each
    // manifest four times per feed — via read() for schema and again in
    // changedFileSets — and at sf1 those eight sub-jobs, not the
    // change-sized scan, dominated the feed's wall-clock; on a 100k-file
    // table manifest jobs are the whole fixed cost). Full-version
    // schemas resolve from the union footer-merge; the subset reads take
    // the schema EXPLICITLY (parquet fills absent columns with NULL), so
    // a non-shared subset lacking evolution-appended columns needs no
    // second inference pass.
    val beforeFiles = cachedFiles(s, dir, fromV)
    val afterFiles = cachedFiles(s, dir, toV)
    // Schema of a file set WITHOUT a distributed footer-merge job:
    // files landed by one commit share one schema (landFiles writes
    // them from a single frame), so one driver-side footer read per
    // distinct commit prefix covers the set — #commits reads, not
    // #files, which is also the right cost on a 100k-file table.
    // Evolution is append-only, so merging = appending unseen fields
    // in commit order.
    def schemaOf(names: Seq[String]): org.apache.spark.sql.types.StructType =
      if (names.isEmpty) org.apache.spark.sql.types.StructType(Nil)
      else names.groupBy(_.takeWhile(_ != '-'))
        .toSeq.sortBy(_._1.drop(1).toInt)
        .map { case (pfx, fs) =>
          val cv = pfx.drop(1).toInt
          val k = (new java.io.File(dir).getAbsolutePath, pfx,
            new java.io.File(manifestDir(dir, cv)).lastModified())
          val hit = commitSchemaCache.get(k)
          if (hit != null) hit
          else {
            val sc = s.read.parquet(s"$dir/data/${fs.head}").schema
            commitSchemaCache.putIfAbsent(k, sc)
            sc
          }
        }
        .reduce { (a, b) => org.apache.spark.sql.types.StructType(
          a.fields ++ b.fields.filterNot(f => a.fieldNames.contains(f.name))) }
    val beforeSchema0 = schemaOf(beforeFiles)
    val afterSchema0 = schemaOf(afterFiles)
    // an all-rows-deleted (or not-yet-created) side still needs the key
    // column to join on — borrow the populated side's schema
    val beforeSchema = if (beforeSchema0.isEmpty) afterSchema0 else beforeSchema0
    val afterSchema = if (afterSchema0.isEmpty) beforeSchema0 else afterSchema0
    val beforeOnly = (beforeFiles.toSet -- afterFiles.toSet).toSeq.sorted
    val afterOnly = (afterFiles.toSet -- beforeFiles.toSet).toSeq.sorted
    def readSubset(names: Seq[String],
                   schema: org.apache.spark.sql.types.StructType): DataFrame =
      if (names.isEmpty)
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else s.read.schema(schema)
        .parquet(names.map(n => s"$dir/data/$n"): _*)
    val before = readSubset(beforeOnly, beforeSchema)
    val after = readSubset(afterOnly, afterSchema)
    val cols = after.columns // evolution only appends, so `after` is the superset
    val b = before.columns.foldLeft(before)((df, c) => df.withColumnRenamed(c, s"__b_$c"))
    val a = cols.foldLeft(after)((df, c) => df.withColumnRenamed(c, s"__a_$c"))
    val j = b.join(a, col(s"__b_$key") === col(s"__a_$key"), "full_outer")
    val dataCols = cols.filterNot(_ == key)
    val changed = dataCols
      .filter(c => before.columns.contains(c))
      .map(c => !(col(s"__b_$c") <=> col(s"__a_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val changeType = when(col(s"__b_$key").isNull, "insert")
      .when(col(s"__a_$key").isNull, "delete")
      .when(changed, "update")
    def bcol(c: String) = // pre-evolution versions lack appended columns
      if (before.columns.contains(c)) col(s"__b_$c") else lit(null)
    val image = cols.map(c =>
      when(col(s"__a_$key").isNull, bcol(c)).otherwise(col(s"__a_$c")).as(c))
    j.withColumn("change_type", changeType)
      .filter(col("change_type").isNotNull)
      .select(col("change_type") +: image: _*)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** G16 — the table-format contracts the oracle gate can't see:
  * copy-on-write minimality, snapshot isolation, manifest-stat pruning,
  * and SQL NULL-predicate delete semantics. */
class SnapshotTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDir(tag: String): String = {
    val d = s"${System.getProperty("java.io.tmpdir")}/graft_snapspec_$tag"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    d
  }

  private def mk(tag: String, n: Int = 1000): String = {
    val s = spark
    import s.implicits._
    val dir = freshDir(tag)
    val df = spark.range(n).select(col("id").as("k"),
      (col("id") % 10).cast("string").as("grp"),
      (col("id") * 2.0).as("v"))
    SnapshotTable.create(spark, dir, df, "k", filesPerCommit = 4)
    dir
  }

  test("create + read round-trips; manifest stats match the data") {
    val dir = mk("rt")
    val back = SnapshotTable.read(spark, dir)
    assert(back.count() == 1000)
    assert(back.agg(sum("k")).head().getLong(0) == 499500L)
    val man = SnapshotTable.manifest(spark, dir, 0)
    assert(man.agg(sum("rows")).head().getLong(0) == 1000L)
    // bucketed by key range → per-file ranges are disjoint
    val rows = man.select("key_min", "key_max").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    rows.sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) => assert(aMax < bMin)
      case _ =>
    }
  }

  test("merge is copy-on-write: files without matched keys carry over untouched") {
    val dir = mk("cow")
    val before = SnapshotTable.manifest(spark, dir, 0)
      .select("file").collect().map(_.getString(0)).toSet
    // all update keys land in the first key-range bucket
    val upd = spark.range(5).select(col("id").as("k"),
      lit("x").as("grp"), lit(-1.0).as("v"))
    SnapshotTable.merge(spark, dir, upd, "k", filesPerCommit = 4)
    val after = SnapshotTable.manifest(spark, dir, 1)
      .select("file").collect().map(_.getString(0)).toSet
    val carried = before.intersect(after)
    // 3 of the 4 v0 files contain no updated key and MUST carry over
    assert(carried.size == 3, s"expected 3 carried files, got $carried")
    // state: 5 rows replaced, none inserted
    val now = SnapshotTable.read(spark, dir)
    assert(now.count() == 1000)
    assert(now.filter(col("v") === -1.0).count() == 5)
  }

  test("merge inserts unmatched keys and replaces matched ones in one commit") {
    val dir = mk("ins")
    val upd = spark.range(3).select((col("id") + 999L).as("k"), // 999 matched; 1000,1001 inserts
      lit("z").as("grp"), lit(7.0).as("v"))
    SnapshotTable.merge(spark, dir, upd, "k")
    val now = SnapshotTable.read(spark, dir)
    assert(now.count() == 1002)
    assert(now.filter(col("v") === 7.0).count() == 3)
    assert(now.filter(col("k") === 999L && col("grp") === "z").count() == 1)
  }

  test("time travel: v0 read is unchanged after merge and delete") {
    val dir = mk("tt")
    SnapshotTable.merge(spark, dir,
      spark.range(10).select(col("id").as("k"), lit("x").as("grp"), lit(0.0).as("v")), "k")
    SnapshotTable.delete(spark, dir, col("grp") === "3", "k")
    val v0 = SnapshotTable.read(spark, dir, version = 0)
    assert(v0.count() == 1000)
    assert(v0.filter(col("v") === 0.0 && col("k") =!= 0L).count() == 0)
    assert(v0.filter(col("grp") === "3").count() == 100)
    // latest reflects both mutations
    val now = SnapshotTable.read(spark, dir)
    assert(now.filter(col("grp") === "3").count() == 0)
  }

  test("delete keeps NULL-predicate rows (SQL DELETE semantics)") {
    val dir = freshDir("nul")
    val df = spark.range(10).select(col("id").as("k"),
      when(col("id") < 5, col("id").cast("string")).as("grp"), // 5 NULL grp rows
      lit(1.0).as("v"))
    SnapshotTable.create(spark, dir, df, "k")
    SnapshotTable.delete(spark, dir, col("grp") === "2", "k")
    val now = SnapshotTable.read(spark, dir)
    assert(now.count() == 9) // only grp='2' deleted; NULLs kept
    assert(now.filter(col("grp").isNull).count() == 5)
  }

  test("manifest stats prune key-range reads to the overlapping files") {
    val dir = mk("prune")
    val all = SnapshotTable.manifest(spark, dir, 0).count()
    assert(all == 4)
    // a range inside one bucket must select exactly one file
    val hit = SnapshotTable.prunedFiles(spark, dir, 10, 20)
    assert(hit.size == 1, s"expected 1 file for [10,20], got $hit")
    // and the pruned read still returns the right rows
    val rows = spark.read.parquet(hit: _*).filter(col("k").between(10, 20))
    assert(rows.count() == 11)
  }

  test("history reports one row per version with manifest-derived counts") {
    val dir = mk("hist", n = 100)
    SnapshotTable.merge(spark, dir,
      spark.range(2).select((col("id") + 100L).as("k"), lit("n").as("grp"),
        lit(0.0).as("v")), "k")
    SnapshotTable.delete(spark, dir, col("k") < 10, "k")
    val h = SnapshotTable.history(spark, dir)
      .select("version", "op", "n_rows").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(h.toSeq == Seq((0, "create", 100L), (1, "merge", 102L), (2, "delete", 92L)))
  }

  test("compact collapses files, preserves every row, and keeps old versions readable (G17)") {
    val dir = mk("compact", n = 1000) // 4 files at v0
    val before = SnapshotTable.read(spark, dir).orderBy("k").collect()
    val filesBefore = SnapshotTable.manifest(spark, dir, 0).count()
    SnapshotTable.compact(spark, dir, "k", targetFiles = 2)
    val filesAfter = SnapshotTable.manifest(spark, dir, 1).count()
    assert(filesAfter < filesBefore, s"$filesAfter files after vs $filesBefore before")
    val after = SnapshotTable.read(spark, dir).orderBy("k").collect()
    assert(after.toSeq == before.toSeq, "compaction must move bytes, never rows")
    // pre-compaction version still resolves (immutable data files)
    assert(SnapshotTable.read(spark, dir, version = 0).count() == 1000L)
    val h = SnapshotTable.history(spark, dir)
      .select("version", "op", "n_rows").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(h.toSeq == Seq((0, "create", 1000L), (1, "compact", 1000L)))
    // stats stay range-complete: a key-range read prunes to <= all files
    val pruned = SnapshotTable.prunedFiles(spark, dir, 0L, 10L)
    assert(pruned.nonEmpty && pruned.size <= filesAfter)
  }

  test("schema-evolving merge appends the column without rewriting untouched files (G18)") {
    import org.apache.spark.sql.functions._
    val dir = mk("evolve", n = 1000)
    val filesBefore = SnapshotTable.manifest(spark, dir, 0)
      .select("file").collect().map(_.getString(0)).toSet
    // non-evolving merge must REJECT new columns, never drop them
    val upd = SnapshotTable.read(spark, dir).filter(col("k") < 100)
      .withColumn("flag", lit(1))
    intercept[IllegalArgumentException] {
      SnapshotTable.merge(spark, dir, upd, "k")
    }
    SnapshotTable.merge(spark, dir, upd, "k", evolve = true)
    val after = SnapshotTable.read(spark, dir)
    assert(after.columns.contains("flag"))
    assert(after.filter(col("k") < 100 && col("flag") === 1).count() == 100)
    assert(after.filter(col("k") >= 100).filter(col("flag").isNotNull).count() == 0,
      "untouched rows read the new column as NULL")
    // untouched files carried over by reference (no rewrite)
    val carried = SnapshotTable.manifest(spark, dir, 1)
      .select("file").collect().map(_.getString(0)).toSet
    assert((carried intersect filesBefore).nonEmpty,
      "at least one pre-evolution file must survive unrewritten")
    // and the old version still reads with the old schema
    assert(!SnapshotTable.read(spark, dir, version = 0).columns.contains("flag"))
  }

  test("second merge after evolution preserves evolved-column data (mergeSchema on candidate read)") {
    val dir = mk("evolve2", n = 1000)
    // v1: evolve — k<100 gains flag=1 (rewrites the first key bucket)
    val ev = SnapshotTable.read(spark, dir).filter(col("k") < 100)
      .withColumn("flag", lit(1))
    SnapshotTable.merge(spark, dir, ev, "k", evolve = true)
    // v2: a merge NOT carrying `flag`, whose update keys span BOTH a
    // post-evolution file (k=50) and pre-evolution files (k=600) — the
    // candidate read mixes schemas. Pre-fix, a single-footer inference
    // could drop `flag` from the rewritten survivors (silent data loss),
    // and conform() threw resolving the NULL type for `flag`.
    val upd2 = spark.createDataFrame(java.util.List.of[org.apache.spark.sql.Row](
        org.apache.spark.sql.Row(50L, "u", -5.0),
        org.apache.spark.sql.Row(600L, "u", -6.0)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("grp", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType))))
    SnapshotTable.merge(spark, dir, upd2, "k")
    val now = SnapshotTable.read(spark, dir)
    // survivors of the post-evolution file keep their flag values
    assert(now.filter(col("k") < 100 && col("k") =!= 50L && col("flag") === 1).count() == 99,
      "evolved-column values must survive a later merge's file rewrite")
    // the merged row itself reads flag as NULL (updates didn't carry it)
    assert(now.filter(col("k") === 50L).select("flag").head().isNullAt(0))
    assert(now.filter(col("k") === 600L && col("v") === -6.0).count() == 1)
    assert(now.count() == 1000)
  }

  test("delete after evolution preserves evolved-column data on rewritten survivors") {
    val dir = mk("evolvedel", n = 1000)
    val ev = SnapshotTable.read(spark, dir).filter(col("k") < 100)
      .withColumn("flag", lit(1))
    SnapshotTable.merge(spark, dir, ev, "k", evolve = true)
    // grp='7' rows exist in every key bucket → affected set mixes pre-
    // and post-evolution files; pre-fix the kept-rows read could infer a
    // flag-less schema and null the column out of the rewrite.
    SnapshotTable.delete(spark, dir, col("grp") === "7", "k")
    val now = SnapshotTable.read(spark, dir)
    assert(now.filter(col("grp") === "7").count() == 0)
    val expectFlagged = (0L until 100L).count(k => k % 10 != 7)
    assert(now.filter(col("flag") === 1).count() == expectFlagged,
      "evolved-column values must survive a delete's file rewrite")
    assert(now.count() == 900)
  }

  test("vacuum reclaims only files outside the retention window; retained versions still read (G19)") {
    import org.apache.spark.sql.functions._
    val dir = mk("vacuum", n = 1000)
    SnapshotTable.merge(spark, dir,
      SnapshotTable.read(spark, dir).filter(col("k") < 200)
        .withColumn("v", col("v") + 1.0), "k") // v1 rewrites some files
    SnapshotTable.compact(spark, dir, "k", targetFiles = 2) // v2
    val before = SnapshotTable.read(spark, dir).orderBy("k").collect()
    val deleted = SnapshotTable.vacuum(spark, dir, retainVersions = 2)
    assert(deleted.nonEmpty, "v0-only files should be reclaimed")
    // latest and v1 still read fully; v0 is gone from the log
    assert(SnapshotTable.read(spark, dir).orderBy("k").collect().toSeq == before.toSeq)
    assert(SnapshotTable.read(spark, dir, version = 1).count() == 1000L)
    val versions = SnapshotTable.history(spark, dir)
      .select("version").collect().map(_.getInt(0)).toSeq
    assert(versions == Seq(1, 2), s"expected v0 vacuumed, got $versions")
    // no retained manifest references a deleted file
    val referenced = Seq(1, 2).flatMap(v =>
      SnapshotTable.manifest(spark, dir, v).select("file").collect().map(_.getString(0))).toSet
    assert(deleted.toSet.intersect(referenced).isEmpty)
  }

  test("changeFeed classifies exactly and applying it reproduces the target version (G20)") {
    val dir = mk("cdf")
    // v1: update k<100 (v+1), insert k in [2000,2100), leave the rest
    val upd = SnapshotTable.read(spark, dir).filter(col("k") < 100)
      .select(col("k"), col("grp"), (col("v") + 1.0).as("v"))
    val ins = spark.range(2000, 2100).select(col("id").as("k"),
      lit("new").as("grp"), lit(-1.0).as("v"))
    SnapshotTable.merge(spark, dir, upd.unionByName(ins), "k")
    // v2: delete grp = '3'
    SnapshotTable.delete(spark, dir, col("grp") === "3", "k")

    val f01 = SnapshotTable.changeFeed(spark, dir, 0, 1, "k")
    val byType = f01.groupBy("change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("update" -> 100L, "insert" -> 100L),
      s"unchanged rows must not leak into the feed: $byType")
    val f12 = SnapshotTable.changeFeed(spark, dir, 1, 2, "k")
    assert(f12.groupBy("change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
      .forall { case (t, _) => t == "delete" })

    // apply contract: v0 minus (updated ∪ deleted keys) plus after-images = v1
    val updKeys = f01.filter(col("change_type") =!= "delete").select("k")
    val applied = SnapshotTable.read(spark, dir, 0)
      .join(updKeys, Seq("k"), "left_anti")
      .unionByName(f01.filter(col("change_type") =!= "delete").drop("change_type"))
    val v1 = SnapshotTable.read(spark, dir, 1)
    assert(applied.orderBy("k").collect().toSeq == v1.orderBy("k").collect().toSeq,
      "feed applied to v0 must reproduce v1 row-for-row")
  }

  test("changeFeed is change-sized: files shared by both manifests are never scanned (G20)") {
    val dir = mk("cdfpruned")
    // v1 touches only keys < 100, so at least one v0 file (the high-key
    // range) carries over unrewritten and must be shared by both
    // manifests — the COW guarantee the change-sized read rests on.
    val upd = SnapshotTable.read(spark, dir).filter(col("k") < 100)
      .select(col("k"), col("grp"), (col("v") + 1.0).as("v"))
    SnapshotTable.merge(spark, dir, upd, "k")
    def files(v: Int): Set[String] = SnapshotTable.manifest(spark, dir, v)
      .select("file").collect().map(_.getString(0)).toSet
    val shared = files(0).intersect(files(1))
    assert(shared.nonEmpty, "scenario must carry at least one file over")
    // the scan lists contain no shared file…
    val (beforeOnly, afterOnly) = SnapshotTable.changedFileSets(spark, dir, 0, 1)
    assert(beforeOnly.toSet.intersect(shared).isEmpty &&
      afterOnly.toSet.intersect(shared).isEmpty,
      "changeFeed must not scan files both versions reference")
    // …and the plan reads exactly those lists: every parquet file backing
    // the feed's scan relations is a non-shared file.
    val feed = SnapshotTable.changeFeed(spark, dir, 0, 1, "k")
    val scanned = feed.inputFiles.map(_.split('/').last).toSet
    assert(scanned == (beforeOnly ++ afterOnly).toSet,
      s"feed scanned $scanned, expected exactly the non-shared files")
    // the pruned feed still classifies exactly (same answer as G20 above)
    val byType = feed.groupBy("change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("update" -> 100L), s"pruned feed wrong: $byType")
  }

  test("restore rolls back to a prior version manifest-only and keeps the bad version (G21)") {
    val dir = mk("restore")
    SnapshotTable.delete(spark, dir, col("k") >= 500, "k") // the "bad write" (v1)
    val filesBefore = Option(new java.io.File(s"$dir/data").listFiles())
      .getOrElse(Array.empty).map(_.getName).toSet
    SnapshotTable.restore(spark, dir, 0)                   // v2

    // latest state is bit-identical to v0
    val v0 = SnapshotTable.read(spark, dir, 0).orderBy("k").collect().toSeq
    assert(SnapshotTable.read(spark, dir).orderBy("k").collect().toSeq == v0)
    // manifest-only: zero new data files were written
    val filesAfter = Option(new java.io.File(s"$dir/data").listFiles())
      .getOrElse(Array.empty).map(_.getName).toSet
    assert(filesAfter == filesBefore, "restore must not move or write data")
    // the rolled-back version stays time-travelable (audit trail)
    assert(SnapshotTable.read(spark, dir, 1).count() == 500)
    // history records the restore with the restored row count
    val h = SnapshotTable.history(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(3))).toSeq
    assert(h.map(t => (t._1, t._2)) == Seq((0, "create"), (1, "delete"), (2, "restore")))
    assert(h.last._3 == 1000L)
  }

  test("restore rejects a vacuumed target version with the real reason; restore(latest) is a no-op") {
    val dir = mk("restoreguard")
    SnapshotTable.merge(spark, dir,
      spark.range(3).select(col("id").as("k"), lit("x").as("grp"),
        lit(0.0).as("v")), "k")                              // v1
    SnapshotTable.merge(spark, dir,
      spark.range(3).select(col("id").as("k"), lit("y").as("grp"),
        lit(1.0).as("v")), "k")                              // v2
    SnapshotTable.vacuum(spark, dir, retainVersions = 2)     // v0 expired
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.restore(spark, dir, 0)
    }
    assert(e.getMessage.contains("vacuum"), s"wrong reason: ${e.getMessage}")
    // restoring the version that is already latest must not bump the version
    SnapshotTable.restore(spark, dir, 2)
    assert(SnapshotTable.latestVersion(dir) == 2)
  }

  test("optimistic concurrency: of two interleaved merges one commits, one fails cleanly, state equals the winner's") {
    val s = spark
    import s.implicits._
    val dir = mk("occ")
    SnapGate.entered = false
    SnapGate.latch = new java.util.concurrent.CountDownLatch(1)
    // Writer B reads snapshot v0, then stalls inside its own update-frame
    // evaluation until writer A has committed v1 — a deterministic
    // read-snapshot / commit interleaving, not a sleep race.
    val updB = spark.range(5).repartition(1)
      .map { i => SnapGate.entered = true; SnapGate.latch.await(); i }
      .select(col("value").as("k"), lit("B").as("grp"), lit(-2.0).as("v"))
    @volatile var bErr: Throwable = null
    val tB = new Thread(() => {
      try SnapshotTable.merge(spark, dir, updB, "k", filesPerCommit = 4)
      catch { case t: Throwable => bErr = t }
    })
    tB.start()
    val t0 = System.nanoTime()
    while (!SnapGate.entered && (System.nanoTime() - t0) < 60e9) Thread.sleep(10)
    assert(SnapGate.entered, "writer B never reached its update evaluation")
    // Writer A commits v1 while B is still computing against v0.
    SnapshotTable.merge(spark, dir,
      spark.range(5).select(col("id").as("k"), lit("A").as("grp"),
        lit(-1.0).as("v")), "k", filesPerCommit = 4)
    assert(SnapshotTable.latestVersion(dir) == 1)
    SnapGate.latch.countDown()
    tB.join(120000)
    assert(!tB.isAlive, "writer B never finished")
    // Exactly one writer won; the loser surfaced the conflict cleanly.
    assert(bErr != null, "writer B should have lost the version CAS")
    assert(bErr.isInstanceOf[SnapshotTable.ConcurrentCommitException],
      s"expected ConcurrentCommitException, got $bErr")
    // No torn state: latest is still A's commit, bit-for-bit.
    assert(SnapshotTable.latestVersion(dir) == 1)
    val grp = SnapshotTable.read(spark, dir).filter(col("k") < 5)
      .select("grp").distinct().collect().map(_.getString(0)).toSeq
    assert(grp == Seq("A"), s"winner's rows must hold, got $grp")
    // The loser rolled back: every data file on disk is referenced by a
    // committed manifest, and no staged manifest remains.
    val referenced = (0 to 1).flatMap(v =>
      SnapshotTable.manifest(spark, dir, v).select("file").collect()
        .map(_.getString(0))).toSet
    val onDisk = Option(new java.io.File(s"$dir/data").listFiles())
      .getOrElse(Array.empty).map(_.getName).toSet
    assert(onDisk == referenced, s"orphans: ${onDisk.diff(referenced)}")
    val logEntries = Option(new java.io.File(s"$dir/_log").listFiles())
      .getOrElse(Array.empty).map(_.getName).toSet
    assert(logEntries == Set("v0", "v1"), s"torn log: $logEntries")
    // The documented recovery path works: the loser re-reads the latest
    // snapshot and retries the SAME logical merge, which now lands as v2
    // on top of the winner — state is the winner's commit plus B's rows,
    // exactly what serial A-then-B would have produced.
    SnapshotTable.merge(spark, dir,
      spark.range(5).select(col("id").as("k"), lit("B").as("grp"),
        lit(-2.0).as("v")), "k", filesPerCommit = 4)
    assert(SnapshotTable.latestVersion(dir) == 2)
    val grpRetry = SnapshotTable.read(spark, dir).filter(col("k") < 5)
      .select("grp").distinct().collect().map(_.getString(0)).toSeq
    assert(grpRetry == Seq("B"),
      s"retry must override the winner's rows serially, got $grpRetry")
    val v1Grp = SnapshotTable.read(spark, dir, 1).filter(col("k") < 5)
      .select("grp").distinct().collect().map(_.getString(0)).toSeq
    assert(v1Grp == Seq("A"), "the winner's version stays readable after the retry")
  }

  test("BatchedMerger: k-batch commits equal per-batch merges, with 1/k the commit count") {
    val s = spark
    import s.implicits._
    import graft.sources.BatchedMerger
    // five "micro-batch" deltas with overlapping keys; later batches win
    def delta(b: Int): org.apache.spark.sql.DataFrame =
      spark.range(b * 20, b * 20 + 60).select(
        (col("id") % 100).as("k"), lit(b).as("seq"), (col("id") * 1.0).as("v"))
    def latestPerKey(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("k").agg(max_by(struct(col("seq"), col("v")), col("seq")).as("e"))
      .select(col("k"), col("e.seq").as("seq"), col("e.v").as("v"))

    // reference: one table committed per batch (batchesPerCommit = 1)
    val perBatchDir = freshDir("bm_ref")
    val ref = new BatchedMerger(spark, perBatchDir, "k", 1, latestPerKey)
    (0 until 5).foreach(b => ref.add(latestPerKey(delta(b))))
    assert(ref.commits == 5)

    // batched: 2 batches per commit, tail flushed at "stream end"
    val batchedDir = freshDir("bm_k2")
    val bm = new BatchedMerger(spark, batchedDir, "k", 2, latestPerKey)
    (0 until 5).foreach(b => bm.add(latestPerKey(delta(b))))
    bm.flush()
    assert(bm.commits == 3, s"5 batches at k=2 must commit 3 times, got ${bm.commits}")
    assert(SnapshotTable.latestVersion(batchedDir) == 2)

    // identical final state
    val a = SnapshotTable.read(spark, perBatchDir).orderBy("k").collect().toSeq
    val b = SnapshotTable.read(spark, batchedDir).orderBy("k").collect().toSeq
    assert(a == b, "batched commits must leave the same table state as per-batch merges")
    // flush on an empty buffer is a no-op
    bm.flush()
    assert(bm.commits == 3)
    // the buffer dir is drained after flush
    val leftover = Option(new java.io.File(s"$batchedDir/_delta_buffer").listFiles())
      .getOrElse(Array.empty)
    assert(leftover.isEmpty, s"buffer not drained: ${leftover.map(_.getName).toSeq}")

    // restart recovery: land one batch, "crash", re-attach, flush
    val recDir = freshDir("bm_rec")
    val bm1 = new BatchedMerger(spark, recDir, "k", 3, latestPerKey)
    bm1.add(latestPerKey(delta(0)))
    val bm2 = new BatchedMerger(spark, recDir, "k", 3, latestPerKey)
    bm2.recoverBuffered()
    bm2.add(latestPerKey(delta(1)))
    bm2.flush()
    val rec = SnapshotTable.read(spark, recDir)
    assert(rec.count() == latestPerKey(delta(0).unionByName(delta(1))).count())
    assert(rec.filter(col("seq") === 1).count() > 0, "recovered buffer must include both batches")
  }

  test("vacuum takes a read-barrier against in-flight commits: a stalled merge never loses its files") {
    val s = spark
    import s.implicits._
    val dir = mk("vacrace")
    // v1 exists, so vacuum(retainVersions=1) has v0 files to reclaim —
    // exactly the files an in-flight merge of v1 may still be reading.
    SnapshotTable.merge(spark, dir,
      spark.range(100).select(col("id").as("k"), lit("m").as("grp"),
        lit(1.0).as("v")), "k")
    VacGate.entered = false
    VacGate.latch = new java.util.concurrent.CountDownLatch(1)
    // The merge stalls inside its own update evaluation (deterministic
    // gate, not a sleep race) while holding its commit lease.
    val updSlow = spark.range(50).repartition(1)
      .map { i => VacGate.entered = true; VacGate.latch.await(); i }
      .select(col("value").as("k"), lit("late").as("grp"), lit(9.0).as("v"))
    @volatile var mergeErr: Throwable = null
    val tMerge = new Thread(() => {
      try SnapshotTable.merge(spark, dir, updSlow, "k")
      catch { case t: Throwable => mergeErr = t }
    })
    tMerge.start()
    val t0 = System.nanoTime()
    while (!VacGate.entered && (System.nanoTime() - t0) < 60e9) Thread.sleep(10)
    assert(VacGate.entered, "merge never reached its update evaluation")
    // vacuum(1) would delete v0's rewritten files out from under the
    // merge; the write barrier must hold it until the commit lands.
    @volatile var vacDone = false
    @volatile var vacErr: Throwable = null
    @volatile var deleted: Seq[String] = Seq.empty
    val tVac = new Thread(() => {
      try { deleted = SnapshotTable.vacuum(spark, dir, retainVersions = 1); vacDone = true }
      catch { case t: Throwable => vacErr = t }
    })
    tVac.start()
    Thread.sleep(500) // give vacuum time to reach (and block on) the barrier
    assert(!vacDone, "vacuum must block while a commit lease is held")
    VacGate.latch.countDown()
    tMerge.join(120000); tVac.join(120000)
    assert(!tMerge.isAlive && !tVac.isAlive, "merge/vacuum never finished")
    // the merge never saw FileNotFound — the barrier, not luck
    assert(mergeErr == null, s"in-flight merge must not lose files: $mergeErr")
    assert(vacErr == null, s"vacuum failed: $vacErr")
    assert(vacDone && deleted.nonEmpty, "vacuum must reclaim after the commit lands")
    // vacuum saw the post-merge latest: v2 is the sole retained version
    assert(SnapshotTable.latestVersion(dir) == 2)
    val h = SnapshotTable.history(spark, dir).select("version").collect()
      .map(_.getInt(0)).toSeq
    assert(h == Seq(2), s"retention must apply to the post-commit log: $h")
    val late = SnapshotTable.read(spark, dir).filter(col("grp") === "late").count()
    assert(late == 50L, "the stalled merge's rows must all be present")
  }
}

/** Static handshake for the concurrency spec: lets a merge's update frame
  * block mid-evaluation (local mode shares one JVM, so statics reach the
  * task threads). */
object SnapGate {
  @volatile var entered: Boolean = false
  @volatile var latch: java.util.concurrent.CountDownLatch = _
}

/** Separate gate for the vacuum-during-merge test (no shared state with
  * the OCC test, so the two stay order-independent). */
object VacGate {
  @volatile var entered: Boolean = false
  @volatile var latch: java.util.concurrent.CountDownLatch = _
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables
import graft.streaming.Events

/** SURVEY §2 G2/G3/G4/G6 — source/sink round-trips with explicit schemas. */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("csv round-trips with header and explicit schema (G2)") {
    val dir = Files.createTempDirectory("graft_csv").toString + "/out"
    val df = Seq((1L, "a", 1.5), (2L, "b", -0.25)).toDF("id", "name", "score")
    Tables.writeCsv(df, dir)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val back = Tables.readCsv(spark, dir, schema)
    assert(back.schema == schema)
    assert(back.orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a", 1.5), (2L, "b", -0.25)))
  }

  test("orc round-trips and pushes filters to the scan (G11)") {
    val dir = Files.createTempDirectory("graft_orc").toString + "/out"
    val df = spark.range(100).select(col("id"), (col("id") % 7).as("m"))
    Tables.writeOrc(df, dir)
    val back = Tables.readOrc(spark, dir).filter(col("id") > 90)
    assert(back.count() == 9)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,90)]"),
      s"ORC scan should push the filter:\n$plan")
  }

  test("compaction collapses small files and preserves data (G12)") {
    val base = Files.createTempDirectory("graft_compact").toString
    val in = base + "/in"
    val out = base + "/out"
    // 64 tiny files of ~4 rows each — the post-streaming shape
    spark.range(256).select(col("id"), (col("id") * 3).as("v"))
      .repartition(64).write.parquet(in)
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles(in) == 64)
    Tables.compact(spark, in, out, targetRowsPerFile = 128L)
    assert(parquetFiles(out) == 2)
    val a = spark.read.parquet(in).orderBy("id").as[(Long, Long)].collect().toSeq
    val b = spark.read.parquet(out).orderBy("id").as[(Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("json reads nested payloads with explicit schema (G3)") {
    val dir = Files.createTempDirectory("graft_json").toString + "/in"
    Seq("""{"id":1,"loc":{"lat":37.7,"lon":-122.4},"tags":["x","y"]}""",
        """{"id":2,"loc":{"lat":40.7,"lon":-74.0},"tags":[]}""")
      .toDF("value").coalesce(1).write.text(dir)
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("loc", StructType(Seq(
        StructField("lat", DoubleType), StructField("lon", DoubleType)))),
      StructField("tags", ArrayType(StringType))))
    val back = Tables.readJson(spark, dir, schema)
    assert(back.count() == 2)
    val r = back.orderBy("id").select("loc.lat", "tags").head()
    assert(r.getDouble(0) == 37.7 && r.getSeq[String](1) == Seq("x", "y"))
  }

  test("partitioned parquet write partition-prunes on read (G4)") {
    val dir = Files.createTempDirectory("graft_part").toString + "/out"
    val df = Seq((1L, "A", 10), (2L, "B", 20), (3L, "A", 30)).toDF("id", "grp", "v")
    Tables.writeParquet(df, dir, partitionBy = Seq("grp"))
    val pruned = spark.read.parquet(dir).filter(col("grp") === "A")
    assert(pruned.count() == 2)
    // pruning is visible in the scan's partition count, not a filter op
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!scan.contains("grp=B"))
  }

  test("bucketed tables join with zero exchanges (G1 co-located join)") {
    val left = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "lv")
    val right = Seq((1L, 10.0), (2L, 20.0), (4L, 40.0)).toDF("k", "rv")
    Tables.writeBucketed(left, "g_bkt_left", Seq("k"), 4, sortCols = Seq("k"))
    Tables.writeBucketed(right, "g_bkt_right", Seq("k"), 4, sortCols = Seq("k"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join path so the assertion is about bucketing,
      // not about the small side being broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("g_bkt_left").join(spark.table("g_bkt_right"), "k")
      assert(joined.orderBy("k").count() == 2)
      joined.count() // materialize so AQE finalizes the plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS g_bkt_left")
      spark.sql("DROP TABLE IF EXISTS g_bkt_right")
    }
  }

  test("jdbc write/read round-trips against embedded Derby (G5)") {
    val home = Files.createTempDirectory("graft_derby").toString
    System.setProperty("derby.system.home", home) // keep derby.log out of the repo
    val url = s"jdbc:derby:$home/db;create=true"
    val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val df = Seq((1L, "a", 1.5), (2L, "b", -0.25), (3L, "c", 9.0))
      .toDF("id", "name", "score")
    Tables.jdbcWrite(df, url, "t_roundtrip", props)
    val back = Tables.jdbcRead(spark, url, "t_roundtrip", props = props)
    assert(back.orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a", 1.5), (2L, "b", -0.25), (3L, "c", 9.0)))
    // Partitioned read: the scale path is N parallel range-bounded
    // connections, not one cursor streaming the whole table.
    val part = Tables.jdbcRead(spark, url, "t_roundtrip",
      partitionColumn = Some(("id", 1L, 3L, 2)), props = props)
    assert(part.rdd.getNumPartitions == 2)
    assert(part.count() == 3)
  }

  test("multimodal decode stays a Catalyst plan — no RDD round-trip (F4)") {
    val docs = Seq((1L, "hello"), (2L, "world")).toDF("doc_id", "text")
    val out = graft.multimodal.Multimodal.decodeStub(docs, "doc_id", "text")
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.contains("LogicalRDD") && !plan.contains("ExternalRDD"),
      s"decode detached from Catalyst:\n$plan")
    assert(out.orderBy("doc_id").select("n_bytes", "format").collect().length == 2)
  }

  test("multimodal resize shrinks payloads area-proportionally (F4c)") {
    val docs = Seq((1L, "a" * 100), (2L, "b")).toDF("doc_id", "text")
    val out = graft.multimodal.Multimodal.resizeStub(docs, "doc_id", "text", 8, 8)
      .orderBy("doc_id")
      .select("doc_id", "width", "n_bytes_in", "n_bytes_out")
      .as[(Long, Int, Int, Int)].collect().toSeq
    assert(out.map(_._2).forall(_ == 8))
    out.foreach { case (_, _, nIn, nOut) =>
      assert(nOut >= 1 && nOut <= nIn, s"resize must shrink-or-keep: $nIn -> $nOut")
    }
    // deterministic: same input, same bytes
    val again = graft.multimodal.Multimodal.resizeStub(docs, "doc_id", "text", 8, 8)
      .orderBy("doc_id").select("n_bytes_out").as[Int].collect().toSeq
    assert(again == out.map(_._4))
  }

  test("frame sampling slices every k-th full frame, drops partials (F4b)") {
    // 26 bytes @ frameBytes=8 → 3 full frames (partial tail dropped);
    // everyK=2 keeps frames 0 and 2. 7-byte doc yields nothing.
    val docs = Seq((1L, "abcdefghijklmnopqrstuvwxyz"), (2L, "short12".substring(0, 7)))
      .toDF("doc_id", "text")
    val fs = graft.multimodal.Multimodal
      .frameSample(docs, "doc_id", "text", frameBytes = 8, everyK = 2)
    val out = fs.orderBy("doc_id", "frame_no")
    val rows = out.select("doc_id", "frame_no", "frame_len").as[(Long, Long, Long)]
      .collect().toSeq
    assert(rows == Seq((1L, 0L, 8L), (1L, 2L, 8L)))
    val sigs = out.select("frame_sig").as[String].collect()
    val exp = java.security.MessageDigest.getInstance("MD5")
      .digest("abcdefgh".getBytes).map("%02x".format(_)).mkString
    assert(sigs.head == exp)
    // narrow: no exchange anywhere in the slicing plan itself
    val p = fs.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"unexpected shuffle in frame sampling:\n$p")
  }

  test("paged-REST extract lands every page and reads typed rows (G10)") {
    import graft.sources.RestExtract
    val rows = (0 until 700).map(i => s"""{"id":$i,"name":"biz_$i"}""")
    val landing = Files.createTempDirectory("graft_rest").toString + "/landing"
    // 700 rows at limit=256 → pages at offsets 0/256/512, then exhaustion
    val pages = RestExtract.land(spark, RestExtract.RowsFetcher(rows), landing, limit = 256)
    assert(pages == 3)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val back = RestExtract.read(spark, landing, schema)
    assert(back.count() == 700)
    assert(back.agg(sum("id")).head().getLong(0) == (0L until 700).sum)
    // re-landing is idempotent (crashed-run replay): same page set, no dupes
    RestExtract.land(spark, RestExtract.RowsFetcher(rows), landing, limit = 256)
    assert(RestExtract.read(spark, landing, schema).count() == 700)
  }

  test("paged-REST extract retries flaky pages with bounded backoff (G10)") {
    import graft.sources.RestExtract
    val rows = (0 until 500).map(i => s"""{"id":$i,"name":"biz_$i"}""")
    // fails the FIRST TWO attempts at every offset, then serves — a
    // transient 429/timeout at each page boundary
    class Flaky extends RestExtract.PageFetcher {
      val inner = RestExtract.RowsFetcher(rows)
      val attempts = scala.collection.mutable.HashMap.empty[Long, Int]
      def fetch(offset: Long, limit: Int): Option[String] = {
        val a = attempts.getOrElse(offset, 0); attempts(offset) = a + 1
        if (a < 2) throw new java.io.IOException(s"transient at $offset")
        inner.fetch(offset, limit)
      }
    }
    val landing = Files.createTempDirectory("graft_rest_flaky").toString + "/landing"
    val pages = RestExtract.land(spark, new Flaky, landing,
      limit = 256, maxRetries = 4, baseBackoffMs = 1L)
    assert(pages == 2, "every flaky page must land after in-place retries")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    assert(RestExtract.read(spark, landing, schema).count() == 500)
    // exhausted retries rethrow — the task-level retry stays the outer guard
    class Dead extends RestExtract.PageFetcher {
      def fetch(offset: Long, limit: Int): Option[String] =
        throw new java.io.IOException("permanent outage")
    }
    val ex = intercept[java.io.IOException] {
      RestExtract.land(spark, new Dead,
        Files.createTempDirectory("graft_rest_dead").toString + "/landing",
        limit = 256, maxRetries = 2, baseBackoffMs = 1L)
    }
    assert(ex.getMessage.contains("after 3 attempts"))
  }

  test("paged-REST extract enforces the schema contract FAILFAST (G10)") {
    import graft.sources.RestExtract
    val rows = IndexedSeq("""{"id":1,"name":"ok"}""", """{"id":"not-a-number","name":"bad"}""")
    val landing = Files.createTempDirectory("graft_rest_bad").toString + "/landing"
    RestExtract.land(spark, RestExtract.RowsFetcher(rows), landing, limit = 10)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    intercept[Exception] {
      // the action must read the drifted column — a bare count() prunes
      // every field and the parser never attempts the long conversion
      RestExtract.read(spark, landing, schema).agg(sum("id")).collect()
    }
    // permissive mode reads through, null-filling the drifted field
    val loose = RestExtract.read(spark, landing, schema, failFast = false)
    assert(loose.count() == 2 && loose.filter(col("id").isNull).count() == 1)
  }

  test("streaming file source feeds the tumbling aggregation (G6/F1)") {
    val inDir = Files.createTempDirectory("graft_stream_in").toString + "/events"
    val batch = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-03-01 10:00:00"), 7L, "click", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-03-01 11:00:00"), 7L, "click", 2.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-03-02 09:00:00"), 8L, "view", 4.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    batch.coalesce(1).write.parquet(inDir)
    val counts = Events.tumblingCounts(Events.readEventStream(spark, inDir))
    val q = counts.writeStream.outputMode("complete")
      .format("memory").queryName("g6_tumbling")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val rows = spark.table("g6_tumbling")
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n_events"), col("total_value"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(rows == Set(
      ("2024-03-01", "click", 2L, 3.0),
      ("2024-03-02", "view", 1L, 4.0)))
  }

  test("Audit.observed metrics ride the job that writes the data (G15)") {
    // Pipeline observability the Spark-native way: the library's
    // Audit.observed wraps Dataset.observe + the listener plumbing, so
    // row counts / null counts / sums are collected by the SAME job
    // that produces the output — no second audit scan of a 100 TB
    // input. Values are asserted against directly computed ones.
    val out = Files.createTempDirectory("graft_observe").toString
    val orders = Tables.orders(spark, TestSpark.sfDir)
    val m = graft.operators.Audit.observedAction(orders, "audit",
      count(lit(1)).as("n_rows"),
      sum(when(col("o_custkey").isNull, 1).otherwise(0)).as("null_keys"),
      sum(col("o_totalprice").cast("decimal(18,2)")).as("total")) { obs =>
      obs.write.mode("overwrite").parquet(out)
    }
    val expect = orders.agg(count(lit(1)),
      sum(when(col("o_custkey").isNull, 1).otherwise(0)),
      sum(col("o_totalprice").cast("decimal(18,2)"))).head()
    assert(m.getAs[Long]("n_rows") == expect.getLong(0))
    assert(m.getAs[Long]("null_keys") == expect.getLong(1))
    assert(m.getAs[java.math.BigDecimal]("total") == expect.getDecimal(2))
    // the handle is one-shot and unregisters its listener; a second
    // audited action gets a fresh handle and fresh metrics
    val m2 = graft.operators.Audit.observedAction(orders.limit(10), "audit",
      count(lit(1)).as("n_rows")) { _.count() }
    assert(m2.getAs[Long]("n_rows") == 10L)
  }
}

package graft

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

// Temporary stage-level profiler — not part of the library surface.
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SCRATCH_SF_DIR", "/root/testdata/sf0.1")
    val qname = if (args.nonEmpty) args(0) else "d_ngram_jaccard"
    val spark = GraftSession.local("scratch", 32)
    val stages = ArrayBuffer.empty[(Int, Int, Long, Long, Long, Long, Long, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        val tm = si.taskMetrics
        stages += ((si.stageId, si.numTasks, wall, tm.executorRunTime,
          tm.executorCpuTime / 1000000, tm.jvmGCTime,
          tm.inputMetrics.recordsRead,
          tm.shuffleReadMetrics.recordsRead, tm.shuffleWriteMetrics.recordsWritten))
      }
    })
    if (qname == "probe") {
      import org.apache.spark.sql.functions._
      import graft.operators.Dedup
      import graft.sources.Tables
      def time(label: String)(f: => Long): Unit = {
        val t = System.nanoTime()
        val n = f
        println(f"[probe] $label%-34s ${(System.nanoTime() - t) / 1e9}%6.2f s  rows=$n")
      }
      val docs = Tables.documents(spark, sfDir)
      time("scan only")(docs.count())
      time("tokenize only")(docs.repartition(32, col("doc_id"))
        .select(graft.functions.TextFunctions.tokens(col("text")).as("t")).count())
      time("tokenize+size")(docs.repartition(32, col("doc_id"))
        .select(size(graft.functions.TextFunctions.tokens(col("text"))).as("n"))
        .agg(sum("n")).count())
      val sh = docs.repartition(32, col("doc_id"))
        .select(col("doc_id").as("doc"), graft.functions.TextFunctions.tokens(col("text")).as("__toks"))
        .select(col("doc"), explode(Dedup.wordNgrams(col("__toks"), 3)).as("g"))
      time("shingle explode")(sh.count())
      time("shingle+md5gid")(sh.select(col("doc"), Dedup.hashedGid(col("g")).as("gid")).count())
      time("shingle+xxgid")(sh.select(col("doc"), xxhash64(col("g")).as("gid")).count())
      time("docSets")(Dedup.hashedDocSets(docs, "doc_id", "text", 3).count())
      val ds = Dedup.hashedDocSets(docs, "doc_id", "text", 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      ds.count()
      time("sig from warm cache")(Dedup.minHashSignature(ds, 8).count())
      time("bands from warm cache")(Dedup.lshBands(Dedup.minHashSignature(ds, 8), 4, 2).count())
      time("cand from warm cache")(Dedup.lshCandidates(Dedup.lshBands(Dedup.minHashSignature(ds, 8), 4, 2)).count())
      spark.stop(); return
    }
    if (qname == "probedss") {
      import org.apache.spark.sql.functions._
      import graft.operators.Dedup
      import graft.sources.Tables
      def time(label: String)(f: => Long): Unit = {
        val t = System.nanoTime()
        val n = f
        println(f"[probe] $label%-34s ${(System.nanoTime() - t) / 1e9}%6.2f s  rows=$n")
      }
      val docs = Tables.documents(spark, sfDir)
      // warm the whole query once
      time("full query (cold)")(SparkEntry.queries("d_source_similarity")(spark, sfDir).count())
      spark.catalog.clearCache()
      time("full query (warm)")(SparkEntry.queries("d_source_similarity")(spark, sfDir).count())
      spark.catalog.clearCache()
      val ids2 = Dedup.hashedDocSets(docs, "doc_id", "text", 3)
        .join(docs.select(col("doc_id").as("doc"), col("source")), "doc")
        .select(col("source"), explode(col("gs")).as("gid")).distinct()
      time("ids2 (uncached)")(ids2.count())
      val c = ids2.persist()
      time("ids2 materialize cache")(c.count())
      time("ids2 from cache")(c.count())
      val byGid = c.groupBy("gid").agg(collect_set(col("source")).as("srcs"))
      time("byGid from cache")(byGid.count())
      time("comb explode+agg")(byGid.select(explode(expr(
        "filter(flatten(transform(srcs, x -> transform(srcs, y -> struct(x AS src_a, y AS src_b)))), p -> p.src_a < p.src_b)")).as("p"))
        .groupBy("p.src_a", "p.src_b").count().count())
      spark.stop(); return
    }
    if (qname == "probe9") {
      import org.apache.spark.sql.functions._
      import graft.sources.Tables
      import graft.functions.{TextFunctions, VectorFunctions}
      import org.apache.spark.sql.expressions.Window
      def time(label: String)(f: => Any): Unit = {
        val t = System.nanoTime()
        val n = f
        println(f"[probe] $label%-30s ${(System.nanoTime() - t) / 1e9}%6.2f s  out=$n")
      }
      val docs = Tables.documents(spark, sfDir)
      val tk = docs.select(col("doc_id"),
        explode(array_distinct(TextFunctions.tokens(col("text")))).as("tok"))
      time("tk")(tk.count())
      val dfTok = tk.groupBy("tok").agg(count(lit(1)).as("df"))
      val nn = docs.agg(count(lit(1)).as("nd"))
      val pr = docs.filter(col("doc_id") % 25 === 0).select(col("doc_id").as("q"))
      val kw = pr
        .join(tk.select(col("doc_id").as("q"), col("tok")), Seq("q"))
        .join(tk.select(col("doc_id").as("d"), col("tok")), Seq("tok"))
        .filter(col("d") =!= col("q"))
        .join(broadcast(dfTok), "tok").crossJoin(broadcast(nn))
        .groupBy("q", "d")
        .agg(expr("CAST(sum(CAST(ln(CAST(nd AS DOUBLE)/df) AS DECIMAL(28,18))) AS DOUBLE)").as("score"))
      time("kw")(kw.count())
      val kr = kw.withColumn("r", row_number().over(
          Window.partitionBy("q").orderBy(col("score").desc, col("d"))))
        .filter(col("r") <= 10)
      time("kr")(kr.count())
      val emb = Tables.embeddings(spark, sfDir)
      val vp = pr
        .join(emb.select(col("vec_id").as("q"), col("embedding").as("qe")), "q")
        .crossJoin(emb.select(col("vec_id").as("d"), col("embedding").as("nv")))
        .filter(col("d") =!= col("q"))
        .select(col("q"), col("d"), VectorFunctions.cosine(col("qe"), col("nv")).as("c"))
      time("vp")(vp.count())
      val vr = vp.withColumn("r", row_number().over(
          Window.partitionBy("q").orderBy(col("c").desc, col("d"))))
        .filter(col("r") <= 10)
      time("vr")(vr.count())
      val ckw = kw.localCheckpoint(true)
      time("rank over checkpointed kw")(
        ckw.withColumn("r", row_number().over(
            Window.partitionBy("q").orderBy(col("score").desc, col("d"))))
          .filter(col("r") <= 10).count())
      time("rank again (warm)")(
        ckw.withColumn("r", row_number().over(
            Window.partitionBy("q").orderBy(col("score").desc, col("d"))))
          .filter(col("r") <= 10).count())
      time("plain orderBy-limit over ckw")(
        ckw.orderBy(col("score").desc).limit(10).count())
      spark.stop(); return
    }
    if (qname == "probe8") {
      import org.apache.spark.sql.functions._
      import graft.sources.Tables
      def time(label: String)(f: => Any): Unit = {
        val t = System.nanoTime()
        val n = f
        println(f"[probe] $label%-34s ${(System.nanoTime() - t) / 1e9}%6.2f s  out=$n")
      }
      val data = Tables.orders(spark, sfDir).select(
        when(col("o_orderpriority") === "1-URGENT", 1.0).otherwise(0.0).as("y"),
        log(col("o_totalprice")).as("x1"),
        when(col("o_orderstatus") === "F", 1.0).otherwise(0.0).as("x2"))
        .coalesce(8)
      time("localCheckpoint")(data.localCheckpoint(true).count())
      val ck = data.localCheckpoint(true)
      val eta = "(0.1D + 0.01D*x1 + 0.02D*x2)"
      val p = s"(1.0D / (1.0D + exp(-$eta)))"
      def dsum18(e: String) = s"CAST(sum(CAST(($e) AS DECIMAL(38,18))) AS DOUBLE)"
      def dsumD(e: String) = s"sum($e)"
      val terms = Seq("y - p", "(y - p)*x1", "(y - p)*x2", "p*(1.0D-p)",
        "p*(1.0D-p)*x1", "p*(1.0D-p)*x2", "p*(1.0D-p)*x1*x1",
        "p*(1.0D-p)*x1*x2", "p*(1.0D-p)*x2*x2",
        "CASE WHEN y = 1.0D THEN ln(p) ELSE ln(1.0D-p) END")
      time("scan decimal sums x3")((1 to 3).map(_ =>
        ck.selectExpr("y", "x1", "x2", s"$p AS p")
          .selectExpr(terms.map(t => dsum18(t) + " AS c" + terms.indexOf(t)): _*).head()).length)
      time("scan double sums x3")((1 to 3).map(_ =>
        ck.selectExpr("y", "x1", "x2", s"$p AS p")
          .selectExpr(terms.map(t => dsumD(t) + " AS c" + terms.indexOf(t)): _*).head()).length)
      spark.stop(); return
    }
    if (qname == "probe7") {
      import org.apache.spark.sql.functions._
      import graft.sources.Tables
      def time(label: String)(f: => Any): Unit = {
        val t = System.nanoTime()
        val n = f
        println(f"[probe] $label%-34s ${(System.nanoTime() - t) / 1e9}%6.2f s  out=$n")
      }
      val li = Tables.lineitem(spark, sfDir)
      time("count")(li.count())
      time("double moment agg")(li.agg(count(lit(1)), sum("l_quantity"), sum("l_extendedprice"),
        sum(col("l_quantity")*col("l_quantity")), sum(col("l_extendedprice")*col("l_extendedprice")),
        sum(col("l_quantity")*col("l_extendedprice"))).collect().length)
      time("decimal moment agg")(li.agg(count(lit(1)),
        expr("sum(CAST(l_quantity AS DECIMAL(28,4)))"),
        expr("sum(CAST(l_extendedprice AS DECIMAL(28,4)))"),
        expr("sum(CAST(l_quantity*l_quantity AS DECIMAL(28,4)))"),
        expr("sum(CAST(l_extendedprice*l_extendedprice AS DECIMAL(38,4)))"),
        expr("sum(CAST(l_quantity*l_extendedprice AS DECIMAL(38,4)))")).collect().length)
      time("full q_mahalanobis x2")({
        graft.SparkEntry.queries("q_mahalanobis")(spark, sfDir).collect().length
        graft.SparkEntry.queries("q_mahalanobis")(spark, sfDir).collect().length
      })
      spark.stop(); return
    }
    if (qname == "probe6") {
      import org.apache.spark.sql.functions._
      import graft.sources.Tables
      def time(label: String)(f: => Any): Unit = {
        val t = System.nanoTime()
        val n = f
        println(f"[probe] $label%-34s ${(System.nanoTime() - t) / 1e9}%6.2f s  out=$n")
      }
      val daily = Tables.lineitem(spark, sfDir)
        .groupBy(col("l_shipdate").cast("date").as("day"))
        .agg(expr("CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6))) AS DOUBLE)").as("rev"))
      time("daily rollup")(daily.count())
      val a = daily.select(col("day").as("aday"), col("rev").as("arev"))
      val b = daily.select(col("day").as("bday"), col("rev").as("brev"))
      val slopes = a.join(b, col("aday") < col("bday"))
        .select(((col("brev") - col("arev")) /
          datediff(col("bday"), col("aday")).cast("double")).as("s"))
      time("pairs count")(slopes.count())
      time("percentile direct")(slopes.agg(expr("percentile(s, 0.5D)")).collect()(0))
      time("percentile after repart")(slopes.repartition(64).agg(expr("percentile(s, 0.5D)")).collect()(0))
      val st = daily.cache(); st.count()
      val a2 = st.select(col("day").as("aday"), col("rev").as("arev"))
      val b2 = st.select(col("day").as("bday"), col("rev").as("brev"))
      val sl2 = a2.join(b2, col("aday") < col("bday"))
        .select(((col("brev") - col("arev")) /
          datediff(col("bday"), col("aday")).cast("double")).as("s"))
      time("percentile from cached daily")(sl2.agg(expr("percentile(s, 0.5D)")).collect()(0))
      time("sort-based median")({
        val n = sl2.count()
        val k = ((n + 1) / 2).toInt
        val lo = sl2.orderBy(col("s")).limit(k + 1).orderBy(col("s").desc).limit(2).collect()
        lo.map(_.getDouble(0)).sum / 2
      })
      spark.stop(); return
    }
    if (qname == "probe5") {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.streaming.{OutputMode, Trigger}
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_stream_events_" +
        Integer.toHexString("/root/testdata/sf0.01".hashCode) + "late3"
      println(s"[probe5] dir=$dir files:")
      new java.io.File(dir).listFiles().foreach(f =>
        println(s"  ${f.getName} mod=${f.lastModified()}"))
      val ev = graft.streaming.Events.readEventStreamPaced(spark, dir, 1)
      val q = graft.streaming.Events.tumblingCounts(ev)
        .writeStream.format("memory").queryName("p5")
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      q.recentProgress.foreach(p =>
        println(s"[probe5] batch=${p.batchId} rows=${p.numInputRows} watermark=${p.eventTime.get("watermark")}"))
      q.stop()
      spark.stop(); return
    }
    if (qname == "probe4") {
      import org.apache.spark.sql.functions._
      import graft.sources.Tables
      def time(label: String)(f: => Long): Unit = {
        val t = System.nanoTime()
        val n = f
        println(f"[probe] $label%-34s ${(System.nanoTime() - t) / 1e9}%6.2f s  rows=$n")
      }
      val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey")
      time("scan")(li.count())
      val pr = li.as("a")
        .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_orderkey").as("ok"),
          (shiftleft(col("a.l_partkey"), 32) + col("b.l_partkey")).as("uv"))
      time("raw pair fanout")(pr.count())
      time("pair distinct")(pr.distinct().count())
      val e1 = pr.distinct().groupBy("uv").agg(count(lit(1)).as("w")).filter(col("w") >= 2)
      time("weights from distinct")(e1.count())
      val e2 = pr.groupBy("uv").agg(countDistinct(col("ok")).as("w")).filter(col("w") >= 2)
      time("weights via countDistinct")(e2.count())
      val it = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      time("item distinct")(it.count())
      val pr2 = it.as("a")
        .join(it.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select((shiftleft(col("a.pk"), 32) + col("b.pk")).as("uv"))
      val e3 = pr2.groupBy("uv").agg(count(lit(1)).as("w")).filter(col("w") >= 2)
      time("weights via item distinct")(e3.count())
      val liP = li.repartition(32, col("l_orderkey"))
      val prP = liP.as("a")
        .join(liP.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_orderkey").as("ok"),
          (shiftleft(col("a.l_partkey"), 32) + col("b.l_partkey")).as("uv"))
      time("pinned raw fanout")(prP.count())
      val eP = prP.groupBy("uv").agg(countDistinct(col("ok")).as("w")).filter(col("w") >= 2)
      time("pinned weights countDistinct")(eP.count())
      val eP2 = prP.distinct().groupBy("uv").agg(count(lit(1)).as("w")).filter(col("w") >= 2)
      time("pinned weights from distinct")(eP2.count())
      val e = e3.select(shiftright(col("uv"), 32).as("u"),
        col("uv").bitwiseAND(lit(0xffffffffL)).as("v")).localCheckpoint(true)
      time("edges checkpoint")(e.count())
      val adj = e.select(col("u").as("a"), col("v").as("b"))
        .unionAll(e.select(col("v").as("a"), col("u").as("b")))
      val deg = adj.groupBy(col("a").as("node")).agg(count(lit(1)).as("dg"))
      val cand = adj.as("x")
        .join(broadcast(adj.as("y")), col("x.a") === col("y.a") && col("x.b") < col("y.b"))
        .groupBy(col("x.b").as("u"), col("y.b").as("v"))
        .agg(count(lit(1)).as("cn"))
      val nw = cand.join(broadcast(e), Seq("u", "v"), "left_anti")
      val scored = nw
        .join(broadcast(deg.select(col("node").as("u"), col("dg").as("du"))), "u")
        .join(broadcast(deg.select(col("node").as("v"), col("dg").as("dv"))), "v")
        .select(col("u"), col("v"), col("cn").cast("long").as("cn"),
          (col("cn").cast("double") / (col("du") + col("dv") - col("cn"))).as("jaccard"))
      time("wedge+anti+score tail")(graft.operators.Relational.topKByAgg(scored, 50,
        Seq(col("cn").desc, col("jaccard").desc, col("u"), col("v"))).count())
      spark.stop(); return
    }
    if (qname == "probe3") {
      import org.apache.spark.sql.functions._
      import graft.sources.Tables
      def time(label: String)(f: => Long): Unit = {
        val t = System.nanoTime()
        val n = f
        println(f"[probe] $label%-34s ${(System.nanoTime() - t) / 1e9}%6.2f s  rows=$n")
      }
      val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey")
      time("lineitem scan")(li.count())
      val pairs0 = li.as("a")
        .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      time("raw pairs")(pairs0.count())
      val pairs = pairs0.distinct().persist()
      time("distinct pairs persist")(pairs.count())
      val deg = pairs.select(col("u").as("node"))
        .unionAll(pairs.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("dg"))
      time("degrees")(deg.count())
      val dmap = broadcast(deg)
      val oriented = pairs
        .join(dmap.select(col("node").as("u"), col("dg").as("du")), "u")
        .join(dmap.select(col("node").as("v"), col("dg").as("dv")), "v")
        .select(
          when(col("du") < col("dv") ||
               (col("du") === col("dv") && col("u") < col("v")), col("u"))
            .otherwise(col("v")).as("s"),
          when(col("du") < col("dv") ||
               (col("du") === col("dv") && col("u") < col("v")), col("v"))
            .otherwise(col("u")).as("t"))
        .persist()
      time("oriented persist")(oriented.count())
      val src = oriented.repartition(32, col("s"))
      val twoPath = src.as("e1")
        .join(src.as("e2"), col("e1.s") === col("e2.s") && col("e1.t") < col("e2.t"))
        .select(col("e1.t").as("x"), col("e2.t").as("y"))
      time("twoPath")(twoPath.count())
      val closing = oriented.select(
        least(col("s"), col("t")).as("cx"), greatest(col("s"), col("t")).as("cy"))
      time("semi probe")(twoPath
        .join(broadcast(closing), col("x") === col("cx") && col("y") === col("cy"), "left_semi")
        .count())
      spark.stop(); return
    }
    if (qname == "probe2") {
      import org.apache.spark.sql.functions._
      import graft.operators.Dedup
      import graft.sources.Tables
      def time(label: String)(f: => Long): Unit = {
        val t = System.nanoTime()
        val n = f
        println(f"[probe] $label%-34s ${(System.nanoTime() - t) / 1e9}%6.2f s  rows=$n")
      }
      val docs = Tables.documents(spark, sfDir)
      val ds = Dedup.hashedDocSets(docs, "doc_id", "text", 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("docSets eager")(ds.count())
      val buckets = Dedup.docIds(ds)
        .repartition(32, col("gid"))
        .groupBy("gid").agg(sort_array(collect_set(col("doc"))).as("docs"))
        .filter(size(col("docs")) > 1)
      time("A: buckets only")(buckets.count())
      time("A: buckets only (2nd)")(buckets.count())
      time("A: buckets only (3rd)")(buckets.count())
      time("A: bucket explode pairs")(
        buckets.select(col("docs"), posexplode(col("docs")))
          .select(col("col").as("a"), expr("slice(docs, pos + 2, size(docs))").as("rest"))
          .select(col("a"), explode(col("rest")).as("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("inter")).count())
      val idsP = Dedup.docIds(ds).repartition(32, col("gid"))
      time("B: self-join pairs")(
        idsP.as("x").join(idsP.hint("shuffle_hash").as("y"),
            col("x.gid") === col("y.gid") && col("x.doc") < col("y.doc"))
          .groupBy(col("x.doc").as("a"), col("y.doc").as("b"))
          .agg(count(lit(1)).as("inter")).count())
      time("B2: self-join sortmerge")(
        idsP.as("x").join(idsP.as("y"),
            col("x.gid") === col("y.gid") && col("x.doc") < col("y.doc"))
          .groupBy(col("x.doc").as("a"), col("y.doc").as("b"))
          .agg(count(lit(1)).as("inter")).count())
      spark.stop(); return
    }
    if (qname == "confcheck") {
      Seq("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "spark.sql.codegen.hugeMethodLimit",
        "spark.sql.codegen.aggregate.map.twolevel.enabled").foreach { k =>
        println(s"[conf] $k = ${spark.conf.get(k)}")
      }
      spark.stop(); return
    }
    if (qname == "ivf") {
      import org.apache.spark.sql.functions._
      import graft.operators.Similarity
      import graft.sources.Tables
      val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      val cents = Similarity.trainIvfCentroids(emb, "embedding", 16)
      println(s"[ivf] centroid norms: ${cents.map(c => math.sqrt(c.map(x => x.toDouble * x).sum)).map(n => f"$n%.2f").mkString(",")}")
      val assigned = emb.select(col("vec_id"), col("label"),
        Similarity.ivfDebugList(col("embedding"), cents).as("list"))
      assigned.groupBy("label").agg(count_distinct(col("list")).as("n_lists"),
          count(lit(1)).as("n")).orderBy("label").show(20, false)
      assigned.groupBy("list").agg(count(lit(1)).as("n")).orderBy(desc("n")).show(20, false)
      spark.stop(); return
    }
    val t0 = System.nanoTime()
    SparkEntry.queries(qname)(spark, sfDir).count()
    println(f"[scratch] $qname total: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    if (args.length > 1 && args(1) == "twice") {
      spark.catalog.clearCache(); System.gc()
      val t1 = System.nanoTime()
      SparkEntry.queries(qname)(spark, sfDir).count()
      println(f"[scratch] $qname 2nd run: ${(System.nanoTime() - t1) / 1e9}%.1f s")
    }
    Thread.sleep(1000)
    println("[scratch] stageId tasks wallMs execRunMs cpuMs gcMs inputRec shufReadRec shufWriteRec")
    stages.sortBy(-_._3).take(14).foreach { case (id, n, w, r, c, g, ir, sr, sw) =>
      println(f"[scratch] $id%7d $n%5d $w%7d $r%9d $c%7d $g%6d $ir%9d $sr%11d $sw%12d")
    }
    spark.stop()
  }
}

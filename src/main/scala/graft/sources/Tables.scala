package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types._

/** Schema-explicit readers/writers for the engine's tables (SURVEY §2 G1-G5).
  *
  * The reference lands CSVs in S3, loads Postgres via row-wise INSERT, and
  * re-exports parquet through pandas (airflow.py:744-751, 463-515,
  * 718-731). Spark-first: columnar parquet with explicit schemas so scans
  * prune columns (`ReadSchema`) and never pay inference; CSV/JSON readers
  * are schema-explicit for the same reason (inference = extra full pass).
  */
object Tables {

  val schemas: Map[String, StructType] = Map(
    "region" -> StructType(Seq(
      StructField("r_regionkey", IntegerType), StructField("r_name", StringType))),
    "nation" -> StructType(Seq(
      StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType))),
    "customer" -> StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType))),
    "supplier" -> StructType(Seq(
      StructField("s_suppkey", LongType), StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType), StructField("s_acctbal", DoubleType))),
    "part" -> StructType(Seq(
      StructField("p_partkey", LongType), StructField("p_name", StringType),
      StructField("p_brand", StringType), StructField("p_type", StringType),
      StructField("p_size", IntegerType), StructField("p_retailprice", DoubleType))),
    "orders" -> StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType), StructField("o_orderpriority", StringType))),
    "lineitem" -> StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampType))),
    "events" -> StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType))),
    "documents" -> StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType))),
    "embeddings" -> StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
  )

  /** Read one of the known tables from a scale-factor directory. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.parquet` has carried `ts` in two physical forms across
    * driver-generated testdata revisions: parquet TIMESTAMP(NANOS) (which
    * Spark 4 rejects unless read as long — truncate to micros, matching
    * DuckDB's µs semantics) and plain TIMESTAMP(µs) without UTC adjustment
    * (which Spark reads as TIMESTAMP_NTZ). Branch on the type actually
    * read so both land as the session-UTC TimestampType every downstream
    * query and oracle expects — an unconditional `ts div 1000` here broke
    * all 20 event queries when the data switched to µs. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Schema-explicit CSV reader (reference lands CSVs: airflow.py:744). */
  def readCsv(spark: SparkSession, path: String, schema: StructType, header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", header.toString).csv(path)

  /** Schema-explicit JSON reader (Socrata/Yelp payloads: airflow.py:93-125). */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC read/write (G11) — the second columnar interchange format; same
    * pushdown/pruning behavior as parquet under Spark's vectorized ORC
    * reader, for warehouses whose existing lake is ORC (Hive lineage). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Partitioned parquet writer — the reference's S3 export (airflow.py:718)
    * done columnar + partitioned so downstream scans partition-prune. */
  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Bucketed managed table: rows hash-partitioned into `nBuckets` files
    * per partition BY KEY AT WRITE TIME, with the layout recorded in the
    * catalog. A join or aggregation on the bucket key then needs NO
    * exchange at read time — the shuffle is paid once when the table is
    * built, not by every downstream query. This is the co-located-join
    * primitive for fact tables that join repeatedly on the same key
    * (orders⋈customer on custkey every day at 100 TB): both sides
    * bucketed by the key × same bucket count ⇒ sort-merge join with
    * zero Exchange nodes (spec'd in SourcesSpec). `sortCols` pre-sorts
    * within buckets so even the merge-sort is read-time-free. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    var w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.saveAsTable(table)
  }

  /** Small-files compaction (G12) — the lake-maintenance pass every
    * streaming/incremental writer eventually needs: a path accumulated
    * thousands of tiny files (one per microbatch × partition), and scan
    * cost is now dominated by per-file open/footer overhead, not bytes.
    * Rewrite to `ceil(rows / targetRowsPerFile)` evenly-sized files via a
    * round-robin repartition (no key skew — this is layout, not
    * semantics). Never compact in place: write beside, then swap — a
    * failed in-place rewrite loses the table. The read-back equality +
    * file-count collapse is spec'd (SourcesSpec). */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetRowsPerFile: Long): Unit = {
    val df = spark.read.parquet(inPath)
    val rows = df.count()
    val nFiles = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    df.repartition(nFiles).write.mode(SaveMode.Overwrite).parquet(outPath)
  }

  /** JDBC surface mirroring the reference's Postgres stage
    * (airflow.py:560-650). Round-trip spec'd against embedded Derby
    * (SourcesSpec): partitioned-read options are the part that matters at
    * scale (N parallel range-bounded connections, not one cursor). */
  def jdbcRead(spark: SparkSession, url: String, table: String,
               partitionColumn: Option[(String, Long, Long, Int)] = None,
               props: Map[String, String] = Map.empty): DataFrame = {
    var r: DataFrameReader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    props.foreach { case (k, v) => r = r.option(k, v) }
    partitionColumn.foreach { case (col, lo, hi, n) =>
      r = r.option("partitionColumn", col).option("lowerBound", lo.toString)
        .option("upperBound", hi.toString).option("numPartitions", n.toString)
    }
    r.load()
  }

  def jdbcWrite(df: DataFrame, url: String, table: String,
                props: Map[String, String] = Map.empty): Unit = {
    var w = df.write.format("jdbc").option("url", url).option("dbtable", table)
    props.foreach { case (k, v) => w = w.option(k, v) }
    w.mode(SaveMode.Append).save()
  }
}

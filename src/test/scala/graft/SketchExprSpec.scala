package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.sources.Tables

/** The native sketch expressions (graft_gid_set / graft_minhash /
  * graft_simhash and their _xx twins) are single-pass projection forms of
  * the distributive explode+aggregate formulations they replaced. These
  * specs pin bit-identity between the two shapes on the REAL sf0.001
  * corpus — any drift in hashing, permutation arithmetic, or set
  * semantics fails here before it can silently skew candidate
  * generation. */
class SketchExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, TestSpark.sfDir)

  private def sortedSets(df: DataFrame): Map[Long, Seq[Long]] =
    df.select(col("doc"), sort_array(col("gs")).as("gs"))
      .as[(Long, Seq[Long])].collect().toMap

  test("gid-set projection equals the explode+collect_set aggregate (md5 mode)") {
    val a = sortedSets(Dedup.hashedDocSets(docs, "doc_id", "text", 3))
    val b = sortedSets(Dedup.hashedDocSetsViaAgg(docs, "doc_id", "text", 3))
    assert(a == b)
  }

  test("gid-set projection equals the aggregate (xxhash64 mode)") {
    val a = sortedSets(Dedup.hashedDocSetsXx(docs, "doc_id", "text", 3))
    val b = sortedSets(Dedup.hashedDocSetsXxViaAgg(docs, "doc_id", "text", 3))
    assert(a == b)
  }

  private def rows(df: DataFrame): Set[Seq[Long]] =
    df.collect().map(_.toSeq.map(_.asInstanceOf[Long])).toSet

  test("one-pass minhash signature is bit-identical to the k-min aggregate") {
    val sets = Dedup.hashedDocSets(docs, "doc_id", "text", 3)
    assert(rows(Dedup.minHashSignature(sets, 8)) ==
      rows(Dedup.minHashSignatureViaAgg(sets, 8)))
  }

  test("one-pass xx minhash signature matches the xxhash64 column aggregate") {
    val sets = Dedup.hashedDocSetsXx(docs, "doc_id", "text", 3)
    assert(rows(Dedup.minHashSignatureXx(sets, 8)) ==
      rows(Dedup.minHashSignatureXxViaAgg(sets, 8)))
  }

  test("one-pass simhash is bit-identical to the vote aggregate") {
    val sets = Dedup.hashedDocSets(docs, "doc_id", "text", 1)
    assert(rows(Dedup.simHash(sets, 32)) == rows(Dedup.simHashViaAgg(sets, 32)))
  }

  test("degenerate inputs: empty shingle arrays and SQL callers") {
    // Below-n docs produce empty shingle arrays; the set/signature
    // expressions must stay total (and hashedDocSets filters the empties,
    // matching the aggregate form where such docs never appear).
    val out = spark.sql(
      """SELECT graft_gid_set(array()) AS g,
        |       graft_minhash(array(), 4) AS m,
        |       graft_minhash_xx(array(), 4) AS mx,
        |       graft_simhash(array(), 16) AS s,
        |       graft_gid_set(graft_shingles('one two', 5)) AS below_n
        |""".stripMargin).collect().head
    assert(out.getSeq[Long](0).isEmpty)
    assert(out.getSeq[Long](1).isEmpty)
    assert(out.getSeq[Long](2).isEmpty)
    assert(out.getLong(3) == 0L)
    assert(out.getSeq[Long](4).isEmpty)
    val tiny = Seq((1L, "a b")).toDF("doc_id", "text")
    assert(Dedup.hashedDocSets(tiny, "doc_id", "text", 3).count() == 0)
  }

  test("gid set dedups colliding shingles exactly once") {
    // A doc whose shingle multiset repeats: set semantics must hold.
    val df = Seq((1L, "x y x y x y")).toDF("doc_id", "text")
    val gs = sortedSets(Dedup.hashedDocSets(df, "doc_id", "text", 2))(1L)
    // shingles: "x y","y x","x y","y x","x y" → 2 distinct
    assert(gs.length == 2 && gs.distinct.length == 2)
  }

  test("graft_minhash_agg: 1-member group = scalar signature; merge tree partition-invariant (D13)") {
    import org.apache.spark.sql.functions._
    val one = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val gs = Dedup.hashedDocSets(one, "doc_id", "text", 3)
    val viaAgg = gs.groupBy().agg(expr("graft_minhash_agg(gs, 16)").as("sig"))
      .head().getAs[scala.collection.Seq[Long]]("sig").toSeq
    val scalar = gs.select(expr("graft_minhash(gs, 16)").as("sig"))
      .head().getAs[scala.collection.Seq[Long]]("sig").toSeq
    assert(viaAgg == scalar, "a single-member group's aggregate must equal the scalar MinHash")

    // merge correctness: the signature must not depend on the partition layout
    val sets = Dedup.hashedDocSets(docs, "doc_id", "text", 3)
      .join(docs.select(col("doc_id").as("doc"), col("source")), "doc")
    def sigs(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("source").agg(expr("graft_minhash_agg(gs, 32)").as("sig"))
        .collect().map(r => r.getString(0) ->
          r.getAs[scala.collection.Seq[Long]]("sig").toSeq).toMap
    assert(sigs(sets.repartition(1)) == sigs(sets.repartition(17, col("gs"))),
      "merge must be layout-invariant (associative + commutative elementwise min)")
  }

  test("graft_minhash_agg edge cases: empty groups emit the EMPTY signature, not the sentinel (D13)") {
    import org.apache.spark.sql.functions._
    // all-empty gid sets: no permutation min ever lands → eval must emit
    // an EMPTY array (the scalar graft_minhash contract), NOT the raw
    // k× Long.MaxValue buffer — two degenerate sources would otherwise
    // compare slot-for-slot equal and score Jaccard 1.0
    val empty = Seq((1L, Seq.empty[Long]), (2L, Seq.empty[Long]))
      .toDF("doc", "gs")
    val sig = empty.groupBy().agg(expr("graft_minhash_agg(gs, 8)").as("sig"))
      .head().getAs[scala.collection.Seq[Long]]("sig")
    assert(sig.isEmpty, "an all-empty group's signature must be empty")
    // two all-empty sources through the D13 estimate arithmetic score 0
    val two = Seq(("a", Seq.empty[Long]), ("b", Seq.empty[Long])).toDF("source", "gs")
    val sigs = two.groupBy("source").agg(expr("graft_minhash_agg(gs, 8)").as("sig"))
    val a = sigs.filter(col("source") === "a").select(col("sig").as("sa"))
    val b = sigs.filter(col("source") === "b").select(col("sig").as("sb"))
    val est = a.crossJoin(b)
      .select((expr("aggregate(zip_with(sa, sb, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END), 0, (acc, v) -> acc + v)")
        .cast("double") / 8.0).as("j"))
      .head().getAs[Double]("j")
    assert(est == 0.0, s"two empty sources must estimate Jaccard 0, got $est")
    // null rows are skipped, non-null rows still fold
    val mixed = Seq((1L, Option(Seq(42L))), (2L, Option.empty[Seq[Long]]))
      .toDF("doc", "gs")
    val sig2 = mixed.groupBy().agg(expr("graft_minhash_agg(gs, 8)").as("sig"))
      .head().getAs[scala.collection.Seq[Long]]("sig")
    assert(sig2.length == 8 && sig2.forall(_ != Long.MaxValue),
      "the non-null row must populate every slot")
  }

  test("d_source_sim_est sits inside the MinHash error envelope of the exact D13a values") {
    val exact = SparkEntry.queries("d_source_similarity")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        r.getAs[Double]("jaccard")).toMap
    val est = SparkEntry.queries("d_source_sim_est")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        r.getAs[Double]("jaccard_est")).toMap
    assert(est.keySet == exact.keySet)
    // k=128 ⇒ σ = sqrt(J(1−J)/k) ≤ 0.0442; allow 4σ
    est.foreach { case (k, e) =>
      assert(math.abs(e - exact(k)) <= 0.18, s"$k: est $e exact ${exact(k)}")
    }
  }
}

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
}

package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.sources.Tables

/** SURVEY §2 group C — text analysis over the `documents` table. */
object TextQueries {

  private val toks = tokensDuck("text")

  /** The cleaning chain's survivors as a reusable SQL fragment:
    * quality ≥ 0.4 ∧ predicted-en ∧ exact-dedup-keep-first, carrying
    * (doc_id, text, n_tokens, quality). Shared by p_corpus_clean and the
    * composed p_llm_prep oracle. */
  private def keptSql: String = {
    val enStops = langProfiles.find(_._1 == "en").get._2
    val scoreCols = langProfiles.map { case (lang, words) =>
      s"${stopwordCountDuck("toks", words)} AS s_$lang"
    }
    val scoreNames = langProfiles.map { case (lang, _) => s"s_$lang" }
    s"""SELECT doc_id, text, n_tokens, quality FROM (
       |  SELECT doc_id, text, n_tokens, quality,
       |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
       |  FROM (
       |    SELECT doc_id, text, n_tokens,
       |      least(CAST(n_tokens AS DOUBLE)/100.0, 1.0)*0.4 + stop_ratio*0.3 +
       |        (1.0 - punct_ratio)*0.2 + least(avg_token_len/10.0, 1.0)*0.1 AS quality,
       |      ${langIdFromScoresDuck(scoreNames)} AS pred_lang
       |    FROM (
       |      SELECT doc_id, text, len(toks) AS n_tokens,
       |        CASE WHEN length(text) > 0 THEN
       |          CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE)
       |          ELSE 0.0 END AS punct_ratio,
       |        CASE WHEN len(toks) > 0 THEN
       |          CAST(${stopwordCountDuck("toks", enStops)} AS DOUBLE) / CAST(len(toks) AS DOUBLE)
       |          ELSE 0.0 END AS stop_ratio,
       |        CASE WHEN len(toks) > 0 THEN
       |          CAST(list_reduce(list_prepend(0, list_transform(toks, t -> length(t))), (a,b) -> a+b) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
       |          ELSE 0.0 END AS avg_token_len,
       |        ${scoreCols.mkString(", ")}
       |      FROM (SELECT doc_id, text, $toks AS toks FROM documents)))
       |  WHERE quality >= 0.4 AND pred_lang = 'en')
       |WHERE rn = 1""".stripMargin
  }

  /** Spark twin of [[keptSql]]. */
  private def keptDf(s: org.apache.spark.sql.SparkSession, d: String) = {
    import graft.operators.Relational
    // Repartition the raw text BEFORE the expensive tokenize/score chain:
    // a small-file corpus otherwise runs the whole regex pipeline on
    // however few partitions the scan produced (measured: ONE 4 s task
    // for all of sf0.1 — same pitfall Dedup.explodedShingles guards).
    val spread = Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
    val base = spread.withColumn("__toks", tokens(col("text")))
      .withColumn("__scores", stopwordScores(col("__toks")))
    val comps = qualityComponents(col("text"), col("__toks"),
      element_at(col("__scores"), langIndex("en") + 1))
    val withComps = comps.foldLeft(base) { case (df, (n, c)) => df.withColumn(n, c) }
    val scored = withComps
      .withColumn("quality", qualityScore(col("n_tokens"), col("punct_ratio"),
        col("stop_ratio"), col("avg_token_len")))
      .withColumn("pred_lang", langIdFromScores(langProfiles.zipWithIndex.map {
        case (_, i) => element_at(col("__scores"), i + 1)
      }))
    val kept = scored.filter(col("quality") >= 0.4 && col("pred_lang") === "en")
    Relational.dedupKeepFirst(kept.withColumn("__h", md5(col("text"))),
        Seq("__h"), Seq(col("doc_id")))
      .select("doc_id", "text", "n_tokens", "quality")
  }

  val all: Seq[QueryDef] = Seq(

    // C1 — token count (whitespace+regex tokenizer) + char length.
    QueryDef.sql("t_token_count",
      s"""SELECT doc_id, len($toks) AS n_tokens, length(text) AS n_chars_calc
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(
          col("doc_id"),
          tokenCount(col("text")).as("n_tokens"),
          length(col("text")).as("n_chars_calc"))
        .orderBy("doc_id")
    },

    // C2 — quality scoring from length/punctuation/stopword/word-length
    // heuristics; components exposed so the blend is auditable.
    QueryDef.sql("t_quality_score", {
      val enStops = langProfiles.find(_._1 == "en").get._2
      s"""SELECT doc_id, n_tokens, punct_ratio, stop_ratio, avg_token_len,
         |  least(CAST(n_tokens AS DOUBLE)/100.0, 1.0)*0.4 + stop_ratio*0.3 +
         |    (1.0 - punct_ratio)*0.2 + least(avg_token_len/10.0, 1.0)*0.1 AS quality
         |FROM (
         |  SELECT doc_id, len(toks) AS n_tokens,
         |    CASE WHEN length(text) > 0 THEN
         |      CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE)
         |      ELSE 0.0 END AS punct_ratio,
         |    CASE WHEN len(toks) > 0 THEN
         |      CAST(${stopwordCountDuck("toks", enStops)} AS DOUBLE) / CAST(len(toks) AS DOUBLE)
         |      ELSE 0.0 END AS stop_ratio,
         |    CASE WHEN len(toks) > 0 THEN
         |      CAST(list_reduce(list_prepend(0, list_transform(toks, t -> length(t))), (a,b) -> a+b) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
         |      ELSE 0.0 END AS avg_token_len
         |  FROM (SELECT doc_id, text, $toks AS toks FROM documents))
         |ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val base = Tables.documents(s, d).withColumn("__toks", tokens(col("text")))
        .withColumn("__scores", stopwordScores(col("__toks")))
      val comps = qualityComponents(col("text"), col("__toks"),
        element_at(col("__scores"), langIndex("en") + 1))
      val withComps = comps.foldLeft(base) {
        case (df, (name, c)) => df.withColumn(name, c)
      }
      withComps.select(
          col("doc_id"), col("n_tokens"), col("punct_ratio"), col("stop_ratio"),
          col("avg_token_len"),
          qualityScore(col("n_tokens"), col("punct_ratio"), col("stop_ratio"),
            col("avg_token_len")).as("quality"))
        .orderBy("doc_id")
    },

    // C3 — stopword-overlap language ID (argmax over profiles, ties to the
    // alphabetically first language); prediction shown against the label.
    QueryDef.sql("t_langid", {
      val scoreCols = langProfiles.map { case (lang, words) =>
        s"${stopwordCountDuck("toks", words)} AS s_$lang"
      }
      val scoreNames = langProfiles.map { case (lang, _) => s"s_$lang" }
      s"""SELECT doc_id, lang AS actual_lang,
         |  ${langIdFromScoresDuck(scoreNames)} AS pred_lang
         |FROM (SELECT doc_id, lang, ${scoreCols.mkString(", ")}
         |      FROM (SELECT doc_id, lang, $toks AS toks FROM documents))
         |ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val base = Tables.documents(s, d).withColumn("__toks", tokens(col("text")))
        .withColumn("__scores", stopwordScores(col("__toks")))
      base.select(
          col("doc_id"), col("lang").as("actual_lang"),
          langIdFromScores(langProfiles.zipWithIndex.map {
            case (_, i) => element_at(col("__scores"), i + 1)
          }).as("pred_lang"))
        .orderBy("doc_id")
    },

    // C5 — the training-data cleaning pipeline composed end-to-end:
    // quality score + language ID -> keep en docs above threshold ->
    // exact-dedup keep-first -> per-doc stats. One declarative plan, so
    // Catalyst fuses the whole chain over a single documents scan.
    QueryDef.sql("p_corpus_clean",
      s"""SELECT doc_id, n_tokens, quality FROM ($keptSql)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      keptDf(s, d).select("doc_id", "n_tokens", "quality").orderBy("doc_id")
    },

    // C6 — the FULL LLM corpus-prep pipeline: the C5 cleaning chain, then
    // MinHash+LSH near-dup removal over the survivors (keep the lower
    // doc_id of every verified pair, jaccard ≥ 0.5). One composed plan:
    // quality/langid/exact-dedup fuse over one documents scan, the
    // near-dup stage reuses the per-doc shingle sets, and the final
    // anti-join removes the near-dup losers. This is the end-to-end
    // shape of a pre-training data pipeline; every stage is the same
    // fragment already hash-verified standalone (C5, D3).
    QueryDef.sql("p_llm_prep",
      s"""WITH kept AS ($keptSql),
         |${DedupQueries.idsCte(3, "kept")},
         |${DedupQueries.minhashVerifyCte(0.5)}
         |SELECT doc_id, n_tokens, quality FROM kept
         |WHERE doc_id NOT IN (SELECT b FROM nd)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      import graft.operators.Dedup
      val kept = keptDf(s, d).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      kept.count() // eager fill: cleaning chain feeds both branches below
      val docSets = Dedup.hashedDocSets(kept.select("doc_id", "text"), "doc_id", "text", 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      docSets.count()
      val nd = Dedup.verifiedJaccard(
          Dedup.lshCandidates(Dedup.lshBands(Dedup.minHashSignature(docSets, 8), 4, 2)),
          docSets)
        .filter(col("jaccard") >= 0.5)
      kept.join(nd.select(col("b").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
        .select("doc_id", "n_tokens", "quality")
        .orderBy("doc_id")
    },

    // C7 — corpus-wide token frequencies, top-20: explode the token
    // arrays and partial-aggregate — the map-side combine absorbs the
    // fan-out, the final top-k is TakeOrderedAndProject (no global
    // sort). The vocabulary-statistics staple of corpus analysis.
    QueryDef.sql("t_frequent_tokens",
      s"""SELECT tok, n FROM (
         |  SELECT tok, count(*) AS n
         |  FROM (SELECT unnest($toks) AS tok FROM documents)
         |  GROUP BY tok)
         |ORDER BY n DESC, tok LIMIT 20""".stripMargin) { (s, d) =>
      import graft.operators.Relational
      Relational.topKByAgg(
        Tables.documents(s, d)
          .select(explode(tokens(col("text"))).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("n")),
        20, Seq(col("n").desc, col("tok")))
    },

    // C4 — rolling-hash document fingerprint (char-stream polynomial fold;
    // production path is xxhash64 — see TextFunctions.xxFingerprint).
    QueryDef.sql("t_fingerprint",
      s"""SELECT doc_id, ${charFingerprintDuck("text")} AS fp
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), charFingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }
  )
}

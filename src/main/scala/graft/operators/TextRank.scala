package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-scoring and corpus-curation operators over `documents`:
  * BM25 ranking, stratified sampling, n-gram vocabulary building — the
  * query-side and curation-side companions to the dedup/similarity family
  * in [[TextQueries]].
  */
object TextRank {
  type Q = (SparkSession, String) => DataFrame

  private def toks(colName: String) =
    posexplode(regexp_extract_all(lower(col(colName)), lit("[a-z0-9]+"), lit(0)))

  /** BM25 top-20 for a fixed conjunctive keyword query (k1=1.2, b=0.75).
    *
    * Plan: one explode over tokens feeds BOTH doc lengths and filtered
    * per-term tfs; document frequencies and the global (N, avgdl) fold to
    * single-row aggregates that broadcast into a crossJoin (never a
    * driver collect); per-term tfs PIVOT into fixed columns so the final
    * score is one fixed left-to-right expression — double addition is not
    * associative, so summing term contributions in engine-arbitrary row
    * order would not reproduce the oracle bit-for-bit. `ln` is
    * transcendental, so the score is rounded (6 dp) AFTER all arithmetic
    * (rounding pure-rational doubles would flap on .xx5 boundaries;
    * post-irrational rounding is safe — SURVEY §4). */
  def textBm25Topk(s: SparkSession, dir: String): DataFrame = {
    val terms = Seq("spark", "join", "fast", "table")
    val tok = t(s, dir, "documents")
      .select(col("doc_id"), toks("text").as(Seq("pos", "w")))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val tf = tok.filter(col("w").isInCollection(terms))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val tfCols = terms.map(tm =>
      coalesce(max(when(col("w") === tm, col("tf"))), lit(0L)).as(s"tf_$tm"))
    val pivoted = tf.groupBy("doc_id").agg(tfCols.head, tfCols.tail: _*)
    val stats = dl.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val dfCols = terms.map(tm =>
      coalesce(max(when(col("w") === tm, col("df"))), lit(0L)).as(s"df_$tm"))
    val dfs = tf.groupBy("w").agg(count(lit(1)).as("df"))
      .agg(dfCols.head, dfCols.tail: _*)
    def part(tm: String) = {
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"df_$tm") + lit(0.5)) / (col(s"df_$tm") + lit(0.5)))
      val tfc = col(s"tf_$tm").cast("double")
      idf * (tfc * lit(2.2)) /
        (tfc + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
    }
    pivoted.join(dl, "doc_id")
      .crossJoin(broadcast(stats)).crossJoin(broadcast(dfs))
      .select(col("doc_id"),
        round(terms.map(part).reduceLeft(_ + _), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(20)
  }

  private val BM25_SQL = {
    val terms = Seq("spark", "join", "fast", "table")
    val inList = terms.map(tm => s"'$tm'").mkString(", ")
    def part(tm: String) =
      s"""ln(CAST(1.0 AS DOUBLE) + (CAST(n_docs AS DOUBLE) - df_$tm + CAST(0.5 AS DOUBLE))
         |    / (df_$tm + CAST(0.5 AS DOUBLE)))
         |  * (CAST(tf_$tm AS DOUBLE) * CAST(2.2 AS DOUBLE))
         |  / (CAST(tf_$tm AS DOUBLE) + CAST(1.2 AS DOUBLE)
         |     * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / avgdl))""".stripMargin
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
       |  FROM documents),
       |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
       |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok
       |       WHERE w IN ($inList) GROUP BY doc_id, w),
       |pv AS (SELECT doc_id,
       |${terms.map(tm => s"  COALESCE(MAX(CASE WHEN w = '$tm' THEN tf END), 0) AS tf_$tm").mkString(",\n")}
       |       FROM tf GROUP BY doc_id),
       |st AS (SELECT COUNT(*) AS n_docs,
       |         CAST(CAST(SUM(dl) AS BIGINT) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
       |dfs AS (SELECT
       |${terms.map(tm => s"  COALESCE(MAX(CASE WHEN w = '$tm' THEN df END), 0) AS df_$tm").mkString(",\n")}
       |        FROM (SELECT w, COUNT(*) AS df FROM tf GROUP BY w)),
       |scored AS (
       |  SELECT pv.doc_id,
       |    ROUND(${terms.map(part).mkString("\n  + ")}, 6) AS bm25
       |  FROM pv JOIN dl ON pv.doc_id = dl.doc_id, st, dfs)
       |SELECT doc_id, bm25 FROM scored ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin
  }

  /** Deterministic stratified sampling: per-language keep rates applied
    * via a content-hash digit (never random() or row order — re-runs and
    * retries must keep the same rows). The majority language is
    * downsampled to 4/16 (~25%), the tail kept at 12/16 (~75%) — the
    * standard rebalancing move before training-data mixing. A narrow
    * filter projection: no shuffle, fully parallel. */
  def dataSampleStratified(s: SparkSession, dir: String): DataFrame = {
    val bucket = substring(md5(col("text").cast("binary")), 1, 1)
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), bucket.as("bucket_hex"))
      .filter(bucket <= when(col("lang") === "en", "3").otherwise("b"))
  }

  private val SAMPLE_SQL =
    """SELECT doc_id, lang, substr(md5(text), 1, 1) AS bucket_hex
      |FROM documents
      |WHERE substr(md5(text), 1, 1) <=
      |  CASE WHEN lang = 'en' THEN '3' ELSE 'b' END""".stripMargin

  /** Exactly-k-per-stratum sampling (eval-set construction): the k docs
    * with the smallest content hash per language — deterministic under
    * retries AND under corpus growth-at-the-tail, unlike rate sampling
    * whose output size drifts with the stratum. rank ≤ k compiles to
    * WindowGroupLimit: each task pre-prunes to its local top-k before
    * the per-stratum shuffle, so only k·strata·tasks rows move. */
  def dataSampleFixedK(s: SparkSession, dir: String): DataFrame = {
    val k = 25
    val byLang = Window.partitionBy("lang")
      .orderBy(col("h"), col("doc_id"))
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        md5(col("text").cast("binary")).as("h"))
      .withColumn("rn", row_number().over(byLang).cast("long"))
      .filter(col("rn") <= k)
      .select("doc_id", "lang", "rn")
  }

  private val FIXEDK_SQL =
    """SELECT doc_id, lang, rn FROM (
      |  SELECT doc_id, lang,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rn
      |  FROM documents)
      |WHERE rn <= 25""".stripMargin

  /** Benchmark-contamination screen: for each EVAL document (doc_id <
    * 25 stands in for the held-out benchmark), the fraction of its word
    * 5-grams that appear anywhere in the TRAIN corpus — the standard
    * train/test overlap check run before any evaluation is trusted.
    * Distinct from pairwise dedup: containment against the whole corpus,
    * not similarity between pairs.
    *
    * Plan: distinct 5-gram sets on both sides (window-lead shingling,
    * codegen), train side reduced to a DISTINCT shingle set (the
    * inverted-index key space, NOT doc pairs), one left join on the
    * shingle — at scale this is a bloom-filter-friendly semi-join shape
    * whose shuffle carries only (shingle) keys. */
  /** Distinct 5-token grams per doc (codegen window-lead composition) —
    * shared by the contamination screen and the repeated-ngram
    * boilerplate scorer; ONE definition so their gram universes cannot
    * drift. */
  private def gram5(df: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    // Explicit-width doc_id repartition replaces the window's tiny
    // AQE-coalesced exchange (the Shingles.trigramRows r14 note: the
    // single-split corpus file otherwise starves every downstream stage).
    val par = graft.Ckpt.textPar(df)
    df.repartition(par, col("doc_id"))
      .select(col("doc_id"), toks("text").as(Seq("pos", "w")))
      .select(col("doc_id"), concat_ws("_", col("w"),
        lead("w", 1).over(byDoc), lead("w", 2).over(byDoc),
        lead("w", 3).over(byDoc), lead("w", 4).over(byDoc)).as("g"),
        lead("w", 4).over(byDoc).as("tail"))
      .filter(col("tail").isNotNull) // drop short tail grams
      .select("doc_id", "g").distinct()
  }

  /** The matching gram CTE for the oracles (body of `g`). */
  private val GRAM5_CTE =
    """g AS (
      |  SELECT DISTINCT doc_id,
      |    ts[i] || '_' || ts[i+1] || '_' || ts[i+2] || '_' || ts[i+3] || '_' || ts[i+4] AS g
      |  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 4)) AS i
      |        FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
      |              FROM documents)))""".stripMargin

  def dedupContamination(s: SparkSession, dir: String): DataFrame = {
    def grams(df: DataFrame) = gram5(df)
    val docs = t(s, dir, "documents")
    val evalG = grams(docs.filter(col("doc_id") < 25))
    val trainG = grams(docs.filter(col("doc_id") >= 25))
      .select(col("g")).distinct().withColumn("hit", lit(1L))
    evalG.join(trainG, Seq("g"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_contaminated"))
      .withColumn("contamination",
        col("n_contaminated").cast("double") / col("n_grams"))
  }

  private val CONTAM_SQL =
    s"""WITH $GRAM5_CTE,
      |ev AS (SELECT doc_id, g FROM g WHERE doc_id < 25),
      |tr AS (SELECT DISTINCT g FROM g WHERE doc_id >= 25)
      |SELECT ev.doc_id, COUNT(*) AS n_grams,
      |  CAST(SUM(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_contaminated,
      |  CAST(SUM(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |    / COUNT(*) AS contamination
      |FROM ev LEFT JOIN tr ON ev.g = tr.g
      |GROUP BY ev.doc_id""".stripMargin

  /** Asymmetric near-dup containment — the long-doc-swallows-short-doc
    * case Jaccard misses (a 100-gram doc pasted inside a 10k-gram doc has
    * jaccard ≈ 0.01 but containment 1.0): for candidate pairs sharing a
    * rare 5-gram, containment = |shared| / |grams(smaller doc)|, computed
    * over the rare-gram space (df ≤ cutoff; exact dups still score 1.0
    * since both sides lose the same grams). Plan: the df cutoff is a
    * pre-collect big-big join on the gram (the r6 bucket-cap discipline —
    * posting lists are bounded ≤ cutoff BEFORE collect_list exists), then
    * local C(df,2) pair-gen and AQE-sized joins for the per-doc sizes. */
  def dedupShingleContainment(s: SparkSession, dir: String): DataFrame = {
    val DF_CUTOFF = 100
    val g = gram5(t(s, dir, "documents"))
    val dfc = g.groupBy("g").agg(count(lit(1)).as("df"))
    // materialize the rare-gram postings ONCE: sizes and pair-gen both
    // consume them, and without the checkpoint each consumer replays the
    // gram window + df join (11 planned shuffles vs ~6 after)
    val rare = g.join(dfc.filter(col("df") <= DF_CUTOFF).select("g"), Seq("g"))
      .transform(graft.Ckpt.capped)
    val szs = rare.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val cand = rare.groupBy("g")
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(col("ds"), posexplode(col("ds")).as(Seq("i", "doc1")))
      .select(col("i"), col("doc1"), posexplode(col("ds")).as(Seq("j", "doc2")))
      .filter(col("j") > col("i"))
      .groupBy("doc1", "doc2")
      .agg(count(lit(1)).as("shared"))
    val containment = col("shared").cast("double") / least(col("s1.sz"), col("s2.sz"))
    cand
      .join(szs.as("s1"), col("doc1") === col("s1.doc_id"))
      .join(szs.as("s2"), col("doc2") === col("s2.doc_id"))
      .filter(containment >= 0.8)
      .select(
        when(col("s1.sz") <= col("s2.sz"), col("doc1")).otherwise(col("doc2")).as("doc_small"),
        when(col("s1.sz") <= col("s2.sz"), col("doc2")).otherwise(col("doc1")).as("doc_big"),
        col("shared"), containment.as("containment"))
  }

  private val CONTAINMENT_SQL =
    s"""WITH $GRAM5_CTE,
      |dfc AS (SELECT g, COUNT(*) AS df FROM g GROUP BY g),
      |rare AS (SELECT g.doc_id, g.g FROM g JOIN dfc USING (g) WHERE dfc.df <= 100),
      |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM rare GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS doc1, b.doc_id AS doc2, CAST(COUNT(*) AS BIGINT) AS shared
      |  FROM rare a JOIN rare b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT CASE WHEN s1.sz <= s2.sz THEN doc1 ELSE doc2 END AS doc_small,
      |  CASE WHEN s1.sz <= s2.sz THEN doc2 ELSE doc1 END AS doc_big,
      |  shared,
      |  CAST(shared AS DOUBLE) / LEAST(s1.sz, s2.sz) AS containment
      |FROM pairs JOIN sz s1 ON pairs.doc1 = s1.doc_id
      |           JOIN sz s2 ON pairs.doc2 = s2.doc_id
      |WHERE CAST(shared AS DOUBLE) / LEAST(s1.sz, s2.sz) >= CAST(0.8 AS DOUBLE)""".stripMargin

  /** Vocabulary building: top-10 word bigrams per language by frequency.
    * Bigrams via the codegen window-lead trick (cf. [[Shingles]]); the
    * rank-≤-10 window compiles to WindowGroupLimit, so each partition
    * pre-prunes to its local top-10 before the rank shuffle. */
  def textTopNgrams(s: SparkSession, dir: String): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val byLang = Window.partitionBy("lang")
      .orderBy(col("c").desc, col("bg"))
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), toks("text").as(Seq("pos", "w")))
      .select(col("lang"),
        concat(col("w"), lit("_"), lead("w", 1).over(byDoc)).as("bg"))
      .filter(col("bg").isNotNull)
      .groupBy("lang", "bg").agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(byLang).cast("long"))
      .filter(col("rn") <= 10)
  }

  private val NGRAMS_SQL =
    """WITH bg AS (
      |  SELECT lang, ts[i] || '_' || ts[i+1] AS bg
      |  FROM (SELECT lang, ts, unnest(generate_series(1, len(ts) - 1)) AS i
      |        FROM (SELECT lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
      |              FROM documents))),
      |cnt AS (SELECT lang, bg, COUNT(*) AS c FROM bg GROUP BY lang, bg)
      |SELECT lang, bg, c, rn FROM (
      |  SELECT lang, bg, c,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, bg) AS rn
      |  FROM cnt)
      |WHERE rn <= 10""".stripMargin

  /** Count-min heavy-hitter sketch — the frequency member of the sketch
    * family (KMV=distinct, MinHash=similarity): a 4×64 counter matrix
    * over md5-prefix row hashes, estimate = min over rows. The sketch
    * aggregate is 256 rows regardless of vocabulary size and partial-
    * aggregates map-side — the scale path when the token universe doesn't
    * fit a shuffle. The query reports the top-20 true heavy hitters next
    * to their sketch estimates (est ≥ true by construction — one-sided
    * error is THE count-min property, spec-asserted); the exact counts
    * exist here only as the checkable comparator, as with the brute-force
    * similarity baselines. Deterministic md5 hashing makes the whole
    * matrix DuckDB-replayable. */
  /** The (row, token) → bucket hash, used by BOTH the sketch build and
    * the candidate probe — one definition, or a drift makes every probe
    * miss the sketch with no compile-time signal. */
  private val cmBucket =
    "pmod(cast(conv(substring(md5(cast(concat(cast(r as string), ':', tok) as binary)), 1, 15), 16, 10) as bigint), 64)"

  /** Occurrence-direct count-min build — the PRODUCTION shape: every
    * token occurrence hashes straight into the 4×64 matrix, so the plan
    * contains NO vocabulary aggregate anywhere (that aggregate is the
    * thing the sketch exists to avoid) and the one shuffle carries at
    * most 256 partial cells per map task regardless of token-universe
    * size — the same shape a streaming foreachBatch build uses.
    * Cell-for-cell identical to the vocab-weighted build inside
    * [[freqCountMin]] (spec-asserted); the weighted build stays as the
    * bench/oracle comparator because it shares the exact aggregate the
    * heavy-hitter report needs anyway. */
  private[graft] def cmSketchDirect(toks: DataFrame): DataFrame =
    toks
      .select(col("tok"), explode(sequence(lit(0), lit(3))).as("r"))
      .select(col("r"), expr(cmBucket).as("bucket"))
      .groupBy("r", "bucket").agg(count(lit(1)).as("cell"))

  def freqCountMin(s: SparkSession, dir: String): DataFrame = {
    val toksDf = t(s, dir, "documents")
      .select(toks("text").as(Seq("p", "tok"))).select("tok")
    // one materialized vocabulary aggregate (2 consumers: top + sketch);
    // weighting the sketch cells by the per-token counts is value-
    // identical to hashing every occurrence but hashes |vocab| rows
    // instead of |tokens|×4 (measured 1.99 s → sub-second at sf0.1). A
    // production STREAMING build maps occurrences directly — there the
    // vocab aggregate is the thing the sketch exists to avoid.
    val exact = toksDf.groupBy("tok").agg(count(lit(1)).as("true_n"))
      .transform(graft.Ckpt.capped)
    val top = exact.orderBy(desc("true_n"), asc("tok")).limit(20)
    val sketch = exact
      .select(col("tok"), col("true_n").as("n"), explode(sequence(lit(0), lit(3))).as("r"))
      .select(col("r"), expr(cmBucket).as("bucket"), col("n"))
      .groupBy("r", "bucket").agg(sum("n").as("cell"))
    top
      .select(col("tok"), col("true_n"), explode(sequence(lit(0), lit(3))).as("r"))
      .select(col("tok"), col("true_n"), col("r"), expr(cmBucket).as("bucket"))
      .join(broadcast(sketch), Seq("r", "bucket"))
      .groupBy("tok", "true_n")
      .agg(min(col("cell")).as("est_n"))
  }

  private val CM_SQL =
    """WITH tk AS (
      |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      |  FROM documents),
      |exact AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS true_n FROM tk GROUP BY tok),
      |top AS (SELECT tok, true_n FROM exact ORDER BY true_n DESC, tok LIMIT 20),
      |h AS (SELECT tok,  r,
      |        ('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || tok), 1, 15))::BIGINT % 64 AS bucket
      |      FROM tk CROSS JOIN generate_series(0, 3) t(r)),
      |sketch AS (SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS cell
      |           FROM h GROUP BY r, bucket),
      |cand AS (SELECT top.tok, top.true_n, g.r,
      |           ('0x' || substr(md5(CAST(g.r AS VARCHAR) || ':' || top.tok), 1, 15))::BIGINT % 64 AS bucket
      |         FROM top CROSS JOIN generate_series(0, 3) g(r))
      |SELECT c.tok, c.true_n, MIN(s.cell) AS est_n
      |FROM cand c JOIN sketch s ON c.r = s.r AND c.bucket = s.bucket
      |GROUP BY c.tok, c.true_n""".stripMargin

  /** Corpus-boilerplate scoring — the C4/RefinedWeb "repeated span"
    * curation step re-expressed at gram granularity (the testdata has no
    * sentence structure): for each document, the fraction of its
    * distinct 5-grams that also occur in at least one OTHER document.
    * Near-dup pairs and template boilerplate score high; unique prose
    * scores 0. Distinct from dedup_ngram_jaccard (pairwise similarity)
    * and dedup_contamination (train/eval leakage) — this is corpus-wide
    * repetition per doc. Plan: the distinct-gram aggregate, a document-
    * frequency aggregate, and one big-big AQE-planned join on the gram —
    * the standard inverted-index shape, every stage partial-aggregated. */
  def dedupRepeatedNgrams(s: SparkSession, dir: String): DataFrame = {
    val g = gram5(t(s, dir, "documents"))
    val df = g.groupBy("g").agg(count(lit(1)).as("df"))
    g.join(df, Seq("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_repeated"))
      .withColumn("boiler_frac",
        col("n_repeated").cast("double") / col("n_grams"))
  }

  private val REPEATED_SQL =
    s"""WITH $GRAM5_CTE,
      |df AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS df FROM g GROUP BY g)
      |SELECT doc_id, COUNT(*) AS n_grams,
      |  CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated,
      |  CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / COUNT(*) AS boiler_frac
      |FROM g JOIN df USING (g)
      |GROUP BY doc_id""".stripMargin

  /** Per-document n-gram NOVELTY against the corpus in doc_id order —
    * the "is this document adding anything" curation signal dual to
    * [[dedupRepeatedNgrams]]'s boilerplate fraction: a distinct 5-gram
    * is novel for the document that FIRST introduces it (min doc_id
    * over the corpus), so re-crawls, quotes and templated text score
    * near zero while fresh prose scores near 1000. Exact milli
    * integers. Plan: the repeated-ngrams shape — one gram-hash
    * aggregate (min instead of count) + the inverted-index join back;
    * shuffle carries gram keys, never text. */
  def textNgramNovelty(s: SparkSession, dir: String): DataFrame = {
    val g = gram5(t(s, dir, "documents"))
    val first = g.groupBy("g").agg(min("doc_id").as("first_doc"))
    g.join(first, Seq("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("doc_id") === col("first_doc"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novel_millis", expr("n_novel * 1000 div n_grams"))
  }

  private val NOVELTY_SQL =
    s"""WITH $GRAM5_CTE,
      |fd AS (SELECT g, MIN(doc_id) AS first_doc FROM g GROUP BY g)
      |SELECT doc_id, COUNT(*) AS n_grams,
      |  CAST(SUM(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
      |  CAST(SUM(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) * 1000 // COUNT(*)
      |    AS BIGINT) AS novel_millis
      |FROM g JOIN fd USING (g)
      |GROUP BY doc_id""".stripMargin

  /** End-to-end per-document curation VERDICT — the composition a user
    * of this library actually ships: every document classified by the
    * first failing gate, in severity order
    * exact_dup (its content hash has an earlier keeper) >
    * near_dup (its trigram-Jaccard cluster elects a different
    * canonical doc — [[Graphs.dedupCluster]]) >
    * boilerplate (≥ half its distinct 5-grams occur in other docs,
    * exact cross-multiplied test on [[dedupRepeatedNgrams]]) >
    * keep. Demonstrates that the operator family COMPOSES: three
    * independent pipelines join on doc_id/hash only (no payload ever
    * re-shuffles), and the oracle nests the components' own oracle SQL
    * as subquery CTEs — two independently-composed DAGs, one answer.
    * Docs outside the pair graph / gram universe fall through their
    * gates via NULL-skipping CASE arms on both engines. */
  def textCurationVerdict(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
    val keepers = docs.groupBy("h").agg(min("doc_id").as("keep_id"))
    val clusters = Graphs.dedupCluster(s, dir)
    val boiler = dedupRepeatedNgrams(s, dir).select("doc_id", "n_grams", "n_repeated")
    docs.join(keepers, Seq("h"))
      .join(clusters, Seq("doc_id"), "left_outer")
      .join(boiler, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        when(col("doc_id") =!= col("keep_id"), "exact_dup")
          .when(col("cluster_id").isNotNull && col("cluster_id") =!= col("doc_id"),
            "near_dup")
          .when(col("n_repeated") * 2 >= col("n_grams") && col("n_grams") > 0,
            "boilerplate")
          .otherwise("keep").as("verdict"))
  }

  /** Exact-integer unigram surprisal — the perplexity-shaped quality
    * signal without the engine-divergent ln(): per token, bits of
    * surprise = floor(log₂(N / c)) computed EXACTLY as
    * length(bin(N div c)) − 1 (powers of two are integers, so flooring
    * the integer quotient first never changes the floored log — and
    * bin() is unpadded in both engines, the q14 rho discipline). A doc
    * of rare tokens scores high, boilerplate scores low; the per-token
    * average ships as exact milli-bits (integer cross-multiplication,
    * no float division). Plan: the probe side and the vocabulary counts
    * each scan+explode the corpus once (two passes, not three: the
    * global total folds from the ≤|vocab|-row counts, NEVER from a
    * third corpus explode — multi-reference DataFrames replay their
    * upstream per reference); the (token → count) join shuffles on the
    * token (the vocabulary is NOT broadcastable at corpus scale), the
    * single-row total broadcasts. */
  def textSurprisal(s: SparkSession, dir: String): DataFrame = {
    val tok = t(s, dir, "documents")
      .select(col("doc_id"), toks("text").as(Seq("pos", "w")))
      .select("doc_id", "w")
    val counts = tok.groupBy("w").agg(count(lit(1)).as("c"))
    val total = counts.agg(sum("c").as("n")) // single row — broadcast
    tok.join(counts, Seq("w"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        expr("cast(length(bin(n div c)) - 1 as bigint)").as("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("b").as("total_bits"))
      .withColumn("milli_bits_per_tok",
        expr("total_bits * 1000 div n_tokens"))
  }

  private val SURPRISAL_SQL =
    """WITH tok AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      |  FROM documents),
      |cnt AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
      |tot AS (SELECT COUNT(*) AS n FROM tok),
      |b AS (SELECT doc_id,
      |        CAST(length(bin((SELECT n FROM tot) // c)) - 1 AS BIGINT) AS b
      |      FROM tok JOIN cnt USING (w))
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |  CAST(SUM(b) AS BIGINT) AS total_bits,
      |  CAST(SUM(b) * 1000 // COUNT(*) AS BIGINT) AS milli_bits_per_tok
      |FROM b GROUP BY doc_id""".stripMargin

  /** Per-document top-5 keywords by exact-integer tf·idf — the
    * tagging/indexing primitive next to text_bm25_topk (BM25 ranks DOCS
    * for a fixed query; this ranks TERMS within every doc): score =
    * tf × floor(log₂(N/df)) with the floored log computed exactly as
    * length(bin(N div df)) − 1 (the text_surprisal lattice — no
    * engine-divergent ln, no float anywhere). A term in every document
    * gets idf 0 and can never surface; rare terms win in proportion to
    * their in-doc frequency. Plan: one corpus explode feeds the
    * (doc, term) tf aggregate; document frequencies fold from THAT
    * aggregate (already distinct per doc — never a second corpus
    * explode); the tf⋈df join shuffles on the term (a corpus vocabulary
    * is not broadcastable), the single-row N broadcasts, and the top-5
    * rank compiles to WindowGroupLimit so each partition pre-prunes
    * before the doc_id exchange. Ties (score, then term asc) are
    * deterministic on both engines. */
  def textKeywordTfidf(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val tf = docs
      .select(col("doc_id"), toks("text").as(Seq("pos", "w")))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("n")) // single row — broadcast
    val byDoc = Window.partitionBy("doc_id").orderBy(col("score").desc, col("w"))
    tf.join(df, Seq("w"))
      .crossJoin(broadcast(total))
      .withColumn("idf_bits", expr("cast(length(bin(n div df)) - 1 as bigint)"))
      .withColumn("score", col("tf") * col("idf_bits"))
      .filter(col("score") > 0)
      .withColumn("rank", row_number().over(byDoc).cast("long"))
      .filter(col("rank") <= 5)
      .select("doc_id", "w", "tf", "idf_bits", "score", "rank")
  }

  private val TFIDF_SQL =
    """WITH tok AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      |  FROM documents),
      |tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
      |       FROM tok GROUP BY doc_id, w),
      |df AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
      |sc AS (
      |  SELECT tf.doc_id, tf.w, tf.tf,
      |    CAST(length(bin((SELECT n FROM n) // df.df)) - 1 AS BIGINT) AS idf_bits,
      |    tf.tf * CAST(length(bin((SELECT n FROM n) // df.df)) - 1 AS BIGINT) AS score
      |  FROM tf JOIN df USING (w))
      |SELECT doc_id, w, tf, idf_bits, score,
      |  CAST(rank AS BIGINT) AS rank
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
      |        ORDER BY score DESC, w) AS rank
      |      FROM sc WHERE score > 0)
      |WHERE rank <= 5""".stripMargin

  /** Bigram conditional surprisal — the 2-gram language-model quality
    * gate next to text_surprisal's unigram one (a doc of individually
    * common words in IMPROBABLE order — shuffled text, keyword stuffing
    * — scores high here while the unigram gate sleeps): per consecutive
    * token pair, bits = floor(log₂(c(w₁)/c(w₁w₂))) — the exact integer
    * form of −log₂ p(w₂|w₁) — with the context count c(w₁) counted over
    * PAIR LEFT SLOTS so the conditional distribution sums to 1 by
    * construction. The bin()-length lattice keeps everything integer;
    * per-doc averages ship as exact milli-bits. Plan: one corpus
    * explode + ONE doc_id lead window builds the pairs; bigram and
    * context counts both fold from that pair relation (no second
    * explode); the two vocabulary joins shuffle on the token keys
    * (vocabularies are not broadcastable at corpus scale). */
  def textBigramSurprisal(s: SparkSession, dir: String): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val pairs = t(s, dir, "documents")
      .select(col("doc_id"), toks("text").as(Seq("pos", "w1")))
      .withColumn("w2", lead("w1", 1).over(byDoc))
      .filter(col("w2").isNotNull)
    val c2 = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy("w1").agg(sum("c2").as("c1"))
    pairs.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .select(col("doc_id"),
        expr("cast(length(bin(c1 div c2)) - 1 as bigint)").as("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("b").as("total_bits"))
      .withColumn("milli_bits_per_bigram",
        expr("total_bits * 1000 div n_bigrams"))
  }

  private val BIGRAM_SQL =
    """WITH tok AS (
      |  SELECT doc_id, p.i AS pos, p.w FROM (
      |    SELECT doc_id,
      |      unnest(list_apply(regexp_extract_all(lower(text), '[a-z0-9]+'),
      |        (w, i) -> struct_pack(w := w, i := i))) AS p
      |    FROM documents)),
      |pr AS (SELECT doc_id, w AS w1,
      |         LEAD(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      |       FROM tok),
      |pairs AS (SELECT doc_id, w1, w2 FROM pr WHERE w2 IS NOT NULL),
      |c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
      |       FROM pairs GROUP BY w1, w2),
      |c1 AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY w1),
      |b AS (SELECT doc_id,
      |        CAST(length(bin(c1.c1 // c2.c2)) - 1 AS BIGINT) AS b
      |      FROM pairs JOIN c2 USING (w1, w2) JOIN c1 USING (w1))
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |  CAST(SUM(b) AS BIGINT) AS total_bits,
      |  CAST(SUM(b) * 1000 // COUNT(*) AS BIGINT) AS milli_bits_per_bigram
      |FROM b GROUP BY doc_id""".stripMargin

  /** Interpolated Kneser–Ney bigram probability scoring (Kneser & Ney
    * 1995 / Chen & Goodman 1999, public literature) — the SMOOTHED
    * language-model quality gate next to [[textBigramSurprisal]]'s raw
    * MLE one: the MLE gate scores every UNSEEN-context bigram as if it
    * were merely rare, while KN redistributes discount mass D=3/4 to a
    * continuation distribution (how many distinct contexts a word
    * follows), the thing that actually separates natural text from
    * keyword salad. Per bigram occurrence, the probability ships as an
    * exact 2^20 fixed-point on an all-integer lattice (SURVEY §4 float
    * discipline — no ln, no float division anywhere):
    *
    *   p_fp = (4·c₂−3)·2^20 div (4·c₁)                    [discounted MLE]
    *        + ((3·n1fw·2^20) div (4·c₁)) · n1pw div T     [λ(w₁)·P_cont(w₂)]
    *
    * with c₂ = bigram count, c₁ = Σc₂ over the context (left-slot
    * counting, so the conditional sums to ~1), n1fw = |{w₂: c(w₁w₂)>0}|,
    * n1pw = |{w₁: c(w₁w₂)>0}|, T = distinct bigram types. The λ factor
    * is floored FIRST (it is ≤ 3·2^18, so the cascade never overflows at
    * any corpus size where counts fit BIGINT; the single-product form
    * would overflow at vocab ~1.4e6); the MLE term needs c₂ < 2^40 —
    * ~40× the count of "the the" in a 100 TB crawl. Every quantity is
    * nonnegative, so Spark `div` (truncate) and DuckDB `//` (floor)
    * agree. Per-doc score = Σ occurrences (k-weighted), exact BIGINT.
    *
    * Plan: the corpus explodes ONCE into per-doc bigram counts
    * (checkpointed — stats AND the final join read it); c₂ folds from
    * that (checkpointed — 4 consumers); context/continuation stats fold
    * from c₂ (never a second corpus pass); the three stat joins shuffle
    * on vocabulary keys (not broadcastable at corpus scale), T is a
    * single-row broadcast. */
  private[graft] def kneserNey(pairs: DataFrame): DataFrame = {
    val db = pairs.groupBy("doc_id", "w1", "w2")
      .agg(count(lit(1)).as("k")).transform(graft.Ckpt.capped)
    val c2 = db.groupBy("w1", "w2").agg(sum("k").as("c2"))
      .transform(graft.Ckpt.capped)
    val w1s = c2.groupBy("w1").agg(sum("c2").as("c1"), count(lit(1)).as("n1fw"))
    val pw = c2.groupBy("w2").agg(count(lit(1)).as("n1pw"))
    val tt = c2.agg(count(lit(1)).as("t")) // single row — broadcast
    db.join(c2, Seq("w1", "w2")).join(w1s, Seq("w1")).join(pw, Seq("w2"))
      .crossJoin(broadcast(tt))
      .select(col("doc_id"), col("k"),
        expr("(4 * c2 - 3) * 1048576 div (4 * c1)" +
          " + ((3 * n1fw * 1048576) div (4 * c1)) * n1pw div t").as("p_fp"))
      .groupBy("doc_id")
      .agg(sum("k").as("n_bigrams"), sum(expr("k * p_fp")).as("kn_sum_fp"))
      .withColumn("kn_milli",
        expr("kn_sum_fp * 1000 div (n_bigrams * 1048576)"))
  }

  def textKneserNey(s: SparkSession, dir: String): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    kneserNey(t(s, dir, "documents")
      .select(col("doc_id"), toks("text").as(Seq("pos", "w1")))
      .withColumn("w2", lead("w1", 1).over(byDoc))
      .filter(col("w2").isNotNull)
      .select("doc_id", "w1", "w2"))
  }

  /** CCNet-style perplexity filter readout (Wenzek et al. 2020, public
    * literature) — the decision layer on top of [[textKneserNey]]'s
    * per-doc LM score: docs bucket by their mean KN probability
    * (kn_milli div 50, ≤21 bins at any corpus size), bins order by
    * score DESCENDING (most natural first) and carry cumulative doc
    * mass, and each bin labels head / middle / tail at the ⅓ and ⅔
    * cumulative cuts — CCNet keeps head+middle, so `keep` ships the
    * verdict and token_mass says how much training data survives.
    * All integer (bin ids, counts, cumulative sums); the only window
    * runs over the ≤21-row bin histogram (documented dimension-bounded
    * class), and the per-doc relation is checkpointed so the bin agg
    * is its single consumer — the corpus explodes exactly once. */
  def dataPerplexityFilter(s: SparkSession, dir: String): DataFrame = {
    val perDoc = textKneserNey(s, dir).transform(graft.Ckpt.capped)
    val bins = perDoc
      .select(expr("kn_milli div 50").as("kn_bin"), col("n_bigrams"))
      .groupBy("kn_bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_bigrams").as("token_mass"))
    val desc = Window.orderBy(col("kn_bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    bins
      .withColumn("cum_docs", sum("n_docs").over(desc))
      .withColumn("total_docs", sum("n_docs").over(all))
      .withColumn("bucket",
        when(col("cum_docs") * 3 <= col("total_docs"), "head")
          .when(col("cum_docs") * 3 <= col("total_docs") * 2, "middle")
          .otherwise("tail"))
      .select(col("kn_bin"), col("n_docs"), col("token_mass"),
        col("cum_docs"), col("bucket"),
        (col("bucket") =!= "tail").as("keep"))
  }

  // def, not val: KNESER_NEY_SQL initializes later in the object body
  private def PERPLEXITY_FILTER_SQL =
    s"""WITH kn AS ($KNESER_NEY_SQL),
      |bins AS (
      |  SELECT kn_milli // 50 AS kn_bin,
      |    CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(n_bigrams) AS BIGINT) AS token_mass
      |  FROM kn GROUP BY kn_milli // 50),
      |c AS (
      |  SELECT *,
      |    CAST(SUM(n_docs) OVER (ORDER BY kn_bin DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_docs,
      |    CAST(SUM(n_docs) OVER () AS BIGINT) AS total_docs
      |  FROM bins)
      |SELECT kn_bin, n_docs, token_mass, cum_docs,
      |  CASE WHEN cum_docs * 3 <= total_docs THEN 'head'
      |       WHEN cum_docs * 3 <= total_docs * 2 THEN 'middle'
      |       ELSE 'tail' END AS bucket,
      |  CASE WHEN cum_docs * 3 <= total_docs * 2 THEN TRUE ELSE FALSE END
      |    AS keep
      |FROM c""".stripMargin

  private val KNESER_NEY_SQL =
    """WITH tok AS (
      |  SELECT doc_id, p.i AS pos, p.w FROM (
      |    SELECT doc_id,
      |      unnest(list_apply(regexp_extract_all(lower(text), '[a-z0-9]+'),
      |        (w, i) -> struct_pack(w := w, i := i))) AS p
      |    FROM documents)),
      |pr AS (SELECT doc_id, w AS w1,
      |         LEAD(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      |       FROM tok),
      |db AS (SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS k
      |       FROM pr WHERE w2 IS NOT NULL GROUP BY 1, 2, 3),
      |c2 AS (SELECT w1, w2, CAST(SUM(k) AS BIGINT) AS c2
      |       FROM db GROUP BY 1, 2),
      |w1s AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1,
      |          CAST(COUNT(*) AS BIGINT) AS n1fw
      |        FROM c2 GROUP BY 1),
      |pw AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1pw FROM c2 GROUP BY 1),
      |tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM c2),
      |p AS (SELECT db.doc_id, db.k,
      |        (4 * c2.c2 - 3) * 1048576 // (4 * w1s.c1)
      |          + ((3 * w1s.n1fw * 1048576) // (4 * w1s.c1)) * pw.n1pw // tt.t
      |          AS p_fp
      |      FROM db JOIN c2 USING (w1, w2) JOIN w1s USING (w1)
      |        JOIN pw USING (w2) CROSS JOIN tt)
      |SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_bigrams,
      |  CAST(SUM(k * p_fp) AS BIGINT) AS kn_sum_fp,
      |  CAST(SUM(k * p_fp) * 1000 // (SUM(k) * 1048576) AS BIGINT) AS kn_milli
      |FROM p GROUP BY doc_id""".stripMargin

  /** Cross-document paragraph-level exact dedup — the C4-style
    * boilerplate pass that whole-document hashing misses: split on
    * sentence boundaries, hash fragments ≥ 20 chars, report every
    * fragment seen in ≥ 2 distinct documents. The corpus shares no
    * natural sentences, so the rotating license footer every web crawl
    * drags along is planted on %5 docs (17 variants) — exactly what
    * this operator exists to catch. Only 16-byte hashes shuffle; the
    * paragraph text never leaves its scan. */
  def dedupParagraphs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(". standard license footer variant "),
            (col("doc_id") % 17).cast("string"), lit(" applies to this record")))
          .otherwise(col("text")).as("text"))
      .select(col("doc_id"), explode(split(col("text"), "\\. ")).as("p"))
      .filter(length(col("p")) >= 20)
      .groupBy(md5(col("p").cast("binary")).as("para_md5"))
      .agg(count(lit(1)).as("n_occurrences"),
        count_distinct(col("doc_id")).as("n_docs"),
        min("doc_id").as("first_doc"))
      .filter(col("n_docs") >= 2)

  private val PARAGRAPHS_SQL =
    """WITH d AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0
      |      THEN text || '. standard license footer variant '
      |           || CAST(doc_id % 17 AS VARCHAR) || ' applies to this record'
      |      ELSE text END AS text
      |  FROM documents),
      |p AS (SELECT doc_id, unnest(string_split(text, '. ')) AS p FROM d)
      |SELECT md5(p) AS para_md5, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
      |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs, MIN(doc_id) AS first_doc
      |FROM p WHERE length(p) >= 20
      |GROUP BY md5(p) HAVING COUNT(DISTINCT doc_id) >= 2""".stripMargin

  /** Pseudo-relevance-feedback query expansion — the classic IR
    * composition (RM1-lite) on top of [[textBm25Topk]]: take the fixed
    * query's top-3 documents, estimate the relevance model as the
    * length-normalized term mass Σ_d tf(w,d)·1000 div dl(d) (exact milli
    * — a tf·idf harvest was REJECTED: the 31-word shared vocabulary
    * floors every feedback doc's idf_bits to 0, a corpus-degenerate
    * weighting), drop the original query terms, rank the top-8 — the
    * terms a retrieval pipeline ORs into the second-round query. Query
    * terms duplicated from textBm25Topk — keep in sync. Plan: the bm25
    * pipeline as pinned; the 3-row feedback set broadcasts back onto the
    * token scan, everything after is a ≤|vocab|-row aggregate and an
    * ≤|vocab|-row rank window. */
  def textPrfExpansion(s: SparkSession, dir: String): DataFrame = {
    val qTerms = Seq("spark", "join", "fast", "table")
    val byScore = Window.orderBy(col("bm25").desc, col("doc_id"))
    // 3-row feedback set CHECKPOINTED: the bm25 pipeline runs once at
    // build instead of replanning under every downstream reference
    val top3 = textBm25Topk(s, dir)
      .withColumn("rn", row_number().over(byScore))
      .filter(col("rn") <= 3).select("doc_id")
      .transform(graft.Ckpt.capped)
    val byDoc = Window.partitionBy("doc_id")
    val byRank = Window.orderBy(col("score_milli").desc, col("w"))
    t(s, dir, "documents")
      .join(broadcast(top3), Seq("doc_id"))
      .select(col("doc_id"), toks("text").as(Seq("pos", "w")))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      .withColumn("dl", sum("tf").over(byDoc)) // dl off the SAME aggregate
      .filter(!col("w").isInCollection(qTerms))
      .select(col("w"), expr("tf * 1000 div dl").as("c"))
      .groupBy("w")
      .agg(sum("c").as("score_milli"), count(lit(1)).as("n_docs"))
      .withColumn("rank", row_number().over(byRank).cast("long"))
      .filter(col("rank") <= 8)
  }

  private lazy val PRF_SQL =
    s"""WITH pf_bm AS ($BM25_SQL),
       |pf_t3 AS (SELECT doc_id FROM (
       |    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id)
       |      AS rn
       |    FROM pf_bm) WHERE rn <= 3),
       |pf_tok AS (
       |  SELECT d.doc_id,
       |    unnest(regexp_extract_all(lower(d.text), '[a-z0-9]+')) AS w
       |  FROM documents d JOIN pf_t3 USING (doc_id)),
       |pf_dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
       |          FROM pf_tok GROUP BY doc_id),
       |pf_tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
       |          FROM pf_tok GROUP BY doc_id, w),
       |pf_c AS (
       |  SELECT w, CAST(SUM(tf * 1000 // dl) AS BIGINT) AS score_milli,
       |    CAST(COUNT(*) AS BIGINT) AS n_docs
       |  FROM pf_tf JOIN pf_dl USING (doc_id)
       |  WHERE w NOT IN ('spark', 'join', 'fast', 'table')
       |  GROUP BY w)
       |SELECT w, score_milli, n_docs, rank FROM (
       |  SELECT w, score_milli, n_docs,
       |    CAST(ROW_NUMBER() OVER (ORDER BY score_milli DESC, w) AS BIGINT)
       |      AS rank
       |  FROM pf_c) WHERE rank <= 8""".stripMargin

  /** RAKE candidate phrases — the PHRASE-level keyword extractor next to
    * the word-level tfidf/textrank scores:
    * stopword-delimited token runs (the corpus stop set {a, the, l}) of
    * length 2..4 are candidate phrases; each word scores deg·1000 div
    * freq where freq counts its phrase occurrences and deg sums the
    * lengths of the phrases containing it (deg ≤ 4·freq so scores cap at
    * 4000 — overflow-free anywhere); a phrase scores the sum of its word
    * scores. Top-20 on (score desc, phrase asc). Plan: doc-window pid
    * assignment + (doc,pid) length window, vocab-sized word-stat
    * aggregate joined back by word (vocab can exceed broadcast at
    * 100 TB — keep the shuffle), phrase assembly only at the (doc,pid)
    * aggregate (sorted-struct array_join ≤ 4 elements), top-k is
    * TakeOrdered — no global sort. */
  def textRakePhrases(s: SparkSession, dir: String): DataFrame = {
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
    val toks = t(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
          .as(Seq("pos", "w")))
      .withColumn("pid",
        sum(when(col("w").isin("a", "the", "l"), 1L).otherwise(0L)).over(wDoc))
      .filter(!col("w").isin("a", "the", "l"))
      .withColumn("plen",
        count(lit(1)).over(Window.partitionBy("doc_id", "pid")))
      .filter(col("plen") >= 2 && col("plen") <= 4)
    val wstats = toks.groupBy("w")
      .agg(count(lit(1)).as("freq"), sum("plen").as("deg"))
      .withColumn("wscore", expr("deg * 1000 div freq"))
      .select("w", "wscore")
    toks.join(wstats, Seq("w"))
      .groupBy("doc_id", "pid")
      .agg(expr("array_join(transform(sort_array(collect_list(" +
        "struct(pos, w))), x -> x.w), ' ')").as("phrase"),
        max("plen").as("plen"), sum("wscore").as("score_milli"))
      .groupBy("phrase")
      .agg(max("plen").as("plen"), max("score_milli").as("score_milli"),
        count(lit(1)).as("n_occ"))
      .orderBy(col("score_milli").desc, col("phrase"))
      .limit(20)
  }

  private val RAKE_SQL =
    """WITH tok0 AS (
      |  SELECT doc_id, p.i AS pos, p.w FROM (
      |    SELECT doc_id,
      |      unnest(list_apply(regexp_extract_all(lower(text), '[a-z0-9]+'),
      |        (w, i) -> struct_pack(w := w, i := i))) AS p
      |    FROM documents)),
      |pidd AS (
      |  SELECT doc_id, pos, w,
      |    CAST(SUM(CASE WHEN w IN ('a', 'the', 'l') THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY pos
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS pid
      |  FROM tok0),
      |phr AS (
      |  SELECT doc_id, pos, w, pid,
      |    CAST(COUNT(*) OVER (PARTITION BY doc_id, pid) AS BIGINT) AS plen
      |  FROM pidd WHERE w NOT IN ('a', 'the', 'l')),
      |cand AS (SELECT * FROM phr WHERE plen BETWEEN 2 AND 4),
      |ws AS (
      |  SELECT w, CAST(SUM(plen) AS BIGINT) * 1000
      |    // CAST(COUNT(*) AS BIGINT) AS wscore
      |  FROM cand GROUP BY w),
      |ps AS (
      |  SELECT doc_id, pid,
      |    string_agg(c.w, ' ' ORDER BY pos) AS phrase,
      |    CAST(MAX(plen) AS BIGINT) AS plen,
      |    CAST(SUM(wscore) AS BIGINT) AS score_milli
      |  FROM cand c JOIN ws USING (w) GROUP BY doc_id, pid),
      |agg AS (
      |  SELECT phrase, CAST(MAX(plen) AS BIGINT) AS plen,
      |    CAST(MAX(score_milli) AS BIGINT) AS score_milli,
      |    CAST(COUNT(*) AS BIGINT) AS n_occ
      |  FROM ps GROUP BY phrase)
      |SELECT phrase, plen, score_milli, n_occ FROM agg
      |ORDER BY score_milli DESC, phrase LIMIT 20""".stripMargin

  /** PMI collocation ranking — the SYMMETRIC-association member of the
    * bigram family ([[textBigramSurprisal]] reads the directional
    * −log p(w2|w1); PMI asks whether the PAIR co-occurs more than its
    * parts predict): score = c(ab)·N·1000 div (c(a)·c(b)) — the exact
    * cross-multiplied lattice monotone in PMI, no log anywhere — over
    * adjacent-token bigrams with c(ab) ≥ 3, top-20 on
    * (score desc, w1, w2). BIGINT-safe while c(ab)·N < 9e15 (any
    * realistic shard; divide-first beyond). Plan: one doc-window lead
    * exchange feeds the bigram agg; the unigram relation checkpoints
    * once (two join consumers); N rides the vocab-sized aggregate as a
    * window total; top-k is TakeOrdered. */
  def textPmiCollocations(s: SparkSession, dir: String): DataFrame = {
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
    val toks = t(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
          .as(Seq("pos", "w")))
    val uni = toks.groupBy("w").agg(count(lit(1)).as("cw"))
      .withColumn("n_tot", sum("cw").over())
      .transform(graft.Ckpt.capped)
    toks
      .withColumn("w2", lead("w", 1).over(wDoc))
      .filter(col("w2").isNotNull)
      .groupBy(col("w").as("w1"), col("w2")).agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= 3)
      .join(uni.select(col("w").as("w1"), col("cw").as("c1"),
        col("n_tot")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("cw").as("c2")), Seq("w2"))
      .withColumn("score_milli",
        expr("cab * n_tot * 1000 div (c1 * c2)"))
      .orderBy(col("score_milli").desc, col("w1"), col("w2"))
      .limit(20)
      .select("w1", "w2", "cab", "score_milli")
  }

  private val PMI_SQL =
    """WITH tok AS (
      |  SELECT doc_id, p.i AS pos, p.w FROM (
      |    SELECT doc_id,
      |      unnest(list_apply(regexp_extract_all(lower(text), '[a-z0-9]+'),
      |        (w, i) -> struct_pack(w := w, i := i))) AS p
      |    FROM documents)),
      |uni AS (
      |  SELECT w, CAST(COUNT(*) AS BIGINT) AS cw,
      |    CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n_tot
      |  FROM tok GROUP BY w),
      |bg AS (
      |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cab FROM (
      |    SELECT doc_id, w AS w1,
      |      LEAD(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      |    FROM tok) WHERE w2 IS NOT NULL GROUP BY 1, 2
      |  HAVING COUNT(*) >= 3)
      |SELECT w1, w2, cab,
      |  cab * u1.n_tot * 1000 // (u1.cw * u2.cw) AS score_milli
      |FROM bg JOIN uni u1 ON bg.w1 = u1.w JOIN uni u2 ON bg.w2 = u2.w
      |ORDER BY score_milli DESC, w1, w2 LIMIT 20""".stripMargin

  val queries: Map[String, Q] = Map(
    "text_pmi_collocations" -> (textPmiCollocations _),
    "text_rake_phrases" -> (textRakePhrases _),
    "text_prf_expansion" -> (textPrfExpansion _),
    "text_curation_verdict" -> (textCurationVerdict _),
    "text_surprisal" -> (textSurprisal _),
    "dedup_paragraphs" -> (dedupParagraphs _),
    "dedup_shingle_containment" -> (dedupShingleContainment _),
    "dedup_repeated_ngrams" -> (dedupRepeatedNgrams _),
    "text_ngram_novelty" -> (textNgramNovelty _),
    "freq_count_min" -> (freqCountMin _),
    "text_bm25_topk" -> (textBm25Topk _),
    "data_sample_stratified" -> (dataSampleStratified _),
    "data_sample_fixed_k" -> (dataSampleFixedK _),
    "dedup_contamination" -> (dedupContamination _),
    "text_keyword_tfidf" -> (textKeywordTfidf _),
    "text_bigram_surprisal" -> (textBigramSurprisal _),
    "text_kneser_ney" -> (textKneserNey _),
    "data_perplexity_filter" -> (dataPerplexityFilter _),
    "text_top_ngrams" -> (textTopNgrams _))

  val oracle: Map[String, String] = Map(
    "text_pmi_collocations" -> PMI_SQL,
    "text_rake_phrases" -> RAKE_SQL,
    "text_prf_expansion" -> PRF_SQL,
    "text_curation_verdict" ->
      // nests the component operators' own oracle statements as
      // subquery CTEs — the SQL mirror of the Spark-side composition
      s"""WITH d AS (SELECT doc_id, md5(text) AS h FROM documents),
         |k AS (SELECT h, MIN(doc_id) AS keep_id FROM d GROUP BY h),
         |cl AS (SELECT * FROM (${Graphs.oracle("dedup_cluster")})),
         |bo AS (SELECT * FROM ($REPEATED_SQL))
         |SELECT d.doc_id,
         |  CASE WHEN d.doc_id <> k.keep_id THEN 'exact_dup'
         |       WHEN cl.cluster_id IS NOT NULL AND cl.cluster_id <> d.doc_id
         |         THEN 'near_dup'
         |       WHEN bo.n_repeated * 2 >= bo.n_grams AND bo.n_grams > 0
         |         THEN 'boilerplate'
         |       ELSE 'keep' END AS verdict
         |FROM d JOIN k USING (h)
         |LEFT JOIN cl ON cl.doc_id = d.doc_id
         |LEFT JOIN bo ON bo.doc_id = d.doc_id""".stripMargin,
    "text_surprisal" -> SURPRISAL_SQL,
    "dedup_paragraphs" -> PARAGRAPHS_SQL,
    "dedup_shingle_containment" -> CONTAINMENT_SQL,
    "dedup_repeated_ngrams" -> REPEATED_SQL,
    "text_ngram_novelty" -> NOVELTY_SQL,
    "freq_count_min" -> CM_SQL,
    "text_bm25_topk" -> BM25_SQL,
    "data_sample_stratified" -> SAMPLE_SQL,
    "data_sample_fixed_k" -> FIXEDK_SQL,
    "dedup_contamination" -> CONTAM_SQL,
    "text_keyword_tfidf" -> TFIDF_SQL,
    "text_bigram_surprisal" -> BIGRAM_SQL,
    "text_kneser_ney" -> KNESER_NEY_SQL,
    "data_perplexity_filter" -> PERPLEXITY_FILTER_SQL,
    "text_top_ngrams" -> NGRAMS_SQL)
}

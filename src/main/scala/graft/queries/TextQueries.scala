package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import QHelp._

/** Text analysis over the `documents` table: token counting, quality
  * scoring, language-ID heuristic, fingerprinting. All single-pass
  * narrow transforms — no shuffle at all except the fingerprint-dedup
  * aggregation, so they scan-scale linearly.
  */
object TextQueries extends QueryPack {

  /** ONE generator for every BM25 oracle chain — the base gate chain
    * (`oBm25Ctes`, empty suffix) and the live-retrieval epoch chains
    * (`oBm25EpochChain`) are the SAME arithmetic by construction, so
    * a future scoring change cannot silently diverge them (the
    * shared-bandArrayCol discipline applied to the oracle side).
    * `sfx` suffixes every CTE name, `corpusPred` restricts the
    * scored corpus (e.g. the ingested prefix), `qIdExpr` shapes the
    * emitted query id (e.g. epoch-offset). */
  private def oBm25ChainFor(sfx: String, corpusPred: String,
      qIdExpr: String): String =
    s"""tok$sfx AS (
       |  SELECT doc_id,
       |    len(string_split_regex(trim(text), '\\s+')) AS len,
       |    unnest(string_split_regex(trim(text), '\\s+')) AS term
       |  FROM documents$corpusPred),
       |tf$sfx AS (SELECT doc_id, len, term, count(*) AS tf
       |       FROM tok$sfx GROUP BY 1, 2, 3),
       |tot$sfx AS (SELECT count(*) AS nd FROM documents$corpusPred),
       |tt$sfx AS (SELECT CAST(count(*) AS HUGEINT) AS t FROM tok$sfx),
       |dfq$sfx AS (SELECT term, count(*) AS df FROM tf$sfx GROUP BY 1),
       |kept$sfx AS (
       |  SELECT term,
       |    CAST(length(bin(1 + (2 * (SELECT nd FROM tot$sfx) - 2 * df + 1)
       |      // (2 * df + 1))) AS HUGEINT) AS idf
       |  FROM dfq$sfx),
       |qt$sfx AS (
       |  SELECT DISTINCT q_id, term FROM (
       |    SELECT $qIdExpr AS q_id,
       |      unnest((string_split_regex(trim(text), '\\s+'))[1:6])
       |        AS term
       |    FROM documents WHERE doc_id % 100 = 0)),
       |posting$sfx AS (
       |  SELECT qt$sfx.q_id, tf$sfx.doc_id,
       |    (kept$sfx.idf * 22 * (SELECT t FROM tt$sfx) * tf$sfx.tf * 10000)
       |      // (10 * (SELECT t FROM tt$sfx) * tf$sfx.tf
       |         + 3 * (SELECT t FROM tt$sfx)
       |         + 9 * CAST(tf$sfx.len AS HUGEINT) * (SELECT nd FROM tot$sfx))
       |      AS contrib
       |  FROM qt$sfx JOIN tf$sfx USING (term) JOIN kept$sfx USING (term)),
       |scored$sfx AS (
       |  SELECT q_id, doc_id, CAST(sum(contrib) AS BIGINT) AS score
       |  FROM posting$sfx GROUP BY 1, 2),
       |ranked$sfx AS (
       |  SELECT q_id, doc_id, score,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY score DESC, doc_id ASC) AS rn
       |  FROM scored$sfx)""".stripMargin

  /** The q_text_bm25 oracle's CTE chain through `ranked` (rn = the
    * BM25 rank) — shared with the hybrid-retrieval oracle
    * (SimilarityQueries), whose lexical arm must be THIS chain
    * verbatim. */
  private[queries] val oBm25Ctes = oBm25ChainFor("", "", "doc_id")

  /** Shared by q_text_bm25, q_text_bm25_index, and q_stream_bm25 —
    * the persisted posting index's probe and the streaming serve must
    * be bit-identical to the fresh build. */
  private val oBm25Sql =
    s"""WITH $oBm25Ctes
       |SELECT q_id, CAST(rn AS BIGINT) AS rank, doc_id, score
       |FROM ranked WHERE rn <= 5
       |""".stripMargin

  /** One epoch of q_stream_live_retrieval's oracle: the full BM25
    * chain (oBm25Ctes's arithmetic verbatim, CTE names suffixed _$e)
    * over the corpus prefix ingested by epoch `e` — seed is
    * doc_id % 3 == 0 and ingest batch b adds doc_id % 3 == b, so the
    * visible corpus at epoch e is exactly `doc_id % 3 <= e`. Queries
    * re-sent each epoch carry q_id = doc_id·10 + e, so the epochs'
    * rankings stay disjoint in one union. */
  private def oBm25EpochChain(e: Int): String =
    oBm25ChainFor(s"_$e", s" WHERE doc_id % 3 <= $e",
      s"doc_id * 10 + $e")

  /** Shared by q_profile_incremental and q_stream_profile_ingest —
    * the merged per-language summary recomputed directly over the
    * full table, so the gate checks the partial merge itself. */
  private val oProfileStatsSql =
    """WITH tok AS (
      |  SELECT lang, doc_id,
      |    unnest(string_split_regex(trim(text), '\s+')) AS token
      |  FROM documents),
      |pd AS (
      |  SELECT lang, doc_id, token FROM tok
      |  GROUP BY lang, doc_id, token),
      |tk AS (
      |  SELECT lang, token, count(*) AS df FROM pd
      |  GROUP BY lang, token),
      |v AS (
      |  SELECT lang, count(*) AS vocab,
      |    CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS hapax
      |  FROM tk GROUP BY lang),
      |st AS (
      |  SELECT lang, count(*) AS docs,
      |    CAST(sum(len(string_split_regex(trim(text), '\s+')))
      |      AS BIGINT) AS tokens,
      |    CAST(sum(length(text)) AS BIGINT) AS chars
      |  FROM documents GROUP BY lang)
      |SELECT st.lang, st.docs, st.tokens, st.chars,
      |  COALESCE(v.vocab, 0) AS vocab,
      |  COALESCE(v.hapax, 0) AS hapax
      |FROM st LEFT JOIN v USING (lang)
      |""".stripMargin

  /** Shared by q_text_rarity and q_text_rarity_profile — the profile-
    * fed path must be bit-identical to the direct pass. */
  private val oRaritySql =
    """WITH tok AS (
      |  SELECT doc_id,
      |    unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents),
      |nd AS (SELECT count(*) AS n FROM documents),
      |dfq AS (
      |  SELECT term, count(DISTINCT doc_id) AS dfr
      |  FROM tok GROUP BY term)
      |SELECT doc_id, count(*) AS n_tok,
      |  CAST(sum(dfr) * 10000 // ((SELECT n FROM nd) * count(*))
      |       AS BIGINT) AS mean_df_bp,
      |  CAST(sum(CASE WHEN dfr = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS hapax
      |FROM tok JOIN dfq USING (term)
      |GROUP BY doc_id
      |""".stripMargin

  /** Shared by q_text_lm_score, q_text_lm_model, and
    * q_stream_lm_score — the stored-model and streaming paths must be
    * bit-identical to the fresh train-and-score. */
  private val oLmScoreSql =
    """WITH w AS (
      |  SELECT doc_id, lang,
      |         string_split_regex(trim(text), '\s+') AS w
      |  FROM documents),
      |v AS (SELECT count(DISTINCT tk) AS v FROM (
      |        SELECT unnest(w) AS tk FROM w WHERE lang = 'en')),
      |tb AS (
      |  SELECT
      |    unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
      |    unnest(list_transform(range(1, len(w)), i -> w[i+1])) AS w2
      |  FROM w WHERE lang = 'en' AND len(w) >= 2),
      |c12 AS (SELECT w1, w2, count(*) AS c12 FROM tb GROUP BY 1, 2),
      |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1
      |       FROM c12 GROUP BY 1),
      |db AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
      |    unnest(list_transform(range(1, len(w)), i -> w[i+1])) AS w2
      |  FROM w WHERE len(w) >= 2),
      |sc AS (
      |  SELECT d.doc_id,
      |    len(bin(coalesce(c1.c1, 0) + (SELECT v FROM v))) -
      |    len(bin(coalesce(c12.c12, 0) + 1)) AS cost
      |  FROM db d LEFT JOIN c12 USING (w1, w2)
      |            LEFT JOIN c1 USING (w1))
      |SELECT doc_id, count(*) AS n_bigrams,
      |  CAST(sum(cost) AS BIGINT) AS bits,
      |  CAST(sum(cost) AS BIGINT) * 1000 // count(*) AS milli_bits
      |FROM sc GROUP BY 1
      |""".stripMargin

  /** Shared by q_text_dsir and q_text_dsir_select (which appends its
    * ORDER BY/LIMIT): two bigram models (target = en stratum, source
    * = whole pool) scored in one pass, integer bits throughout. */
  private val oDsirSql =
    """WITH w AS MATERIALIZED (
      |  SELECT doc_id, lang,
      |         string_split_regex(trim(text), '\s+') AS w
      |  FROM documents),
      |vt AS (SELECT count(DISTINCT tk) AS v FROM (
      |         SELECT unnest(w) AS tk FROM w WHERE lang = 'en')),
      |vs AS (SELECT count(DISTINCT tk) AS v FROM (
      |         SELECT unnest(w) AS tk FROM w)),
      |tbt AS (
      |  SELECT
      |    unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
      |    unnest(list_transform(range(1, len(w)), i -> w[i+1])) AS w2
      |  FROM w WHERE lang = 'en' AND len(w) >= 2),
      |t12 AS MATERIALIZED (
      |  SELECT w1, w2, count(*) AS c12 FROM tbt GROUP BY 1, 2),
      |t1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1
      |       FROM t12 GROUP BY 1),
      |tbs AS (
      |  SELECT
      |    unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
      |    unnest(list_transform(range(1, len(w)), i -> w[i+1])) AS w2
      |  FROM w WHERE len(w) >= 2),
      |s12 AS MATERIALIZED (
      |  SELECT w1, w2, count(*) AS c12 FROM tbs GROUP BY 1, 2),
      |s1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1
      |       FROM s12 GROUP BY 1),
      |db AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
      |    unnest(list_transform(range(1, len(w)), i -> w[i+1])) AS w2
      |  FROM w WHERE len(w) >= 2),
      |sc AS (
      |  SELECT d.doc_id,
      |    len(bin(coalesce(t1.c1, 0) + (SELECT v FROM vt))) -
      |      len(bin(coalesce(t12.c12, 0) + 1)) AS tc,
      |    len(bin(coalesce(s1.c1, 0) + (SELECT v FROM vs))) -
      |      len(bin(coalesce(s12.c12, 0) + 1)) AS scst
      |  FROM db d LEFT JOIN t12 USING (w1, w2)
      |            LEFT JOIN t1 USING (w1)
      |            LEFT JOIN s12 USING (w1, w2)
      |            LEFT JOIN s1 USING (w1)),
      |agg AS (
      |  SELECT doc_id, count(*) AS n_bigrams,
      |    CAST(sum(tc) AS BIGINT) AS target_bits,
      |    CAST(sum(scst) AS BIGINT) AS source_bits
      |  FROM sc GROUP BY 1)
      |SELECT doc_id, n_bigrams, target_bits, source_bits,
      |  source_bits - target_bits AS delta_bits,
      |  (source_bits - target_bits) * 1000 // n_bigrams
      |    AS delta_milli_bits
      |FROM agg
      |""".stripMargin

  override def queries: Map[String, Q] = Map(

    "q_text_token_count" -> Q(
      (s, d) => {
        import s.implicits._
        t(s, d, "documents").select(
          $"doc_id",
          tokenCount($"text").as("n_tokens"),
          bpeTokenCount($"text").as("n_bpe_tokens"),
          length($"text").cast("long").as("n_chars_m"))
      },
      Some("""SELECT doc_id,
             |  len(string_split_regex(trim(text), '\s+')) AS n_tokens,
             |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
             |    AS n_bpe_tokens,
             |  length(text) AS n_chars_m
             |FROM documents
             |""".stripMargin)),

    "q_text_quality" -> Q(
      (s, d) => {
        import s.implicits._
        t(s, d, "documents").select(
          $"doc_id",
          alphaRatio($"text").as("alpha_ratio"),
          stopwordRatio($"text").as("stop_ratio"),
          avgTokenLen($"text").as("avg_tok_len"))
      },
      Some("""SELECT doc_id,
             |  round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) /
             |        CAST(length(text) AS DOUBLE), 4) AS alpha_ratio,
             |  round(len(list_filter(string_split_regex(trim(text), '\s+'),
             |        tk -> tk IN ('the','a','an','of','and','or','to','in','is','it'))) /
             |        CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE), 4)
             |    AS stop_ratio,
             |  round(list_sum(list_transform(string_split_regex(trim(text), '\s+'),
             |        tk -> length(tk))) /
             |        CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE), 4)
             |    AS avg_tok_len
             |FROM documents
             |""".stripMargin)),

    // Gopher-style rule filter: the named heuristic gate (word-count
    // band, mean-word-length band, symbol ratio, alphabetic-word
    // fraction, minimum distinct stopwords) as a per-rule violation
    // BITMASK plus the keep decision. Every threshold is a
    // cross-multiplication — both engines compare exact integers, so
    // no rounding boundary can flip a rule. The mask is the corpus
    // diagnostic (per-rule violation rates tune thresholds); keep
    // re-derives from it for free.
    "q_text_gopher_rules" -> Q(
      (s, d) => graft.operators.TextProfile.gopherRules(
        t(s, d, "documents"), "doc_id", "text",
        minWords = 40L, maxWords = 10000L),
      Some("""WITH w AS (
             |  -- coalesce mirrors gopherRules' null-text contract:
             |  -- null ≡ empty ≡ rejected in BOTH engines (plain NULL
             |  -- would zero every CASE arm below and KEEP the doc)
             |  SELECT doc_id, coalesce(text, '') AS text,
             |         string_split_regex(trim(coalesce(text, '')),
             |                            '\s+') AS w
             |  FROM documents),
             |m AS (
             |  SELECT doc_id,
             |    len(w) AS n_words,
             |    list_sum(list_transform(w, tk -> length(tk))) AS sumlen,
             |    len(list_filter(w,
             |        tk -> regexp_matches(tk, '[A-Za-z]'))) AS alpha,
             |    (length(text) - length(replace(text, '#', ''))) +
             |      (length(text) -
             |       length(regexp_replace(text, '\.\.\.', '', 'g'))) // 3
             |      AS sym,
             |    len(list_filter(list_distinct(w),
             |        tk -> tk IN ('the','a','an','of','and','or','to',
             |                     'in','is','it'))) AS stopd
             |  FROM w)
             |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
             |  CAST(
             |    (CASE WHEN n_words < 40 OR n_words > 10000
             |          THEN 1 ELSE 0 END) +
             |    (CASE WHEN 3 * n_words > sumlen OR sumlen > 10 * n_words
             |          THEN 2 ELSE 0 END) +
             |    (CASE WHEN 10 * sym > n_words THEN 4 ELSE 0 END) +
             |    (CASE WHEN 5 * alpha < 4 * n_words THEN 8 ELSE 0 END) +
             |    (CASE WHEN stopd < 2 THEN 16 ELSE 0 END)
             |    AS BIGINT) AS rule_mask,
             |  ((CASE WHEN n_words < 40 OR n_words > 10000
             |         THEN 1 ELSE 0 END) +
             |   (CASE WHEN 3 * n_words > sumlen OR sumlen > 10 * n_words
             |         THEN 2 ELSE 0 END) +
             |   (CASE WHEN 10 * sym > n_words THEN 4 ELSE 0 END) +
             |   (CASE WHEN 5 * alpha < 4 * n_words THEN 8 ELSE 0 END) +
             |   (CASE WHEN stopd < 2 THEN 16 ELSE 0 END)) = 0 AS keep
             |FROM m
             |""".stripMargin)),

    "q_text_lang_id" -> Q(
      (s, d) => {
        import s.implicits._
        t(s, d, "documents").select(
          $"doc_id", langIdHeuristic($"text").as("lang_pred"))
      },
      Some("""WITH scored AS (
             |  SELECT doc_id, ' ' || lower(text) || ' ' AS t FROM documents),
             |hits AS (
             |  SELECT doc_id,
             |    (CASE WHEN t LIKE '% the %' THEN 1 ELSE 0 END +
             |     CASE WHEN t LIKE '% and %' THEN 1 ELSE 0 END +
             |     CASE WHEN t LIKE '% of %' THEN 1 ELSE 0 END +
             |     CASE WHEN t LIKE '% is %' THEN 1 ELSE 0 END) AS en,
             |    (CASE WHEN t LIKE '% der %' THEN 1 ELSE 0 END +
             |     CASE WHEN t LIKE '% die %' THEN 1 ELSE 0 END +
             |     CASE WHEN t LIKE '% und %' THEN 1 ELSE 0 END +
             |     CASE WHEN t LIKE '% ist %' THEN 1 ELSE 0 END) AS de,
             |    (CASE WHEN t LIKE '% el %' THEN 1 ELSE 0 END +
             |     CASE WHEN t LIKE '% la %' THEN 1 ELSE 0 END +
             |     CASE WHEN t LIKE '% los %' THEN 1 ELSE 0 END +
             |     CASE WHEN t LIKE '% es %' THEN 1 ELSE 0 END) AS es,
             |    (CASE WHEN t LIKE '% le %' THEN 1 ELSE 0 END +
             |     CASE WHEN t LIKE '% les %' THEN 1 ELSE 0 END +
             |     CASE WHEN t LIKE '% et %' THEN 1 ELSE 0 END +
             |     CASE WHEN t LIKE '% est %' THEN 1 ELSE 0 END) AS fr
             |  FROM scored)
             |SELECT doc_id,
             |  CASE WHEN de > en AND de >= es AND de >= fr THEN 'de'
             |       WHEN es > en AND es >= fr THEN 'es'
             |       WHEN fr > en THEN 'fr'
             |       WHEN en > 0 THEN 'en'
             |       ELSE 'und' END AS lang_pred
             |FROM hits
             |""".stripMargin)),

    "q_text_fingerprint" -> Q(
      (s, d) => {
        import s.implicits._
        t(s, d, "documents").select(
          $"doc_id", fingerprint($"text").as("fp"))
      },
      Some("""SELECT doc_id,
             |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
             |FROM documents
             |""".stripMargin)),

    // vocabulary building: top-k terms by DOCUMENT frequency (distinct
    // per doc, so a word repeated in one doc counts once) — the shape a
    // tokenizer-vocab or stopword-mining job runs. The per-doc distinct
    // is narrow (array_distinct); the only shuffle is the term count,
    // and only k rows survive the TakeOrdered.
    "q_text_vocab_topk" -> Q(
      (s, d) => {
        import s.implicits._
        t(s, d, "documents")
          .select(explode(array_distinct(tokens($"text"))).as("term"))
          .groupBy($"term").agg(count(lit(1)).as("df"))
          .orderBy($"df".desc, $"term".asc)
          .limit(50)
      },
      Some("""WITH terms AS (
             |  SELECT DISTINCT doc_id, term FROM (
             |    SELECT doc_id,
             |      unnest(string_split_regex(trim(text), '\s+')) AS term
             |    FROM documents))
             |SELECT term, count(*) AS df
             |FROM terms GROUP BY term
             |ORDER BY df DESC, term ASC
             |LIMIT 50
             |""".stripMargin)),

    // Okapi BM25 top-k retrieval, integer-exact (TextProfile.bm25TopK
    // scaladoc: Lucene-form log2-granular idf via integer bit
    // length — a log base only rescales BM25 — rational tf-norm
    // cleared to integers, DECIMAL(38,0) accumulation). Queries =
    // every 100th document's first 6 tokens; the oracle replays
    // tokenize → tf/df → quantized idf·tf-norm contribution → sum →
    // rank bit-for-bit. stopwordCut=false here: the synthetic
    // corpus's ~31-word vocabulary is near-universal (df ≈ 0.8N for
    // every term), so the production df>N/2 cut would empty
    // retrieval — on real corpora it only removes actual stopwords
    // and is the default.
    "q_text_bm25" -> Q(
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        val queries = docs.filter($"doc_id" % 100 === 0)
          .select($"doc_id".as("q_id"),
            concat_ws(" ", slice(tokens($"text"), 1, 6)).as("qtext"))
        graft.operators.TextProfile.bm25TopK(docs, "doc_id", "text",
          queries, "q_id", "qtext", k = 5, stopwordCut = false)
      },
      Some(oBm25Sql)),

    // the retrieval index PERSISTED (the 100 TB serving shape, same
    // discipline as q_ann_ivfpq_index): build → term-sorted store →
    // reload → probe must hash-match q_text_bm25 — the persistence
    // loop may not change a single bit. The probe pays posting
    // lookups only (no tokenize, no tf/df recompute); this gate
    // query's 300-term query set takes the broadcast-join arm, the
    // few-term In-pushdown file-pruning arm is TextKernelsSpec's.
    "q_text_bm25_index" -> Q(
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        val queries = docs.filter($"doc_id" % 100 === 0)
          .select($"doc_id".as("q_id"),
            concat_ws(" ", slice(tokens($"text"), 1, 6)).as("qtext"))
        val dir = graft.core.FsUtil.deleteOnExit(
          s"${System.getProperty("java.io.tmpdir")}/" +
            s"graft_bm25idx_p${ProcessHandle.current().pid()}_" +
            java.lang.Integer.toHexString(d.hashCode))
        graft.operators.TextProfile.bm25Index(docs, "doc_id", "text")
          .write(dir)
        val idx = graft.operators.TextProfile.readBm25Index(s, dir,
          "doc_id")
        graft.operators.TextProfile.bm25TopKWithIndex(queries, "q_id",
          "qtext", idx, k = 5, stopwordCut = false)
      },
      Some(oBm25Sql)),

    // the lexical serving stack actually SERVING: the gate's query
    // set arrives as a STREAM (MemoryStream micro-batches) and ranks
    // against the persisted posting index through
    // StreamJobs.bm25LookupStream — per batch a posting lookup only
    // (no corpus tokenize, no tf/df recompute), each batch's results
    // overwriting its own batch_id=<id> parquet subdir (the
    // replay-idempotence unit). The union of the batch outputs must
    // match q_text_bm25's oracle bit-for-bit — q_stream_ann's
    // precedent applied to the sixth persistence unit: streaming
    // query, batch oracle. Same cut=false gate configuration as the
    // other two BM25 rows (see q_text_bm25's comment); the
    // production-cut shape is q_text_bm25_profile's row.
    "q_stream_bm25" -> Q(
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        val dir = graft.core.FsUtil.deleteOnExit(
          s"${System.getProperty("java.io.tmpdir")}/" +
            s"graft_stream_bm25_p${ProcessHandle.current().pid()}_" +
            java.lang.Integer.toHexString(d.hashCode))
        // output + checkpoint invocation-scoped (a reused checkpoint
        // would resume offsets and skip the fresh MemoryStream's
        // batches); the index rebuilt per invocation so the row
        // always measures build + serve (q_stream_ann's convention)
        val run = s"$dir/run_${System.nanoTime()}"
        val idxDir = s"$dir/idx"
        graft.operators.TextProfile.bm25Index(docs, "doc_id", "text")
          .write(idxDir)
        val qrows = docs.filter($"doc_id" % 100 === 0)
          .select($"doc_id".as("q_id"),
            concat_ws(" ", slice(tokens($"text"), 1, 6)).as("qtext"))
          .as[(Long, String)].collect().toSeq
        implicit val sqlCtx = s.sqlContext
        val input = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, String)]
        val outDir = s"$run/out"
        val q = graft.streaming.StreamJobs.bm25LookupStream(
            input.toDS().toDF("q_id", "qtext"), idxDir, outDir,
            "q_id", "qtext", "doc_id", k = 5, stopwordCut = false)
          .option("checkpointLocation", s"$run/ckpt").start()
        try {
          // three micro-batches: cross-batch union is the claim
          qrows.grouped(math.max(1, qrows.size / 3 + 1)).foreach { b =>
            input.addData(b); q.processAllAvailable()
          }
        } finally q.stop()
        s.read.parquet(outDir)
          .select(col("q_id"), col("rank"), col("doc_id"), col("score"))
      },
      Some(oBm25Sql)),

    // the lexical indexing stack's WRITE path under streaming: the
    // corpus arrives as a stream and the persisted posting index is
    // extended per micro-batch in O(batch) through
    // StreamJobs.bm25IngestStream (tagged files + ingest-log totals —
    // the exactly-once append contract), then nightly maintenance
    // (Maintenance.compactAll, which detects the ingest's sort drift
    // and restores the term-sorted sized layout) runs before the
    // probe. Seed = every doc_id % 3 == 0 built batch-side; the
    // stream delivers the other two thirds in 3 micro-batches. The
    // final probe must hash-match q_text_bm25's full-corpus oracle
    // bit-for-bit: df partial summation, N/T ingest-log totals, and
    // the compaction re-pack may not change a single bit — the
    // build-anywhere/serve-identically claim that makes streaming
    // ingest trustworthy at 100 TB.
    "q_stream_bm25_ingest" -> Q(
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        val dir = graft.core.FsUtil.deleteOnExit(
          s"${System.getProperty("java.io.tmpdir")}/" +
            s"graft_bm25_ingest_p${ProcessHandle.current().pid()}_" +
            java.lang.Integer.toHexString(d.hashCode))
        // the INDEX is run-scoped here (unlike the serve rows' shared
        // idx): ingest APPENDS, so a reused dir would double-ingest
        // across invocations
        val run = s"$dir/run_${System.nanoTime()}"
        val idxDir = s"$run/idx"
        graft.operators.TextProfile.bm25Index(
          docs.filter($"doc_id" % 3 === 0), "doc_id", "text")
          .write(idxDir)
        val rest = docs.filter($"doc_id" % 3 =!= 0)
          .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
        implicit val sqlCtx = s.sqlContext
        val input = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, String)]
        val q = graft.streaming.StreamJobs.bm25IngestStream(
            input.toDS().toDF("doc_id", "text"), idxDir, "text",
            runId = "r0")
          .option("checkpointLocation", s"$run/ckpt").start()
        try {
          rest.grouped(math.max(1, rest.size / 3 + 1)).foreach { b =>
            input.addData(b); q.processAllAvailable()
          }
        } finally q.stop()
        // quiesced maintenance: the drift signals (absent sortedFiles
        // stamp, df partials) route the bm25 unit to its term-sorted
        // re-pack
        graft.operators.Maintenance.compactAll(s, Seq(idxDir))
        val idx = graft.operators.TextProfile.readBm25Index(s, idxDir,
          "doc_id")
        val queries = docs.filter($"doc_id" % 100 === 0)
          .select($"doc_id".as("q_id"),
            concat_ws(" ", slice(tokens($"text"), 1, 6)).as("qtext"))
        graft.operators.TextProfile.bm25TopKWithIndex(queries, "q_id",
          "qtext", idx, k = 5, stopwordCut = false)
      },
      Some(oBm25Sql)),

    // LIVE retrieval — the round's ingest and serve streams COMPOSED
    // on one store, with the time-varying index state itself under
    // the hash gate: the corpus streams in (seed = doc_id % 3 == 0,
    // then ingest batch b adds doc_id % 3 == b) while the SAME query
    // set is re-sent at each epoch (q_id = doc_id·10 + epoch), and
    // every epoch's ranking must equal BM25 over EXACTLY the
    // ingested prefix — the oracle replays the full chain three
    // times over `doc_id % 3 <= e`. This pins the visibility
    // semantics end to end: each serve micro-batch sees precisely
    // the batches the ingest stream has committed, with df/N/T
    // totals mid-growth — not just the final converged store
    // (q_stream_bm25_ingest's claim).
    "q_stream_live_retrieval" -> Q(
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        val dir = graft.core.FsUtil.deleteOnExit(
          s"${System.getProperty("java.io.tmpdir")}/" +
            s"graft_live_retr_p${ProcessHandle.current().pid()}_" +
            java.lang.Integer.toHexString(d.hashCode))
        val run = s"$dir/run_${System.nanoTime()}"
        val idxDir = s"$run/idx"
        graft.operators.TextProfile.bm25Index(
          docs.filter($"doc_id" % 3 === 0), "doc_id", "text")
          .write(idxDir)
        val qbase = docs.filter($"doc_id" % 100 === 0)
          .select($"doc_id",
            concat_ws(" ", slice(tokens($"text"), 1, 6)).as("qtext"))
          .as[(Long, String)].collect().toSeq
        def batchDocs(b: Int) = docs.filter($"doc_id" % 3 === b)
          .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
        implicit val sqlCtx = s.sqlContext
        val docsIn = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, String)]
        val qIn = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, String)]
        val outDir = s"$run/out"
        val ingest = graft.streaming.StreamJobs.bm25IngestStream(
            docsIn.toDS().toDF("doc_id", "text"), idxDir, "text",
            runId = "live")
          .option("checkpointLocation", s"$run/ckpt_i").start()
        val serve = graft.streaming.StreamJobs.bm25LookupStream(
            qIn.toDS().toDF("q_id", "qtext"), idxDir, outDir,
            "q_id", "qtext", "doc_id", k = 5, stopwordCut = false)
          .option("checkpointLocation", s"$run/ckpt_s").start()
        try {
          (0 to 2).foreach { e =>
            if (e > 0) {
              docsIn.addData(batchDocs(e)); ingest.processAllAvailable()
            }
            qIn.addData(qbase.map { case (id, txt) =>
              (id * 10 + e, txt) })
            serve.processAllAvailable()
          }
        } finally { ingest.stop(); serve.stop() }
        s.read.parquet(outDir)
          .select(col("q_id"), col("rank"), col("doc_id"), col("score"))
      },
      Some(s"""WITH ${oBm25EpochChain(0)},
              |${oBm25EpochChain(1)},
              |${oBm25EpochChain(2)}
              |SELECT q_id, CAST(rn AS BIGINT) AS rank, doc_id, score
              |FROM ranked_0 WHERE rn <= 5
              |UNION ALL
              |SELECT q_id, CAST(rn AS BIGINT) AS rank, doc_id, score
              |FROM ranked_1 WHERE rn <= 5
              |UNION ALL
              |SELECT q_id, CAST(rn AS BIGINT) AS rank, doc_id, score
              |FROM ranked_2 WHERE rn <= 5
              |""".stripMargin)),

    // the PRODUCTION BM25 configuration under the correctness gate:
    // stopwordCut=true (the default a 100 TB deployment runs — df >
    // N/2 terms never enter retrieval, bounding posting volume) with
    // df/N/avgdl fed from a CorpusProfile rather than a corpus
    // rescan. The synthetic corpus's near-universal vocabulary means
    // the cut removes EVERY common term, so each query carries the
    // one surviving rare term ('dup', df≈N/20) alongside four common
    // ones — the oracle applies the same df-cut in its kept CTE, so
    // a cut-less implementation (common terms scoring at idf 1) or a
    // wrong profile df hash-mismatches. Complements q_text_bm25/
    // q_text_bm25_index, which pin the cut-OFF adversarial envelope.
    "q_text_bm25_profile" -> Q(
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        val queries = docs.filter($"doc_id" % 100 === 0)
          .select($"doc_id".as("q_id"),
            concat_ws(" ", slice(tokens($"text"), 1, 4), lit("dup"))
              .as("qtext"))
        val profile = graft.operators.CorpusProfile.build(
          docs, "doc_id", "lang", "text")
        graft.operators.TextProfile.bm25TopKWithProfile(docs, "doc_id",
          "text", queries, "q_id", "qtext", profile, k = 5,
          stopwordCut = true)
      },
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    len(string_split_regex(trim(text), '\s+')) AS len,
             |    unnest(string_split_regex(trim(text), '\s+')) AS term
             |  FROM documents),
             |tf AS (SELECT doc_id, len, term, count(*) AS tf
             |       FROM tok GROUP BY 1, 2, 3),
             |tot AS (SELECT count(*) AS nd FROM documents),
             |tt AS (SELECT CAST(count(*) AS HUGEINT) AS t FROM tok),
             |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |kept AS (
             |  SELECT term,
             |    CAST(length(bin(1 + (2 * (SELECT nd FROM tot) - 2 * df + 1)
             |      // (2 * df + 1))) AS HUGEINT) AS idf
             |  FROM dfq
             |  WHERE 2 * df <= (SELECT nd FROM tot)),
             |qt AS (
             |  SELECT DISTINCT q_id, term FROM (
             |    SELECT doc_id AS q_id,
             |      unnest(list_append(
             |        (string_split_regex(trim(text), '\s+'))[1:4], 'dup'))
             |        AS term
             |    FROM documents WHERE doc_id % 100 = 0)),
             |posting AS (
             |  SELECT qt.q_id, tf.doc_id,
             |    (kept.idf * 22 * (SELECT t FROM tt) * tf.tf * 10000)
             |      // (10 * (SELECT t FROM tt) * tf.tf
             |         + 3 * (SELECT t FROM tt)
             |         + 9 * CAST(tf.len AS HUGEINT) * (SELECT nd FROM tot))
             |      AS contrib
             |  FROM qt JOIN tf USING (term) JOIN kept USING (term)),
             |scored AS (
             |  SELECT q_id, doc_id, CAST(sum(contrib) AS BIGINT) AS score
             |  FROM posting GROUP BY 1, 2),
             |ranked AS (
             |  SELECT q_id, doc_id, score,
             |    row_number() OVER (PARTITION BY q_id
             |      ORDER BY score DESC, doc_id ASC) AS rn
             |  FROM scored)
             |SELECT q_id, CAST(rn AS BIGINT) AS rank, doc_id, score
             |FROM ranked WHERE rn <= 5
             |""".stripMargin)),

    // the composed corpus-cleaning pipeline a training-data job runs:
    // fingerprint dedup (keep smallest id) → quality gate → language
    // gate → token accounting. One narrow pass + one dedup shuffle —
    // the shape that scans 100 TB and keeps the survivors. Gates run
    // on the NORMALIZED text (the fingerprint's preimage), so gate
    // outcomes are invariant across a fingerprint class — the output
    // fingerprint set does not depend on which duplicate survives,
    // which is what lets the streaming form (StreamJobs
    // .corpusCleanStream, arrival-order survivor) produce the exact
    // same set.
    "q_pipeline_corpus_clean" -> Q(
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        // min-id survivor per fingerprint via the bounded-heap latest
        // aggregate (negated id = earliest wins), not a row_number
        // window (repo convention, operators/Latest.scala)
        val deduped = graft.operators.Latest.latestBy(
          docs.withColumn("ntext", normalizeText($"text"))
            .withColumn("fp", md5($"ntext")),
          Seq("fp"), Seq(-$"doc_id"), Seq("doc_id", "ntext"))
        deduped
          .withColumn("alpha", alphaRatio($"ntext"))
          .withColumn("n_tok", tokenCount($"ntext"))
          .withColumn("lang_pred", langIdHeuristic($"ntext"))
          .filter($"alpha" >= 0.7 && $"n_tok" >= 8 && $"lang_pred" === "en")
          .select($"doc_id", $"lang_pred", $"n_tok", $"alpha")
      },
      Some("""WITH deduped AS (
             |  SELECT doc_id,
             |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS ntext,
             |    row_number() OVER (
             |      PARTITION BY md5(trim(regexp_replace(lower(text),
             |                                           '\s+', ' ', 'g')))
             |      ORDER BY doc_id) AS rn
             |  FROM documents),
             |scored AS (
             |  SELECT doc_id,
             |    round(length(regexp_replace(ntext, '[^A-Za-z]', '', 'g')) /
             |          CAST(length(ntext) AS DOUBLE), 4) AS alpha,
             |    len(string_split_regex(trim(ntext), '\s+')) AS n_tok,
             |    ' ' || ntext || ' ' AS t
             |  FROM deduped WHERE rn = 1),
             |hits AS (
             |  SELECT doc_id, alpha, n_tok,
             |    (CASE WHEN t LIKE '% the %' THEN 1 ELSE 0 END +
             |     CASE WHEN t LIKE '% and %' THEN 1 ELSE 0 END +
             |     CASE WHEN t LIKE '% of %' THEN 1 ELSE 0 END +
             |     CASE WHEN t LIKE '% is %' THEN 1 ELSE 0 END) AS en,
             |    (CASE WHEN t LIKE '% der %' THEN 1 ELSE 0 END +
             |     CASE WHEN t LIKE '% die %' THEN 1 ELSE 0 END +
             |     CASE WHEN t LIKE '% und %' THEN 1 ELSE 0 END +
             |     CASE WHEN t LIKE '% ist %' THEN 1 ELSE 0 END) AS de,
             |    (CASE WHEN t LIKE '% el %' THEN 1 ELSE 0 END +
             |     CASE WHEN t LIKE '% la %' THEN 1 ELSE 0 END +
             |     CASE WHEN t LIKE '% los %' THEN 1 ELSE 0 END +
             |     CASE WHEN t LIKE '% es %' THEN 1 ELSE 0 END) AS es,
             |    (CASE WHEN t LIKE '% le %' THEN 1 ELSE 0 END +
             |     CASE WHEN t LIKE '% les %' THEN 1 ELSE 0 END +
             |     CASE WHEN t LIKE '% et %' THEN 1 ELSE 0 END +
             |     CASE WHEN t LIKE '% est %' THEN 1 ELSE 0 END) AS fr
             |  FROM scored),
             |labeled AS (
             |  SELECT doc_id, alpha, n_tok,
             |    CASE WHEN de > en AND de >= es AND de >= fr THEN 'de'
             |         WHEN es > en AND es >= fr THEN 'es'
             |         WHEN fr > en THEN 'fr'
             |         WHEN en > 0 THEN 'en'
             |         ELSE 'und' END AS lang_pred
             |  FROM hits)
             |SELECT doc_id, lang_pred, n_tok, alpha
             |FROM labeled
             |WHERE alpha >= 0.7 AND n_tok >= 8 AND lang_pred = 'en'
             |""".stripMargin)),

    // CCNet-family token-commonness signal: mean per-occurrence corpus
    // document frequency in basis points + hapax occurrences — the
    // oracle-exact integer cousin of LM-perplexity quality filtering
    // incremental corpus profile: build persisted stats on half the
    // corpus, APPEND the other half as an ingest batch (O(batch)
    // parquet append of partials — no corpus rescan), then read the
    // merged per-language summary. The oracle computes the same stats
    // directly over the full table, so the gate checks the merge
    // itself: partials + append must be bit-identical to a full
    // recompute. The stats-side mirror of the persisted dedup/ANN
    // index discipline (q_ann_ivf_index, q_dedup_incremental).
    "q_profile_incremental" -> Q(
      (s, d) => {
        import graft.operators.CorpusProfile
        val docs = t(s, d, "documents")
        // pid- and sfDir-scoped for the same concurrent-JVM and
        // /tmp-leak reasons as the IVF index query
        val dir = graft.core.FsUtil.deleteOnExit(
          s"${System.getProperty("java.io.tmpdir")}/" +
            s"graft_profile_p${ProcessHandle.current().pid()}_" +
            java.lang.Integer.toHexString(d.hashCode))
        CorpusProfile.write(CorpusProfile.build(
          docs.filter(col("doc_id") % 2 === 0), "doc_id", "lang",
          "text"), dir)
        CorpusProfile.append(CorpusProfile.build(
          docs.filter(col("doc_id") % 2 === 1), "doc_id", "lang",
          "text"), dir)
        CorpusProfile.stats(
          CorpusProfile.read(s, dir, "lang", "text"))
      },
      Some(oProfileStatsSql)),

    // the stats unit's WRITE path under streaming — the ingest family
    // on the corpus profile: seed a third batch-side, stream the
    // other two thirds in 3 micro-batches through
    // StreamJobs.profileIngestStream (per-batch partials landing as
    // tagged exactly-once files — closing appendOnce's documented
    // one-batch double-count window), quiesced maintenance (partial
    // collapse), then the merged per-language summary. Shares
    // q_profile_incremental's direct-recompute oracle: stats fed by
    // streamed partials may not differ by a bit.
    "q_stream_profile_ingest" -> Q(
      (s, d) => {
        import s.implicits._
        import graft.operators.CorpusProfile
        val docs = t(s, d, "documents")
        val dir = graft.core.FsUtil.deleteOnExit(
          s"${System.getProperty("java.io.tmpdir")}/" +
            s"graft_profile_ingest_p${ProcessHandle.current().pid()}_" +
            java.lang.Integer.toHexString(d.hashCode))
        val run = s"$dir/run_${System.nanoTime()}"
        val pDir = s"$run/profile"
        CorpusProfile.write(CorpusProfile.build(
          docs.filter($"doc_id" % 3 === 0), "doc_id", "lang", "text"),
          pDir)
        val rest = docs.filter($"doc_id" % 3 =!= 0)
          .select($"doc_id", $"lang", $"text")
          .as[(Long, String, String)].collect().toSeq
        implicit val sqlCtx = s.sqlContext
        val input = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, String, String)]
        val q = graft.streaming.StreamJobs.profileIngestStream(
            input.toDS().toDF("doc_id", "lang", "text"), pDir,
            "doc_id", "lang", "text", runId = "r0")
          .option("checkpointLocation", s"$run/ckpt").start()
        try {
          rest.grouped(math.max(1, rest.size / 3 + 1)).foreach { b =>
            input.addData(b); q.processAllAvailable()
          }
        } finally q.stop()
        graft.operators.Maintenance.compactAll(s, Seq(pDir))
        CorpusProfile.stats(CorpusProfile.read(s, pDir, "lang", "text"))
      },
      Some(oProfileStatsSql)),

    "q_text_rarity" -> Q(
      (s, d) => graft.operators.TextProfile.tokenRarity(
        t(s, d, "documents"), "doc_id", "text"),
      Some(oRaritySql)),

    // the same rarity scoring fed from a STORED corpus profile: the
    // corpus-wide df table comes from CorpusProfile (per-stratum dfs
    // sum to corpus df — strata partition the corpus) while only the
    // per-doc tf pass runs per batch. Shares q_text_rarity's oracle:
    // the amortized path may not change a single bit of the result.
    "q_text_rarity_profile" -> Q(
      (s, d) => {
        import graft.operators.{CorpusProfile, TextProfile}
        val docs = t(s, d, "documents")
        TextProfile.tokenRarityWithProfile(docs, "doc_id", "text",
          CorpusProfile.build(docs, "doc_id", "lang", "text"))
      },
      Some(oRaritySql)),

    // Gopher-style repetition signals: type-token ratio, top-bigram
    // share, duplicate-bigram share — all integer basis points
    // (floor), so the comparison is bit-exact on both engines
    // keyword extraction: top-5 discriminative terms per doc (tf desc,
    // corpus-rarity asc, term asc — integer-exact tf-idf-family
    // ordering). Bounded-heap per-doc top-k, no window shuffle.
    "q_text_top_terms" -> Q(
      (s, d) => graft.operators.TextProfile.topTerms(
        t(s, d, "documents"), "doc_id", "text", k = 5),
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    unnest(string_split_regex(trim(text), '\s+')) AS term
             |  FROM documents),
             |tf AS (SELECT doc_id, term, count(*) AS tf
             |       FROM tok GROUP BY 1, 2),
             |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |r AS (
             |  SELECT doc_id, term, tf, df,
             |    row_number() OVER (PARTITION BY doc_id
             |      ORDER BY tf DESC, df ASC, term ASC) AS rank
             |  FROM tf JOIN dfq USING (term))
             |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, df
             |FROM r WHERE rank <= 5
             |""".stripMargin)),

    // length-distribution profiling per language: exact interpolated
    // quantiles of BPE token counts — the pass that picks packing
    // budgets and length-filter thresholds. Spark `percentile` and
    // DuckDB `quantile_cont` share the (n-1)·q linear-interpolation
    // definition, so the comparison is exact on integer inputs.
    "q_stats_length_quantiles" -> Q(
      (s, d) => graft.operators.TextProfile.lengthQuantiles(
        t(s, d, "documents"), "lang", "text"),
      Some("""WITH tok AS (
             |  SELECT lang, CAST(len(regexp_extract_all(text,
             |    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tok
             |  FROM documents)
             |SELECT lang, count(*) AS n_docs,
             |  min(n_tok) AS min_tok, max(n_tok) AS max_tok,
             |  round(quantile_cont(n_tok, 0.25), 4) AS p25,
             |  round(quantile_cont(n_tok, 0.50), 4) AS p50,
             |  round(quantile_cont(n_tok, 0.75), 4) AS p75,
             |  round(quantile_cont(n_tok, 0.90), 4) AS p90
             |FROM tok GROUP BY lang
             |""".stripMargin)),

    // CCNet-style LM quality scoring (Wenzek et al., LREC 2020):
    // train an add-one-smoothed bigram model on the clean reference
    // stratum (lang='en' here), score EVERY document by quantized
    // cross-entropy in integer bits — cost(w1 w2) = bitlen(c1+V) −
    // bitlen(c12+1), bitlen = len(bin(n)) — the binary-digit-count
    // log2 that is bit-exact on both engines (the BM25-idf
    // discipline applied to LM scoring; a float ln() perplexity
    // would diverge at ulp boundaries). Training is reference-sized;
    // scoring is one bigram explode + two vocab-bounded joins + a
    // map-side-combined per-doc sum.
    "q_text_lm_score" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.operators.LmScore.bitsPerBigram(
          docs.filter(col("lang") === "en"), docs, "doc_id", "text")
      },
      Some(oLmScoreSql)),

    // the same scoring from a STORED model (LmScore.writeModel /
    // readModel — the eighth persistence unit): the reference corpus
    // is scanned once at model-write time; scoring reads two
    // vocab-bounded count tables with partials collapsed at read.
    // Shares q_text_lm_score's oracle — the amortized path may not
    // change a single bit (the tokenRarityWithProfile discipline).
    "q_text_lm_model" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val dir = graft.core.FsUtil.deleteOnExit(
          s"${System.getProperty("java.io.tmpdir")}/" +
            s"graft_lm_model_p${ProcessHandle.current().pid()}_" +
            java.lang.Integer.toHexString(d.hashCode))
        graft.operators.LmScore.writeModel(
          docs.filter(col("lang") === "en"), "text", dir)
        graft.operators.LmScore.score(
          graft.operators.LmScore.readModel(s, dir), docs,
          "doc_id", "text")
      },
      Some(oLmScoreSql)),

    // count-cutoff PRUNED model (KenLM's size lever): bigrams with
    // c12 < 2 dropped after counting — under Zipf most table ROWS are
    // hapax grams carrying almost no mass, so the cutoff shrinks the
    // model an order of magnitude while pruned grams simply score as
    // unseen (the add-one arm) and c1 re-derives from survivors; V
    // stays the FULL vocabulary (pruning tunes table size, not the
    // smoothing denominator). Scoring-side lever only — the persisted
    // unit stays unpruned so stored ≡ fresh-train-over-union holds
    // exactly under appends.
    "q_text_lm_pruned" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.operators.LmScore.score(
          graft.operators.LmScore.train(
            docs.filter(col("lang") === "en"), "text", minCount = 2L),
          docs, "doc_id", "text")
      },
      Some("""WITH w AS (
             |  SELECT doc_id, lang,
             |         string_split_regex(trim(text), '\s+') AS w
             |  FROM documents),
             |v AS (SELECT count(DISTINCT tk) AS v FROM (
             |        SELECT unnest(w) AS tk FROM w WHERE lang = 'en')),
             |tb AS (
             |  SELECT
             |    unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
             |    unnest(list_transform(range(1, len(w)), i -> w[i+1])) AS w2
             |  FROM w WHERE lang = 'en' AND len(w) >= 2),
             |c12 AS (SELECT w1, w2, count(*) AS c12 FROM tb
             |        GROUP BY 1, 2 HAVING count(*) >= 2),
             |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1
             |       FROM c12 GROUP BY 1),
             |db AS (
             |  SELECT doc_id,
             |    unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
             |    unnest(list_transform(range(1, len(w)), i -> w[i+1])) AS w2
             |  FROM w WHERE len(w) >= 2),
             |sc AS (
             |  SELECT d.doc_id,
             |    len(bin(coalesce(c1.c1, 0) + (SELECT v FROM v))) -
             |    len(bin(coalesce(c12.c12, 0) + 1)) AS cost
             |  FROM db d LEFT JOIN c12 USING (w1, w2)
             |            LEFT JOIN c1 USING (w1))
             |SELECT doc_id, count(*) AS n_bigrams,
             |  CAST(sum(cost) AS BIGINT) AS bits,
             |  CAST(sum(cost) AS BIGINT) * 1000 // count(*) AS milli_bits
             |FROM sc GROUP BY 1
             |""".stripMargin)),

    // interpolated unigram BACKOFF over the same model: cost =
    // least(bigram cost, unigram cost + 4 escape bits), the unigram
    // arm reading c2(w2) = Σ_w1 c12 and N = Σ c12 — both DERIVED from
    // the bigram table (a stored model needs no retrain). Separates
    // "rare continuation of a known word" (cheap unigram fallback)
    // from "token the reference never saw" (maximal cost) — the
    // distinction CCNet-grade filtering needs and bigram-only
    // smoothing cannot make. Integer-bitlen throughout; the oracle
    // replays least(len(bin(..)), len(bin(..)) + 4) verbatim.
    "q_text_lm_backoff" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.operators.LmScore.scoreBackoff(
          graft.operators.LmScore.train(
            docs.filter(col("lang") === "en"), "text"),
          docs, "doc_id", "text")
      },
      Some("""WITH w AS (
             |  SELECT doc_id, lang,
             |         string_split_regex(trim(text), '\s+') AS w
             |  FROM documents),
             |v AS (SELECT count(DISTINCT tk) AS v FROM (
             |        SELECT unnest(w) AS tk FROM w WHERE lang = 'en')),
             |tb AS (
             |  SELECT
             |    unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
             |    unnest(list_transform(range(1, len(w)), i -> w[i+1])) AS w2
             |  FROM w WHERE lang = 'en' AND len(w) >= 2),
             |c12 AS (SELECT w1, w2, count(*) AS c12 FROM tb GROUP BY 1, 2),
             |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1
             |       FROM c12 GROUP BY 1),
             |c2 AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS c2
             |       FROM c12 GROUP BY 1),
             |nn AS (SELECT CAST(sum(c12) AS BIGINT) AS n FROM c12),
             |db AS (
             |  SELECT doc_id,
             |    unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
             |    unnest(list_transform(range(1, len(w)), i -> w[i+1])) AS w2
             |  FROM w WHERE len(w) >= 2),
             |sc AS (
             |  SELECT d.doc_id,
             |    least(
             |      len(bin(coalesce(c1.c1, 0) + (SELECT v FROM v))) -
             |      len(bin(coalesce(c12.c12, 0) + 1)),
             |      len(bin((SELECT n FROM nn) + (SELECT v FROM v))) -
             |      len(bin(coalesce(c2.c2, 0) + 1)) + 4) AS cost
             |  FROM db d LEFT JOIN c12 USING (w1, w2)
             |            LEFT JOIN c1 USING (w1)
             |            LEFT JOIN c2 USING (w2))
             |SELECT doc_id, count(*) AS n_bigrams,
             |  CAST(sum(cost) AS BIGINT) AS bits,
             |  CAST(sum(cost) AS BIGINT) * 1000 // count(*) AS milli_bits
             |FROM sc GROUP BY 1
             |""".stripMargin)),

    // TRIGRAM backoff — one order closer to CCNet's 5-gram KenLM
    // shape: cost = least(trigram, bigram + 4, unigram + 8) with
    // every lower-order count summed OUT of the trigram table
    // (KenLM's continuation-count discipline — one stored table
    // serves the whole chain, no retrain). A distance-2 word scramble
    // preserves the bigram multiset, so q_text_lm_backoff provably
    // ties it with its unscrambled twin; the trigram arm prices the
    // novel triples (LmScoreSpec pins the separation). Integer-bitlen
    // throughout; the oracle replays the three-arm least() verbatim.
    "q_text_lm_trigram" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.operators.LmScore.scoreTrigram(
          graft.operators.LmScore.trainTrigram(
            docs.filter(col("lang") === "en"), "text"),
          docs, "doc_id", "text")
      },
      Some("""WITH w AS MATERIALIZED (
             |  SELECT doc_id, lang,
             |         string_split_regex(trim(text), '\s+') AS w
             |  FROM documents),
             |v AS (SELECT count(DISTINCT tk) AS v FROM (
             |        SELECT unnest(w) AS tk FROM w WHERE lang = 'en')),
             |tt AS (
             |  SELECT
             |    unnest(list_transform(range(1, len(w)-1), i -> w[i])) AS w1,
             |    unnest(list_transform(range(1, len(w)-1), i -> w[i+1])) AS w2,
             |    unnest(list_transform(range(1, len(w)-1), i -> w[i+2])) AS w3
             |  FROM w WHERE lang = 'en' AND len(w) >= 3),
             |c123 AS MATERIALIZED (
             |  SELECT w1, w2, w3, count(*) AS c123 FROM tt GROUP BY 1, 2, 3),
             |cc12 AS (SELECT w1, w2, CAST(sum(c123) AS BIGINT) AS cc12
             |         FROM c123 GROUP BY 1, 2),
             |b23 AS (SELECT w2, w3, CAST(sum(c123) AS BIGINT) AS b23
             |        FROM c123 GROUP BY 1, 2),
             |c2x AS (SELECT w2, CAST(sum(c123) AS BIGINT) AS c2x
             |        FROM c123 GROUP BY 1),
             |u3 AS (SELECT w3, CAST(sum(c123) AS BIGINT) AS u3
             |       FROM c123 GROUP BY 1),
             |nn AS (SELECT CAST(sum(c123) AS BIGINT) AS n FROM c123),
             |db AS (
             |  SELECT doc_id,
             |    unnest(list_transform(range(1, len(w)-1), i -> w[i])) AS w1,
             |    unnest(list_transform(range(1, len(w)-1), i -> w[i+1])) AS w2,
             |    unnest(list_transform(range(1, len(w)-1), i -> w[i+2])) AS w3
             |  FROM w WHERE len(w) >= 3),
             |sc AS (
             |  SELECT d.doc_id,
             |    least(
             |      len(bin(coalesce(cc12.cc12, 0) + (SELECT v FROM v))) -
             |      len(bin(coalesce(c123.c123, 0) + 1)),
             |      len(bin(coalesce(c2x.c2x, 0) + (SELECT v FROM v))) -
             |      len(bin(coalesce(b23.b23, 0) + 1)) + 4,
             |      len(bin((SELECT n FROM nn) + (SELECT v FROM v))) -
             |      len(bin(coalesce(u3.u3, 0) + 1)) + 8) AS cost
             |  FROM db d LEFT JOIN c123 USING (w1, w2, w3)
             |            LEFT JOIN cc12 USING (w1, w2)
             |            LEFT JOIN b23 USING (w2, w3)
             |            LEFT JOIN c2x USING (w2)
             |            LEFT JOIN u3 USING (w3))
             |SELECT doc_id, count(*) AS n_trigrams,
             |  CAST(sum(cost) AS BIGINT) AS bits,
             |  CAST(sum(cost) AS BIGINT) * 1000 // count(*) AS milli_bits
             |FROM sc GROUP BY 1
             |""".stripMargin)),

    // DSIR importance weighting (Xie et al. NeurIPS 2023): log2 of
    // the target/source probability ratio = source bits − target bits
    // under two bigram LMs — one corpus explode, four vocab-bounded
    // dim joins, everything integer. Gate convention: target = the en
    // stratum (the "clean domain"), source = the whole pool, every
    // document weighted. Both engines truncate integer division
    // toward zero, so the length-normalized delta_milli_bits agrees
    // on NEGATIVE deltas too (docs less target-like than the pool).
    "q_text_dsir" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val target = graft.operators.LmScore.train(
          docs.filter(col("lang") === "en"), "text")
        val source = graft.operators.LmScore.train(docs, "text")
        val out = graft.operators.LmScore.importanceBits(
          target, source, docs, "doc_id", "text")
        out
      },
      Some(oDsirSql)),

    // DSIR selection: the k most target-like documents by normalized
    // importance, ties broken by doc_id — the deterministic analog of
    // the paper's Gumbel resampling. Plans as TakeOrderedAndProject
    // (bounded per-partition heaps), never a global sort.
    "q_text_dsir_select" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.operators.LmScore.dsirSelect(
          graft.operators.LmScore.train(
            docs.filter(col("lang") === "en"), "text"),
          graft.operators.LmScore.train(docs, "text"),
          docs, "doc_id", "text", k = 100)
      },
      Some(oDsirSql +
        """ORDER BY delta_milli_bits DESC, doc_id LIMIT 100
          |""".stripMargin)),

    // DSIR in its DEPLOYMENT shape: both models come from PERSISTED
    // stores (LmScore.writeModel / readModel — the discipline the LM
    // and NB stacks already carry), so the whole-pool source model is
    // trained ONCE per pool lifetime and every weighting run is the
    // one corpus explode + four stored-dim joins. The gate row pays
    // the full lifecycle (write both stores + certify + read + score
    // — the q_text_nb_model convention); the amortized serve cost is
    // what importanceBits costs over two already-stored models.
    // Shares q_text_dsir's oracle verbatim: a stored-model weighting
    // must be bit-identical to the fresh two-model train.
    "q_text_dsir_stored" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val root = graft.core.FsUtil.deleteOnExit(
          s"${System.getProperty("java.io.tmpdir")}/" +
            s"graft_dsir_stored_p${ProcessHandle.current().pid()}_" +
            java.lang.Integer.toHexString(d.hashCode))
        val targetDir = s"$root/target"
        val sourceDir = s"$root/source"
        graft.operators.LmScore.writeModel(
          docs.filter(col("lang") === "en"), "text", targetDir)
        graft.operators.LmScore.writeModel(docs, "text", sourceDir)
        // serve-state certification: writeModel lands compacted
        // stores by construction; the maintenance pass verifies it
        // (inspect, find no drift, re-pack nothing) — the ccnet rule
        val reports = graft.operators.Maintenance.compactAll(s,
          Seq(targetDir, sourceDir))
        require(reports.values.forall(!_.compacted),
          s"dsir stores drifted at write time: $reports")
        graft.operators.LmScore.importanceBits(
          graft.operators.LmScore.readModel(s, targetDir),
          graft.operators.LmScore.readModel(s, sourceDir),
          docs, "doc_id", "text")
      },
      Some(oDsirSql)),

    // DSIR actually SERVING: corpus documents arrive as a STREAM and
    // weight per micro-batch against the two persisted models
    // (StreamJobs.dsirLookupStream), each batch overwriting its
    // batch_id=<id> subdir with releaseDsirCache per batch. Weights
    // are doc-local, so the cross-batch union equals the batch
    // weigher exactly — q_stream_lm_score's discipline applied to
    // importance weighting; shares q_text_dsir's oracle verbatim.
    "q_stream_dsir" -> Q(
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        val dir = graft.core.FsUtil.deleteOnExit(
          s"${System.getProperty("java.io.tmpdir")}/" +
            s"graft_stream_dsir_p${ProcessHandle.current().pid()}_" +
            java.lang.Integer.toHexString(d.hashCode))
        val run = s"$dir/run_${System.nanoTime()}"
        graft.operators.LmScore.writeModel(
          docs.filter(col("lang") === "en"), "text", s"$dir/target")
        graft.operators.LmScore.writeModel(docs, "text", s"$dir/source")
        val rows = docs.select($"doc_id", $"text")
          .as[(Long, String)].collect().toSeq
        implicit val sqlCtx = s.sqlContext
        val input = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, String)]
        val outDir = s"$run/out"
        val q = graft.streaming.StreamJobs.dsirLookupStream(
            input.toDS().toDF("doc_id", "text"), s"$dir/target",
            s"$dir/source", outDir, "doc_id", "text")
          .option("checkpointLocation", s"$run/ckpt").start()
        try {
          rows.grouped(math.max(1, rows.size / 3 + 1)).foreach { b =>
            input.addData(b); q.processAllAvailable()
          }
        } finally q.stop()
        s.read.parquet(outDir).select(col("doc_id"), col("n_bigrams"),
          col("target_bits"), col("source_bits"), col("delta_bits"),
          col("delta_milli_bits"))
      },
      Some(oDsirSql)),

    // the LM quality filter actually SERVING: corpus documents arrive
    // as a STREAM and score per micro-batch against the persisted
    // model (StreamJobs.lmLookupStream), each batch overwriting its
    // batch_id=<id> subdir. Scores are doc-local, so the cross-batch
    // union equals the batch oracle exactly — q_stream_bm25's
    // discipline applied to quality filtering.
    "q_stream_lm_score" -> Q(
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        val dir = graft.core.FsUtil.deleteOnExit(
          s"${System.getProperty("java.io.tmpdir")}/" +
            s"graft_stream_lm_p${ProcessHandle.current().pid()}_" +
            java.lang.Integer.toHexString(d.hashCode))
        val run = s"$dir/run_${System.nanoTime()}"
        val modelDir = s"$dir/model"
        graft.operators.LmScore.writeModel(
          docs.filter(col("lang") === "en"), "text", modelDir)
        val rows = docs.select($"doc_id", $"text")
          .as[(Long, String)].collect().toSeq
        implicit val sqlCtx = s.sqlContext
        val input = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, String)]
        val outDir = s"$run/out"
        val q = graft.streaming.StreamJobs.lmLookupStream(
            input.toDS().toDF("doc_id", "text"), modelDir, outDir,
            "doc_id", "text")
          .option("checkpointLocation", s"$run/ckpt").start()
        try {
          rows.grouped(math.max(1, rows.size / 3 + 1)).foreach { b =>
            input.addData(b); q.processAllAvailable()
          }
        } finally q.stop()
        s.read.parquet(outDir).select(col("doc_id"), col("n_bigrams"),
          col("bits"), col("milli_bits"))
      },
      Some(oLmScoreSql)),

    // the LM model's WRITE path under streaming: the reference corpus
    // arrives as a stream — seed model from a third of the en
    // stratum, the rest ingested by StreamJobs.lmIngestStream in
    // three tagged exactly-once batches, then a quiesced compactAll
    // restores the sorted layout and scoring runs from the store.
    // Shares q_text_lm_score's oracle: a stream-built model must be
    // bit-identical to the full-reference fresh train.
    "q_stream_lm_ingest" -> Q(
      (s, d) => {
        import s.implicits._
        import graft.operators.LmScore
        val docs = t(s, d, "documents")
        val en = docs.filter(col("lang") === "en")
        val dir = graft.core.FsUtil.deleteOnExit(
          s"${System.getProperty("java.io.tmpdir")}/" +
            s"graft_lm_ingest_p${ProcessHandle.current().pid()}_" +
            java.lang.Integer.toHexString(d.hashCode))
        val run = s"$dir/run_${System.nanoTime()}"
        val mDir = s"$run/model"
        LmScore.writeModel(en.filter($"doc_id" % 3 === 0), "text", mDir)
        val rest = en.filter($"doc_id" % 3 =!= 0)
          .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
        implicit val sqlCtx = s.sqlContext
        val input = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, String)]
        val q = graft.streaming.StreamJobs.lmIngestStream(
            input.toDS().toDF("doc_id", "text"), mDir, "text",
            runId = "r0")
          .option("checkpointLocation", s"$run/ckpt").start()
        try {
          rest.grouped(math.max(1, rest.size / 3 + 1)).foreach { b =>
            input.addData(b); q.processAllAvailable()
          }
        } finally q.stop()
        graft.operators.Maintenance.compactAll(s, Seq(mDir))
        LmScore.score(LmScore.readModel(s, mDir), docs, "doc_id", "text")
      },
      Some(oLmScoreSql)),

    "q_text_repetition" -> Q(
      (s, d) => graft.operators.TextProfile.repetition(
        t(s, d, "documents"), "doc_id", "text"),
      Some("""WITH w AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
             |  FROM documents),
             |uni AS (
             |  SELECT doc_id, len(w) AS n_tokens,
             |         len(list_distinct(w)) AS distinct_tokens
             |  FROM w),
             |bi AS (
             |  SELECT doc_id,
             |    unnest(list_transform(range(1, len(w)),
             |      i -> w[i] || ' ' || w[i+1])) AS gram
             |  FROM w WHERE len(w) >= 2),
             |bc AS (
             |  SELECT doc_id, gram, count(*) AS c
             |  FROM bi GROUP BY 1, 2),
             |bs AS (
             |  SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_bigram_n,
             |    sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_occ
             |  FROM bc GROUP BY 1)
             |SELECT u.doc_id,
             |  CAST(u.n_tokens AS BIGINT) AS n_tokens,
             |  CAST(u.distinct_tokens AS BIGINT) AS distinct_tokens,
             |  CAST(floor(u.distinct_tokens * 10000.0 / u.n_tokens)
             |       AS BIGINT) AS ttr_bp,
             |  CAST(b.n_bigrams AS BIGINT) AS n_bigrams,
             |  CAST(b.top_bigram_n AS BIGINT) AS top_bigram_n,
             |  CAST(floor(b.top_bigram_n * 10000.0 / b.n_bigrams)
             |       AS BIGINT) AS top2_bp,
             |  CAST(floor(b.dup_occ * 10000.0 / b.n_bigrams)
             |       AS BIGINT) AS dup2_bp
             |FROM uni u JOIN bs b USING (doc_id)
             |""".stripMargin))
  )
}

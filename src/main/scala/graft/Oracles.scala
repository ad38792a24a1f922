package graft

import graft.functions.Hashing
import graft.operators.PiiRedact

/** DuckDB oracle SQL for every SparkEntry query.
  *
  * Each statement mirrors the corresponding Spark plan's arithmetic
  * exactly (decimal sums, IEEE double ratios of exact sums, identical
  * fold orders and tie-breaks), so row/schema/hash comparison holds
  * bit-for-bit. Shared model: the trade CTEs below re-derive the
  * SURVEY §1 trade mapping over `events` in DuckDB.
  *
  * DuckDB-vs-Spark type notes baked in here:
  *  - `events.ts` is TIMESTAMP_NS in DuckDB → cast to micros TIMESTAMP;
  *  - SUM(BIGINT) is HUGEINT in DuckDB → cast to BIGINT;
  *  - EXTRACT/len/row_number are BIGINT in DuckDB → cast to match
  *    Spark's INT where Spark emits INT;
  *  - double folds start from 0.0 on both sides (Spark `aggregate`
  *    seeds 0D; here `list_reduce` over a 0.0-prepended list).
  */
object Oracles {

  // ---------------------------------------------------------------- trades

  private val bronzeCte =
    """bronze AS (
      |  SELECT
      |    event_id AS trade_id,
      |    event_type AS product_id,
      |    value AS price,
      |    CAST(json_extract_string(props, '$.k') AS DOUBLE) AS size,
      |    CASE WHEN event_id % 2 = 0 THEN 'buy' ELSE 'sell' END AS side,
      |    CAST(ts AS TIMESTAMP) AS trade_time,
      |    CAST(ts AS TIMESTAMP) + (event_id % 600) * INTERVAL '1 second' AS ingested_at,
      |    props AS _raw_payload,
      |    CAST(CAST(ts AS TIMESTAMP) + (event_id % 600) * INTERVAL '1 second' AS DATE) AS _ingestion_date
      |  FROM events
      |  WHERE event_id IS NOT NULL
      |)""".stripMargin

  private val bronzeDupCte =
    """bronze_dup AS (
      |  SELECT trade_id, product_id, price, size, side, trade_time, ingested_at, _raw_payload, _ingestion_date
      |  FROM bronze
      |  UNION ALL
      |  SELECT trade_id, product_id, price, size, side, trade_time,
      |         ingested_at + INTERVAL '900 seconds',
      |         _raw_payload,
      |         CAST(ingested_at + INTERVAL '900 seconds' AS DATE)
      |  FROM bronze WHERE trade_id % 10 = 0
      |)""".stripMargin

  private val dedupedCte =
    """deduped AS (
      |  SELECT * FROM bronze_dup
      |  QUALIFY row_number() OVER (PARTITION BY trade_id ORDER BY ingested_at) = 1
      |)""".stripMargin

  private val silverCte =
    """silver AS (
      |  SELECT trade_id, product_id,
      |    CAST(price AS DECIMAL(18,8)) AS price,
      |    CAST(size AS DECIMAL(18,8)) AS size,
      |    side, trade_time, ingested_at,
      |    date_diff('second', trade_time, ingested_at) * 1000 > 300000 AS _is_late_arrival,
      |    date_diff('second', trade_time, ingested_at) * 1000 AS _source_latency_ms,
      |    CAST(trade_time AS DATE) AS _trade_date
      |  FROM deduped
      |  WHERE trade_id IS NOT NULL AND price IS NOT NULL AND price > 0 AND trade_time IS NOT NULL
      |)""".stripMargin

  private val stgCte =
    """stg AS (
      |  SELECT *,
      |    CAST(CAST(price AS DOUBLE) * CAST(size AS DOUBLE) AS DECIMAL(18,8)) AS trade_value,
      |    CAST(EXTRACT(HOUR FROM trade_time) AS INT) AS trade_hour,
      |    CAST(EXTRACT(MINUTE FROM trade_time) AS INT) AS trade_minute,
      |    date_trunc('minute', trade_time) AS minute_bucket,
      |    date_trunc('hour', trade_time) AS hour_bucket
      |  FROM silver
      |  WHERE trade_time IS NOT NULL AND price > 0 AND size > 0
      |)""".stripMargin

  private val m1Cte =
    """m1_open AS (
      |  SELECT product_id, minute_bucket, price AS open FROM stg
      |  QUALIFY row_number() OVER (PARTITION BY product_id, minute_bucket ORDER BY trade_time, trade_id) = 1
      |), m1_close AS (
      |  SELECT product_id, minute_bucket, price AS close FROM stg
      |  QUALIFY row_number() OVER (PARTITION BY product_id, minute_bucket ORDER BY trade_time DESC, trade_id DESC) = 1
      |), m1_agg AS (
      |  SELECT product_id, minute_bucket AS window_start,
      |    MAX(price) AS high, MIN(price) AS low,
      |    CAST(SUM(size) AS DECIMAL(18,8)) AS volume,
      |    COUNT(*) AS trade_count,
      |    CAST(round(CAST(SUM(trade_value) AS DOUBLE) / NULLIF(CAST(SUM(size) AS DOUBLE), 0.0), 8) AS DECIMAL(18,8)) AS vwap
      |  FROM stg GROUP BY 1, 2
      |), m1 AS (
      |  SELECT a.product_id, a.window_start, o.open, a.high, a.low, c.close,
      |    a.volume, a.trade_count, a.vwap,
      |    a.window_start + INTERVAL '1 minute' AS window_end,
      |    CAST(a.window_start AS DATE) AS _partition_date
      |  FROM m1_agg a
      |  JOIN m1_open o ON a.product_id = o.product_id AND a.window_start = o.minute_bucket
      |  JOIN m1_close c ON a.product_id = c.product_id AND a.window_start = c.minute_bucket
      |)""".stripMargin

  private val h1Cte =
    """h1_open AS (
      |  SELECT product_id, date_trunc('hour', window_start) AS hs, open FROM m1
      |  QUALIFY row_number() OVER (PARTITION BY product_id, date_trunc('hour', window_start) ORDER BY window_start) = 1
      |), h1_close AS (
      |  SELECT product_id, date_trunc('hour', window_start) AS hs, close FROM m1
      |  QUALIFY row_number() OVER (PARTITION BY product_id, date_trunc('hour', window_start) ORDER BY window_start DESC) = 1
      |), h1_agg AS (
      |  SELECT product_id, date_trunc('hour', window_start) AS hs,
      |    MAX(high) AS high, MIN(low) AS low,
      |    CAST(SUM(volume) AS DECIMAL(18,8)) AS volume,
      |    CAST(SUM(trade_count) AS BIGINT) AS trade_count,
      |    CAST(round(CAST(SUM(CAST(CAST(vwap AS DOUBLE) * CAST(volume AS DOUBLE) AS DECIMAL(30,10))) AS DOUBLE)
      |         / NULLIF(CAST(SUM(volume) AS DOUBLE), 0.0), 8) AS DECIMAL(18,8)) AS vwap
      |  FROM m1 GROUP BY 1, 2
      |), h1 AS (
      |  SELECT a.product_id, a.hs AS window_start, o.open, a.high, a.low, c.close,
      |    a.volume, a.trade_count, a.vwap,
      |    a.hs + INTERVAL '1 hour' AS window_end,
      |    CAST(a.hs AS DATE) AS _partition_date
      |  FROM h1_agg a
      |  JOIN h1_open o ON a.product_id = o.product_id AND a.hs = o.hs
      |  JOIN h1_close c ON a.product_id = c.product_id AND a.hs = c.hs
      |)""".stripMargin

  private val dmCte =
    """dm_open AS (
      |  SELECT product_id, CAST(window_start AS DATE) AS date, open FROM h1
      |  QUALIFY row_number() OVER (PARTITION BY product_id, CAST(window_start AS DATE) ORDER BY window_start) = 1
      |), dm_close AS (
      |  SELECT product_id, CAST(window_start AS DATE) AS date, close FROM h1
      |  QUALIFY row_number() OVER (PARTITION BY product_id, CAST(window_start AS DATE) ORDER BY window_start DESC) = 1
      |), dm_agg AS (
      |  SELECT product_id, CAST(window_start AS DATE) AS date,
      |    MAX(high) AS high, MIN(low) AS low,
      |    CAST(SUM(volume) AS DECIMAL(18,8)) AS total_volume,
      |    CAST(SUM(trade_count) AS BIGINT) AS total_trades
      |  FROM h1 GROUP BY 1, 2
      |), dm AS (
      |  SELECT a.product_id, a.date, o.open, a.high, a.low, c.close,
      |    a.total_volume, a.total_trades,
      |    CAST(round((CAST(c.close AS DOUBLE) - CAST(o.open AS DOUBLE)) / NULLIF(CAST(o.open AS DOUBLE), 0.0), 8) AS DECIMAL(18,8)) AS daily_return,
      |    CAST(round((CAST(a.high AS DOUBLE) - CAST(a.low AS DOUBLE)) / NULLIF(CAST(o.open AS DOUBLE), 0.0), 8) AS DECIMAL(18,8)) AS volatility,
      |    CAST(round((CAST(a.high AS DOUBLE) - CAST(a.low AS DOUBLE)) / NULLIF(CAST(a.high AS DOUBLE), 0.0), 8) AS DECIMAL(18,8)) AS max_drawdown,
      |    date_trunc('month', a.date) AS _partition_month
      |  FROM dm_agg a
      |  JOIN dm_open o ON a.product_id = o.product_id AND a.date = o.date
      |  JOIN dm_close c ON a.product_id = c.product_id AND a.date = c.date
      |)""".stripMargin

  private def withTrades(upTo: String, body: String): String = {
    val all = Seq(
      "bronze" -> bronzeCte, "bronze_dup" -> bronzeDupCte,
      "deduped" -> dedupedCte, "silver" -> silverCte, "stg" -> stgCte,
      "m1" -> m1Cte, "h1" -> h1Cte, "dm" -> dmCte)
    val idx = all.indexWhere(_._1 == upTo)
    val ctes = all.take(idx + 1).map(_._2).mkString(",\n")
    s"WITH $ctes\n$body"
  }

  // ------------------------------------------------------------- documents

  private val shinglesCte =
    """dt AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM documents
      |), shl AS (
      |  SELECT doc_id,
      |    list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)]) AS shingles
      |  FROM dt
      |)""".stripMargin

  private val jaccardVerify =
    """SELECT doc_a, doc_b, jaccard FROM (
      |  SELECT doc_a, doc_b,
      |    CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
      |    CAST(len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS DOUBLE) AS jaccard
      |  FROM cand JOIN shl sa ON cand.doc_a = sa.doc_id JOIN shl sb ON cand.doc_b = sb.doc_id
      |) WHERE jaccard >= 0.8""".stripMargin

  /** CTE chain ending in `lid` (doc_id, pred_lang, score); shared by
    * lang_id and corpus_stats. */
  private def langIdCtes: String = {
    val vals = graft.operators.TextAnalysis.Stopwords
      .map { case (l, w) => s"('$l', '$w')" }.mkString(", ")
    s"""tk AS (
       |  SELECT doc_id, UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS tok FROM documents
       |), swx AS (SELECT * FROM (VALUES $vals) sw(sw_lang, sw_word)),
       |sc AS (
       |  SELECT doc_id, sw_lang, COUNT(*) AS score
       |  FROM tk JOIN swx ON tok = sw_word GROUP BY 1, 2
       |  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, sw_lang) = 1),
       |lid AS (
       |  SELECT d.doc_id, COALESCE(sc.sw_lang, 'und') AS pred_lang,
       |    CAST(COALESCE(sc.score, 0) AS BIGINT) AS score
       |  FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id)""".stripMargin
  }

  /** CTE chain ending in `pairs` = the capped ngram near-dup pairs;
    * shared by dedup_ngram_jaccard and dedup_clusters. */
  private def ngramPairsCtes: String =
    s"""$shinglesCte,
       |inv_all AS (SELECT doc_id, UNNEST(shingles) AS sh FROM shl),
       |rare AS (SELECT sh FROM inv_all GROUP BY sh
       |         HAVING COUNT(*) <= ${graft.operators.Dedup.DefaultMaxDocFreq}),
       |inv AS (SELECT ia.doc_id, ia.sh FROM inv_all ia JOIN rare USING (sh)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id),
       |pairs AS (
       |$jaccardVerify)""".stripMargin

  // ------------------------------------------------------------ embeddings

  /** The BM25 CTE chain over relation `rel` for a term set — shared
    * by the scan, stored-index, and incremental-index oracles (one
    * expression tree, so a hash match on any of them proves the same
    * arithmetic). Ends with the per-(doc, term) `contribs` CTE. */
  private def bm25Ctes(rel: String, terms: Seq[String]): String = {
    val in = terms.distinct.sorted.map(t => s"'$t'").mkString(", ")
    s"""toks AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w FROM $rel
       |), tf AS (
       |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, UNNEST(w) AS term FROM toks) GROUP BY 1, 2
       |), qtf AS (
       |  SELECT * FROM tf WHERE term IN ($in)
       |), dfq AS (
       |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qtf GROUP BY 1
       |), dls AS (
       |  SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM toks
       |), stats AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dls
       |), contribs AS (
       |  SELECT q.doc_id, q.term, d.dl,
       |    (CAST(s.n_docs AS DOUBLE) - CAST(f.df AS DOUBLE) + 0.5) /
       |      (CAST(f.df AS DOUBLE) + 0.5)
       |      * (CAST(q.tf AS DOUBLE) * 2.2) /
       |      (CAST(q.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
       |        (CAST(d.dl AS DOUBLE) /
       |          (CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE))))) AS contrib
       |  FROM qtf q JOIN dfq f USING (term)
       |  JOIN dls d ON q.doc_id = d.doc_id CROSS JOIN stats s)""".stripMargin
  }

  private val bm25Select =
    """SELECT doc_id, MAX(dl) AS dl, CAST(COUNT(*) AS BIGINT) AS n_hits,
      |  round(list_reduce(list_prepend(CAST(0 AS DOUBLE), list(contrib ORDER BY term)),
      |    (x, y) -> x + y), 8) AS bm25
      |FROM contribs GROUP BY doc_id
      |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin

  private val bm25Sql =
    s"WITH ${bm25Ctes("documents",
      graft.operators.Retrieval.DefaultQuery)}\n$bm25Select"

  private val nrmCte =
    """nrm AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_reduce(list_concat([CAST(0 AS DOUBLE)],
      |      [CAST(x AS DOUBLE) * CAST(x AS DOUBLE) FOR x IN embedding]), (a, b) -> a + b)) AS nrm
      |  FROM embeddings
      |)""".stripMargin

  /** BPE training CTE chain, k stages: v0 is the char-split word
    * inventory; each stage s computes pair counts over v(s-1), picks
    * the best pair (count DESC, l, r — Spark's exact tie-break) into
    * b_s, and applies the greedy leftmost-first merge pass into v_s.
    * The merge pass is a list_reduce over singleton-wrapped symbols —
    * the accumulator starts as the first symbol's singleton, so it is
    * exactly Spark's empty-seeded aggregate fold. */
  private def bpeCtes(k: Int): String = {
    val sb = new StringBuilder
    sb.append(
      "tk AS (\n" +
        "  SELECT doc_id, UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS word\n" +
        "  FROM documents),\n" +
        "wc AS (SELECT word, COUNT(*) AS cnt FROM tk WHERE word <> '' GROUP BY word),\n" +
        "v0 AS (SELECT word, cnt, [word[i] FOR i IN range(1, len(word) + 1)] AS syms FROM wc)")
    for (s <- 1 to k) {
      sb.append(s""",
p$s AS (
  SELECT pr.l AS l, pr.r AS r, SUM(cnt) AS c FROM (
    SELECT unnest([{'l': syms[i], 'r': syms[i+1]} FOR i IN range(1, len(syms))]) AS pr, cnt
    FROM v${s - 1}) GROUP BY pr.l, pr.r),
b$s AS (SELECT l, r, c FROM p$s ORDER BY c DESC, l, r LIMIT 1),
v$s AS (
  SELECT word, cnt,
    list_reduce([[t] FOR t IN syms], (acc, te) ->
      CASE WHEN acc[-1] = b.l AND te[1] = b.r
           THEN list_append(acc[1:len(acc)-1], b.l || b.r)
           ELSE list_concat(acc, te) END) AS syms
  FROM v${s - 1}, b$s b)""")
    }
    sb.toString
  }

  /** Unigram-LM tokenizer CTE chain (the [[bpeCtes]] analog for the
    * SentencePiece family): candidate substrings → top-K multi-char
    * pieces + every single char (v0) → `rounds` hard-EM iterations
    * (per-word Viterbi DP folded through `list_reduce`, re-count,
    * prune zero-count multi pieces) → one final segmentation for
    * encoding. The DP optimizes the exact-integer lexicographic
    * objective (fewest pieces, largest Σ weight, lexicographically
    * earliest sequence) via struct ordering — `{'k', 'ns', 'sq'}`
    * sorts by piece count, then NEGATED weight sum, then sequence —
    * replaying graft's `Unigram.segment` bit-for-bit (libm-free: no
    * IEEE ln enters any comparison). */
  private def unigramCtes(maxl: Int, k: Int, rounds: Int): String = {
    def spans(r: Int) = s"""
sp$r AS (
  SELECT t.word, list({'e': t.s.e, 'l': t.s.l, 'c': v.c, 'p': t.s.p} ORDER BY t.s.e, t.s.l) AS spans
  FROM (
    SELECT word, UNNEST(flatten([
      [{'e': i + l - 1, 'l': l, 'p': word[i:i+l-1]} FOR i IN range(1, len(word) - l + 2)]
      FOR l IN range(1, ${maxl + 1}) IF len(word) >= l])) AS s
    FROM wc) t
  JOIN v${r - 1} v ON v.piece = t.s.p
  GROUP BY t.word)"""
    def seg(r: Int) = s"""
sg$r AS (
  SELECT w.word, w.cnt,
    list_reduce(
      list_concat(
        [[{'k': 0, 'ns': CAST(0 AS BIGINT), 'sq': CAST([] AS VARCHAR[])}]],
        [[{'k': i, 'ns': CAST(0 AS BIGINT), 'sq': CAST([] AS VARCHAR[])}] FOR i IN range(1, len(w.word) + 1)]),
      (acc, te) -> list_append(acc, list_sort([
        {'k': acc[te[1].k - sp.l + 1].k + 1,
         'ns': acc[te[1].k - sp.l + 1].ns - sp.c,
         'sq': list_append(acc[te[1].k - sp.l + 1].sq, sp.p)}
        FOR sp IN s.spans IF sp.e = te[1].k])[1]))[len(w.word) + 1].sq AS pieces
  FROM wc w JOIN sp$r s USING (word))"""
    def recount(r: Int) = s"""
ct$r AS (
  SELECT piece, CAST(SUM(cnt) AS BIGINT) AS c FROM (
    SELECT cnt, UNNEST(pieces) AS piece FROM sg$r)
  GROUP BY piece),
v$r AS (
  SELECT v.piece, CAST(COALESCE(ct.c, 0) AS BIGINT) AS c
  FROM v${r - 1} v LEFT JOIN ct$r ct USING (piece)
  WHERE COALESCE(ct.c, 0) > 0 OR len(v.piece) = 1)"""
    val em = (1 to rounds).map(r => s"${spans(r)},${seg(r)},${recount(r)}")
      .mkString(",")
    s"""tk AS (
  SELECT doc_id, UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS word
  FROM documents),
wc AS (SELECT word, COUNT(*) AS cnt FROM tk WHERE word <> '' GROUP BY word),
cand AS (
  SELECT piece, CAST(SUM(cnt) AS BIGINT) AS c FROM (
    SELECT cnt, UNNEST(flatten([
      [word[i:i+l-1] FOR i IN range(1, len(word) - l + 2)]
      FOR l IN range(1, ${maxl + 1}) IF len(word) >= l])) AS piece
    FROM wc)
  GROUP BY piece),
vm AS (SELECT piece, c FROM cand WHERE len(piece) > 1 ORDER BY c DESC, piece LIMIT $k),
vs AS (SELECT piece, c FROM cand WHERE len(piece) = 1),
v0 AS (SELECT * FROM vm UNION ALL SELECT * FROM vs),$em,${spans(rounds + 1)},${seg(rounds + 1)}"""
  }

  /** The merge-table select over k trained stages. */
  private def bpeMergeSelect(k: Int): String =
    (1 to k).map(s =>
      s"SELECT $s AS rank, l AS lft, r AS rgt, CAST(c AS BIGINT) AS pair_count FROM b$s")
      .mkString("\nUNION ALL\n")

  private def duckDot(a: String, b: String): String =
    s"""list_reduce(list_concat([CAST(0 AS DOUBLE)],
       |  [CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) FOR i IN range(1, ${Hashing.EmbDim + 1})]), (x, y) -> x + y)""".stripMargin

  /** The trained-quantizer CTE chain over `nrm` — one ordered-fold
    * k-means iteration (seeds = 16 lowest vec_ids, per-cluster sums
    * folded in ascending vec_id order so the IEEE doubles match
    * Spark's `trainCentroidsOrdered` bit-identically) ending in `cent`
    * (trained centroids) and `asg` (every vector's nearest-centroid
    * assignment). Shared by ivf_topk_trained and semantic_dedup. */
  private def trainedAsgCtes: String =
    s"""seed AS (SELECT vec_id AS centroid_id, embedding AS ce, nrm AS cn FROM nrm WHERE vec_id < 16),
       |tasg AS (
       |  SELECT v.vec_id, v.embedding, c.centroid_id
       |  FROM nrm v, seed c
       |  QUALIFY row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |    ${duckDot("v.embedding", "c.ce")} / (v.nrm * c.cn) DESC, c.centroid_id) = 1),
       |tsum AS (
       |  SELECT centroid_id, COUNT(*) AS cnt,
       |    list_reduce(
       |      list_prepend([CAST(0 AS DOUBLE) FOR i IN range(1, ${Hashing.EmbDim + 1})],
       |        list(embedding ORDER BY vec_id)),
       |      (a, b) -> list_transform(range(1, ${Hashing.EmbDim + 1}),
       |        i -> a[i] + CAST(b[i] AS DOUBLE))) AS sums
       |  FROM tasg GROUP BY centroid_id),
       |tmean AS (SELECT centroid_id, [CAST(x / cnt AS FLOAT) FOR x IN sums] AS ce FROM tsum),
       |cent0 AS (
       |  SELECT s.centroid_id, COALESCE(m.ce, s.ce) AS ce
       |  FROM seed s LEFT JOIN tmean m USING (centroid_id)),
       |cent AS (SELECT centroid_id, ce, sqrt(${duckDot("ce", "ce")}) AS cn FROM cent0),
       |asg AS (
       |  SELECT v.vec_id, c.centroid_id
       |  FROM nrm v, cent c
       |  QUALIFY row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |    ${duckDot("v.embedding", "c.ce")} / (v.nrm * c.cn) DESC, c.centroid_id) = 1)""".stripMargin

  /** Random-hyperplane LSH signature + band CTEs over `nrm` — shared by
    * dedup_embedding and ann_topk_bucketed (identical bucketing on both
    * sides of the contract). */
  private def sigBndCtes: String =
    s"""sig AS (
       |  SELECT vec_id, embedding, nrm,
       |    [CASE WHEN list_reduce(list_concat([CAST(0 AS DOUBLE)],
       |       [(${Hashing.planeSignDuck("i", "j")}) * CAST(embedding[j + 1] AS DOUBLE) FOR j IN range(0, ${Hashing.EmbDim})]),
       |       (a, b) -> a + b) > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END FOR i IN range(0, ${Hashing.NumPlanes})] AS sig
       |  FROM nrm),
       |bnd AS (
       |  SELECT vec_id, band, ${(0 until Hashing.PlaneBandBits).map(m =>
            s"sig[band*${Hashing.PlaneBandBits}+${m + 1}] * ${1L << m}").mkString(" + ")} AS bval
       |  FROM (SELECT vec_id, sig, k AS band FROM sig, UNNEST(range(0, ${Hashing.PlaneBands})) AS t(k)))""".stripMargin

  // ----------------------------------------------------- price_latest CTEs

  /** The price_latest derivation (anchored horizons → final), shared by
    * the price_latest query and the gold-layer quality checks. Appends
    * to the `dm`-level trade CTE chain. */
  private def dedupClustersSql: String =
    s"""WITH RECURSIVE $ngramPairsCtes,
       |edges AS (
       |  SELECT doc_a AS v, doc_b AS u FROM pairs
       |  UNION
       |  SELECT doc_b AS v, doc_a AS u FROM pairs),
       |verts AS (SELECT DISTINCT v FROM edges),
       |reach(v, u) AS (
       |  SELECT v, v FROM verts
       |  UNION
       |  SELECT r.v, e.u FROM reach r JOIN edges e ON r.u = e.v)
       |SELECT v AS doc_id, MIN(u) AS cluster_id, v = MIN(u) AS is_canonical
       |FROM reach GROUP BY v""".stripMargin

  private val priceLatestCtes =
    """anchor AS (SELECT MAX(trade_time) AS as_of FROM stg),
      |lt AS (
      |  SELECT product_id, price, trade_time AS updated_at FROM stg
      |  QUALIFY row_number() OVER (PARTITION BY product_id ORDER BY trade_time DESC, trade_id DESC) = 1),
      |p1m AS (
      |  SELECT product_id, close AS price_1m_ago FROM m1, anchor
      |  WHERE window_start >= as_of - INTERVAL '2 minutes'
      |  QUALIFY row_number() OVER (PARTITION BY product_id ORDER BY window_start DESC) = 2),
      |p1h AS (
      |  SELECT product_id, close AS price_1h_ago FROM h1, anchor
      |  WHERE window_start >= as_of - INTERVAL '2 hours'
      |  QUALIFY row_number() OVER (PARTITION BY product_id ORDER BY window_start DESC) = 2),
      |p24 AS (
      |  SELECT product_id, open AS price_24h_ago, high AS high_24h, low AS low_24h, total_volume AS volume_24h
      |  FROM dm, anchor WHERE date = CAST(as_of AS DATE) - 1),
      |final AS (
      |  SELECT lt.product_id, lt.price, lt.updated_at,
      |    CAST(round((CAST(lt.price AS DOUBLE) - CAST(COALESCE(p1m.price_1m_ago, lt.price) AS DOUBLE)) / NULLIF(CAST(p1m.price_1m_ago AS DOUBLE), 0.0) * 100.0, 4) AS DECIMAL(10,4)) AS change_1m_pct,
      |    CAST(round((CAST(lt.price AS DOUBLE) - CAST(COALESCE(p1h.price_1h_ago, lt.price) AS DOUBLE)) / NULLIF(CAST(p1h.price_1h_ago AS DOUBLE), 0.0) * 100.0, 4) AS DECIMAL(10,4)) AS change_1h_pct,
      |    CAST(round((CAST(lt.price AS DOUBLE) - CAST(COALESCE(p24.price_24h_ago, lt.price) AS DOUBLE)) / NULLIF(CAST(p24.price_24h_ago AS DOUBLE), 0.0) * 100.0, 4) AS DECIMAL(10,4)) AS change_24h_pct,
      |    p24.high_24h, p24.low_24h, p24.volume_24h, anchor.as_of
      |  FROM lt
      |  LEFT JOIN p1m ON lt.product_id = p1m.product_id
      |  LEFT JOIN p1h ON lt.product_id = p1h.product_id
      |  LEFT JOIN p24 ON lt.product_id = p24.product_id
      |  CROSS JOIN anchor)""".stripMargin

  // ---------------------------------------------------------------- quality

  /** Rendered from the SAME check definitions the Spark operator uses
    * (graft.operators.DataQuality — each CheckDef carries its DuckDB
    * mirror), so the two sides cannot drift. Covers bronze + silver
    * suites, the per-product freshness check, and the gold mart tests
    * over m1/h1/dm/price_latest. */
  private def qualityReport: String = {
    import graft.operators.DataQuality
    import graft.operators.DataQuality.CheckDef
    def cte(tbl: String, src: String, checks: Seq[CheckDef]): String = {
      val aggCols = checks.zipWithIndex
        .map { case (c, i) => s"${c.duck(src)} AS v$i" }.mkString(", ")
      s"${tbl}_agg AS (SELECT COUNT(*) AS rc, $aggCols FROM $src)"
    }
    def branches(tbl: String, checks: Seq[CheckDef]): String =
      checks.zipWithIndex.map { case (c, i) =>
        s"SELECT '$tbl' AS table_name, '${c.name}' AS check_name, rc AS row_count, " +
          s"CAST(v$i AS BIGINT) AS violations, CAST(v$i AS BIGINT) = 0 AS passed FROM ${tbl}_agg"
      }.mkString("\nUNION ALL\n")
    val suites = Seq(
      ("bronze_trades", "bronze_dup", DataQuality.bronzeChecks),
      ("silver_trades", "silver", DataQuality.silverChecks),
      ("ohlcv_1m", "m1", DataQuality.ohlcvChecks),
      ("ohlcv_1h", "h1", DataQuality.ohlcvChecks),
      ("daily_metrics", "dm", DataQuality.dailyMetricsChecks),
      ("price_latest", "final", DataQuality.priceLatestChecks))
    val freshness =
      """fr AS (SELECT product_id, MAX(trade_time) AS latest FROM silver GROUP BY 1),
        |fr_agg AS (SELECT COUNT(*) AS rc,
        |  SUM(CASE WHEN latest < (SELECT MAX(latest) FROM fr) - INTERVAL '24 hours' THEN 1 ELSE 0 END) AS v0
        |  FROM fr)""".stripMargin
    val freshnessBranch =
      "SELECT 'silver_trades' AS table_name, 'freshness_products_24h' AS check_name, " +
        "rc AS row_count, CAST(v0 AS BIGINT) AS violations, " +
        "CAST(v0 AS BIGINT) = 0 AS passed FROM fr_agg"
    withTrades("dm",
      s""", $priceLatestCtes,
         |$freshness,
         |${suites.map { case (t, s, c) => cte(t, s, c) }.mkString(",\n")}
         |${branches("bronze_trades", DataQuality.bronzeChecks)}
         |UNION ALL
         |${branches("silver_trades", DataQuality.silverChecks)}
         |UNION ALL
         |$freshnessBranch
         |UNION ALL
         |${suites.drop(2).map { case (t, _, c) => branches(t, c) }.mkString("\nUNION ALL\n")}""".stripMargin)
  }

  // ------------------------------------------------------------------- all

  def all: Map[String, String] = Map(

    "bronze_ingest" -> withTrades("bronze", "SELECT * FROM bronze"),

    "silver_dedup" -> withTrades("deduped", "SELECT * FROM deduped"),

    // Final SELECTs cast DECIMAL columns to DOUBLE: the driver contract
    // emits float64 (see Rounding.asDoubles) so the hash comparison is
    // independent of how each side's reader materializes decimals.
    "silver_transform" -> withTrades("silver",
      """SELECT trade_id, product_id, CAST(price AS DOUBLE) AS price,
        |  CAST(size AS DOUBLE) AS size, side, trade_time, ingested_at,
        |  _is_late_arrival, _source_latency_ms, _trade_date
        |FROM silver""".stripMargin),

    "incremental_read" -> withTrades("bronze_dup",
      """SELECT b.* FROM bronze_dup b, (SELECT MAX(ingested_at) - INTERVAL '2 hours' AS cutoff FROM bronze_dup)
        |WHERE b.ingested_at >= cutoff""".stripMargin),

    "merge_upsert" -> withTrades("silver",
      """, tgt AS (SELECT * FROM silver WHERE trade_id % 3 <> 0),
        |src AS (
        |  SELECT trade_id, product_id,
        |    CAST(CAST(price AS DOUBLE) * 1.005 AS DECIMAL(18,8)) AS price,
        |    size, side, trade_time, ingested_at, _is_late_arrival, _source_latency_ms, _trade_date
        |  FROM silver WHERE trade_id % 2 = 0),
        |merged AS (
        |  SELECT trade_id, product_id, price, size, side, trade_time, ingested_at, _is_late_arrival, _source_latency_ms, _trade_date FROM tgt
        |  WHERE trade_id NOT IN (SELECT trade_id FROM src)
        |  UNION ALL
        |  SELECT trade_id, product_id, price, size, side, trade_time, ingested_at, _is_late_arrival, _source_latency_ms, _trade_date FROM src)
        |SELECT trade_id, product_id, CAST(price AS DOUBLE) AS price,
        |  CAST(size AS DOUBLE) AS size, side, trade_time, ingested_at,
        |  _is_late_arrival, _source_latency_ms, _trade_date
        |FROM merged""".stripMargin),

    "silver_stats" -> withTrades("silver",
      """SELECT product_id, COUNT(*) AS trade_count,
        |  MIN(trade_time) AS earliest_trade, MAX(trade_time) AS latest_trade,
        |  CAST(SUM(_source_latency_ms) AS DOUBLE) / COUNT(*) AS avg_latency_ms,
        |  CAST(SUM(CASE WHEN _is_late_arrival THEN 1 ELSE 0 END) AS BIGINT) AS late_arrivals
        |FROM silver GROUP BY product_id""".stripMargin),

    "stg_trades" -> withTrades("stg",
      """SELECT trade_id, product_id, CAST(price AS DOUBLE) AS price,
        |  CAST(size AS DOUBLE) AS size, side, trade_time, ingested_at,
        |  _is_late_arrival, _source_latency_ms, _trade_date,
        |  CAST(trade_value AS DOUBLE) AS trade_value,
        |  trade_hour, trade_minute, minute_bucket, hour_bucket
        |FROM stg""".stripMargin),

    // ROLLUP: DuckDB's GROUPING_ID shares Spark's bit convention
    // (bit 1 = column aggregated out, first column = MSB).
    "sales_cube" -> withTrades("stg",
      """SELECT product_id, _trade_date,
        |  CAST(CAST(SUM(trade_value) AS DECIMAL(18,8)) AS DOUBLE) AS total_value,
        |  CAST(CAST(SUM(size) AS DECIMAL(18,4)) AS DOUBLE) AS total_size,
        |  CAST(COUNT(*) AS BIGINT) AS n_trades,
        |  CAST(GROUPING_ID(product_id, _trade_date) AS BIGINT) AS gid
        |FROM stg
        |GROUP BY ROLLUP(product_id, _trade_date)""".stripMargin),

    // Explicit GROUPING SETS (no grand total), same bit convention.
    "trade_grouping_sets" -> withTrades("stg",
      """SELECT product_id, side,
        |  CAST(CAST(SUM(trade_value) AS DECIMAL(18,8)) AS DOUBLE) AS total_value,
        |  CAST(COUNT(*) AS BIGINT) AS n_trades,
        |  CAST(GROUPING_ID(product_id, side) AS BIGINT) AS gid
        |FROM stg
        |GROUP BY GROUPING SETS ((product_id, side), (product_id), (side))""".stripMargin),

    // CUBE: all four grouping sets, same GROUPING_ID bit convention.
    "trade_cube" -> withTrades("stg",
      """SELECT product_id, side,
        |  CAST(CAST(SUM(trade_value) AS DECIMAL(18,8)) AS DOUBLE) AS total_value,
        |  CAST(COUNT(*) AS BIGINT) AS n_trades,
        |  CAST(GROUPING_ID(product_id, side) AS BIGINT) AS gid
        |FROM stg
        |GROUP BY CUBE(product_id, side)""".stripMargin),

    "ohlcv_1m" -> withTrades("m1",
      """SELECT product_id, window_start, CAST(open AS DOUBLE) AS open,
        |  CAST(high AS DOUBLE) AS high, CAST(low AS DOUBLE) AS low,
        |  CAST(close AS DOUBLE) AS close, CAST(volume AS DOUBLE) AS volume,
        |  trade_count, CAST(vwap AS DOUBLE) AS vwap, window_end, _partition_date
        |FROM m1""".stripMargin),

    "ohlcv_1h" -> withTrades("h1",
      """SELECT product_id, window_start, CAST(open AS DOUBLE) AS open,
        |  CAST(high AS DOUBLE) AS high, CAST(low AS DOUBLE) AS low,
        |  CAST(close AS DOUBLE) AS close, CAST(volume AS DOUBLE) AS volume,
        |  trade_count, CAST(vwap AS DOUBLE) AS vwap, window_end, _partition_date
        |FROM h1""".stripMargin),

    // DuckDB's native ASOF LEFT JOIN (inclusive l.ts >= r.ts) is the
    // semantic spec the Spark union+window plan must reproduce.
    "asof_join" -> withTrades("h1",
      """SELECT s.trade_id, s.product_id, s.trade_time,
        |  CAST(s.price AS DOUBLE) AS price,
        |  CAST(c.vwap AS DOUBLE) AS h1_vwap,
        |  CAST(c.close AS DOUBLE) AS h1_close,
        |  CAST(s.price AS DOUBLE) / CAST(c.vwap AS DOUBLE) - 1.0 AS dev_vs_vwap
        |FROM stg s ASOF LEFT JOIN h1 c
        |  ON s.product_id = c.product_id AND s.trade_time >= c.window_end""".stripMargin),

    // Bucketed (hot-key-safe) asof path: same semantics as asof_join by
    // construction, so the oracle is the same native ASOF LEFT JOIN —
    // the key exists to keep the scale path hash-checked.
    "asof_join_bucketed" -> withTrades("h1",
      """SELECT s.trade_id, s.product_id, s.trade_time,
        |  CAST(s.price AS DOUBLE) AS price,
        |  CAST(c.vwap AS DOUBLE) AS h1_vwap,
        |  CAST(c.close AS DOUBLE) AS h1_close,
        |  CAST(s.price AS DOUBLE) / CAST(c.vwap AS DOUBLE) - 1.0 AS dev_vs_vwap
        |FROM stg s ASOF LEFT JOIN h1 c
        |  ON s.product_id = c.product_id AND s.trade_time >= c.window_end""".stripMargin),

    // Trailing 15-minute RANGE frame on epoch seconds; the moving
    // average divides an exact decimal frame-sum (associative, so the
    // engines' different frame-summation orders cannot drift) by the
    // frame count in double.
    "rolling_metrics" -> withTrades("m1",
      """SELECT product_id, window_start, CAST(close AS DOUBLE) AS close,
        |  CAST(n_candles AS BIGINT) AS n_candles,
        |  CAST(close_sum AS DOUBLE) / CAST(n_candles AS DOUBLE) AS ma_close,
        |  CAST(roll_high AS DOUBLE) AS roll_high,
        |  CAST(roll_low AS DOUBLE) AS roll_low,
        |  CAST(roll_volume AS DOUBLE) AS roll_volume
        |FROM (
        |  SELECT product_id, window_start, close,
        |    COUNT(*) OVER w AS n_candles,
        |    SUM(close) OVER w AS close_sum,
        |    MAX(high) OVER w AS roll_high,
        |    MIN(low) OVER w AS roll_low,
        |    SUM(volume) OVER w AS roll_volume
        |  FROM m1
        |  WINDOW w AS (PARTITION BY product_id
        |    ORDER BY CAST(epoch(window_start) AS BIGINT)
        |    RANGE BETWEEN 840 PRECEDING AND CURRENT ROW))""".stripMargin),

    // EWMA(α=1/2) over the last 16 candles, numerator and denominator
    // both scaled by 2^15 so every weight is an exact INTEGER 2^(15-k)
    // (shifted bigint, never libm pow): close·w terms are exact
    // DECIMAL(23,8) products summed exactly with NO scale-reducing
    // decimal cast (Spark's downcast rounds HALF_UP, DuckDB's
    // truncates — they diverge on ties); sums stay under 2^53 so the
    // decimal→double cast is one correctly-rounded divide in both
    // engines; the scaled normalizer 2^16 - 2^(16-n) is an exact
    // integer double; one final divide rounded to 8.
    "ewma_price" -> withTrades("m1",
      """, lists AS (
        |  SELECT product_id, window_start, close,
        |    list(close) OVER (PARTITION BY product_id ORDER BY window_start
        |      ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS cl
        |  FROM m1)
        |SELECT product_id, window_start, CAST(close AS DOUBLE) AS close,
        |  len(cl) AS n_candles,
        |  CAST(round(
        |    CAST(list_aggregate(
        |      [CAST(CAST(cl[i] AS DECIMAL(18,8)) *
        |            CAST((CAST(1 AS BIGINT) << (i + 15 - len(cl)))
        |              AS DECIMAL(5,0))
        |        AS DECIMAL(24,8)) FOR i IN range(1, len(cl) + 1)],
        |      'sum') AS DOUBLE)
        |    / CAST((CAST(1 AS BIGINT) << 16) -
        |           (CAST(1 AS BIGINT) << (16 - len(cl))) AS DOUBLE),
        |    8) AS DOUBLE) AS ewma_close
        |FROM lists""".stripMargin),

    // Cutler's RSI-14: exact decimal close-to-close diffs, exact
    // frame sums (order-free), one final double divide rounded to 8;
    // NULL on no-prior-change rows and zero total movement. Wilder's
    // recursive smoothing is deliberately NOT used (order-dependent
    // float state).
    "rsi_14" -> withTrades("m1",
      """, diffs AS (
        |  SELECT product_id, window_start, close,
        |    CAST(close - lag(close) OVER
        |      (PARTITION BY product_id ORDER BY window_start)
        |      AS DECIMAL(19,8)) AS diff
        |  FROM m1)
        |SELECT product_id, window_start, CAST(close AS DOUBLE) AS close,
        |  COUNT(diff) OVER w AS n_changes,
        |  CAST(round(
        |    CAST(100 AS DOUBLE) *
        |      CAST(SUM(greatest(diff, CAST(0 AS DECIMAL(19,8)))) OVER w
        |        AS DOUBLE) /
        |      NULLIF(CAST(SUM(greatest(diff, CAST(0 AS DECIMAL(19,8))))
        |          OVER w +
        |        SUM(greatest(-diff, CAST(0 AS DECIMAL(19,8)))) OVER w
        |        AS DOUBLE), 0.0),
        |    8) AS DOUBLE) AS rsi
        |FROM diffs
        |WINDOW w AS (PARTITION BY product_id ORDER BY window_start
        |  ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)""".stripMargin),

    // Spine via generate_series + forward fill with IGNORE NULLS —
    // mirrors Ohlcv.gapFill's sequence/explode + last(ignoreNulls).
    "ohlcv_gap_fill" -> withTrades("m1",
      """, bounds AS (
        |  SELECT product_id, MIN(window_start) AS mn, MAX(window_start) AS mx
        |  FROM m1 GROUP BY 1
        |), spine AS (
        |  SELECT product_id,
        |    UNNEST(generate_series(mn, mx, INTERVAL '1 minute')) AS window_start
        |  FROM bounds
        |), j AS (
        |  SELECT s.product_id, s.window_start,
        |    m.close, m.volume, m.trade_count,
        |    m.close IS NULL AS is_gap
        |  FROM spine s LEFT JOIN m1 m
        |    ON s.product_id = m.product_id AND s.window_start = m.window_start)
        |SELECT product_id, window_start, is_gap,
        |  CAST(last_value(close IGNORE NULLS) OVER (PARTITION BY product_id
        |    ORDER BY window_start ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS close_filled,
        |  CAST(COALESCE(volume, 0) AS DOUBLE) AS volume,
        |  CAST(COALESCE(trade_count, 0) AS BIGINT) AS trade_count
        |FROM j""".stripMargin),

    // Variance numerator n*Sum(x^2) - Sum(x)^2 in EXACT decimals
    // (constant frames cancel to literal zero); only the final double
    // conversion is inexact (relative 1 ulp), absorbed by round(sd, 8).
    "anomaly_zscore" -> withTrades("m1",
      """SELECT product_id, window_start, CAST(close AS DOUBLE) AS close,
        |  CAST(n_candles AS BIGINT) AS n_candles, mean_close, sd_close, zscore,
        |  COALESCE(abs(zscore) > 2.0, FALSE) AS is_anomaly
        |FROM (
        |  SELECT product_id, window_start, close, n_candles, mean_close,
        |    round(sqrt(greatest(var_close, 0.0)), 8) AS sd_close,
        |    (CAST(close AS DOUBLE) - mean_close) /
        |      NULLIF(round(sqrt(greatest(var_close, 0.0)), 8), 0.0) AS zscore
        |  FROM (
        |    SELECT product_id, window_start, close, n_candles,
        |      CAST(close_sum AS DOUBLE) / CAST(n_candles AS DOUBLE) AS mean_close,
        |      CAST(CAST(n_candles AS DECIMAL(4,0)) * CAST(sq_sum AS DECIMAL(30,16))
        |        - CAST(close_sum AS DECIMAL(19,8)) * CAST(close_sum AS DECIMAL(18,8)) AS DOUBLE)
        |        / (CAST(n_candles AS DOUBLE) * CAST(n_candles AS DOUBLE)) AS var_close
        |    FROM (
        |      SELECT product_id, window_start, close,
        |        COUNT(*) OVER w AS n_candles,
        |        SUM(close) OVER w AS close_sum,
        |        SUM(CAST(CAST(close AS DECIMAL(19,8)) * close AS DECIMAL(38,16))) OVER w AS sq_sum
        |      FROM m1
        |      WINDOW w AS (PARTITION BY product_id
        |        ORDER BY CAST(epoch(window_start) AS BIGINT)
        |        RANGE BETWEEN 840 PRECEDING AND CURRENT ROW))))""".stripMargin),

    // Pivot: fixed d1..d7 values → the same conditional-aggregate pass
    // Spark compiles a fixed-values pivot to. DuckDB dayofweek is
    // 0-based Sunday; Spark's is 1-based Sunday — the +1 aligns them.
    "trade_dow_pivot" -> withTrades("stg",
      """SELECT product_id,
        |  CAST(CAST(SUM(CASE WHEN dow = 'd1' THEN trade_value END) AS DECIMAL(18,8)) AS DOUBLE) AS d1,
        |  CAST(CAST(SUM(CASE WHEN dow = 'd2' THEN trade_value END) AS DECIMAL(18,8)) AS DOUBLE) AS d2,
        |  CAST(CAST(SUM(CASE WHEN dow = 'd3' THEN trade_value END) AS DECIMAL(18,8)) AS DOUBLE) AS d3,
        |  CAST(CAST(SUM(CASE WHEN dow = 'd4' THEN trade_value END) AS DECIMAL(18,8)) AS DOUBLE) AS d4,
        |  CAST(CAST(SUM(CASE WHEN dow = 'd5' THEN trade_value END) AS DECIMAL(18,8)) AS DOUBLE) AS d5,
        |  CAST(CAST(SUM(CASE WHEN dow = 'd6' THEN trade_value END) AS DECIMAL(18,8)) AS DOUBLE) AS d6,
        |  CAST(CAST(SUM(CASE WHEN dow = 'd7' THEN trade_value END) AS DECIMAL(18,8)) AS DOUBLE) AS d7
        |FROM (SELECT product_id, trade_value,
        |        'd' || (dayofweek(trade_time) + 1) AS dow FROM stg)
        |GROUP BY 1
        |ORDER BY 1""".stripMargin),

    // ntile deciles over the reduced customer rollup; ntile's
    // equal-buckets-remainder-to-first rule is shared by both engines,
    // and the (value DESC, unique key) order makes assignment exact.
    "customer_value_deciles" ->
      """WITH pc AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS cust_value
        |  FROM orders GROUP BY 1),
        |d AS (
        |  SELECT cust_value,
        |    ntile(10) OVER (ORDER BY cust_value DESC, o_custkey) AS decile
        |  FROM pc)
        |SELECT CAST(decile AS INT) AS decile,
        |  CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST(CAST(SUM(cust_value) AS DECIMAL(18,4)) AS DOUBLE) AS decile_value
        |FROM d
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    // Range join: anomaly minutes (same z-score pipeline as
    // anomaly_zscore) open 5-minute half-open windows; DuckDB's native
    // non-equi join is the oracle for the bucket-expansion equi-join.
    "range_join" -> withTrades("m1",
      """, az AS (
        |  SELECT product_id, window_start,
        |    (CAST(close AS DOUBLE) - mean_close) /
        |      NULLIF(round(sqrt(greatest(var_close, 0.0)), 8), 0.0) AS zscore
        |  FROM (
        |    SELECT product_id, window_start, close,
        |      CAST(close_sum AS DOUBLE) / CAST(n_candles AS DOUBLE) AS mean_close,
        |      CAST(CAST(n_candles AS DECIMAL(4,0)) * CAST(sq_sum AS DECIMAL(30,16))
        |        - CAST(close_sum AS DECIMAL(19,8)) * CAST(close_sum AS DECIMAL(18,8)) AS DOUBLE)
        |        / (CAST(n_candles AS DOUBLE) * CAST(n_candles AS DOUBLE)) AS var_close
        |    FROM (
        |      SELECT product_id, window_start, close,
        |        COUNT(*) OVER w AS n_candles,
        |        SUM(close) OVER w AS close_sum,
        |        SUM(CAST(CAST(close AS DECIMAL(19,8)) * close AS DECIMAL(38,16))) OVER w AS sq_sum
        |      FROM m1
        |      WINDOW w AS (PARTITION BY product_id
        |        ORDER BY CAST(epoch(window_start) AS BIGINT)
        |        RANGE BETWEEN 840 PRECEDING AND CURRENT ROW)))
        |), anom AS (
        |  SELECT product_id, window_start AS w_start,
        |    window_start + INTERVAL '5 minutes' AS w_end
        |  FROM az WHERE COALESCE(abs(zscore) > 1.0, FALSE)
        |)
        |SELECT a.product_id, a.w_start AS window_start,
        |  CAST(COUNT(*) AS BIGINT) AS n_trades,
        |  CAST(CAST(SUM(t.trade_value) AS DECIMAL(18,8)) AS DOUBLE) AS value_in_window,
        |  CAST(MIN(t.trade_id) AS BIGINT) AS first_trade_id
        |FROM anom a JOIN stg t
        |  ON t.product_id = a.product_id
        | AND t.trade_time >= a.w_start AND t.trade_time < a.w_end
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin),

    // TWAP: hold durations are exact integer microseconds (epoch_us
    // diffs), price*hold summed as exact decimals; ratio rounded at 8
    // like vwap. lead() is totally ordered by (trade_time, trade_id).
    "twap_1h" -> withTrades("stg",
      """, t AS (
        |  SELECT product_id, hour_bucket, trade_id, trade_time, price,
        |    epoch_us(COALESCE(
        |      lead(trade_time) OVER (PARTITION BY product_id, hour_bucket
        |        ORDER BY trade_time, trade_id),
        |      hour_bucket + INTERVAL '1 hour')) - epoch_us(trade_time) AS hold_us
        |  FROM stg)
        |SELECT product_id, hour_bucket AS window_start,
        |  CAST(COUNT(*) AS BIGINT) AS n_trades,
        |  CAST(SUM(hold_us) AS BIGINT) AS total_hold_us,
        |  CAST(CAST(round(
        |    CAST(SUM(CAST(price * CAST(hold_us AS DECIMAL(20,0)) AS DECIMAL(38,8))) AS DOUBLE)
        |      / NULLIF(CAST(SUM(hold_us) AS DOUBLE), 0.0), 8) AS DECIMAL(18,8)) AS DOUBLE) AS twap
        |FROM t GROUP BY 1, 2""".stripMargin),

    // Pearson r per product pair from exact decimal components (the
    // anomaly-detector cancellation trick), rounded at 8 decimals.
    "pair_correlation" -> withTrades("h1",
      """, pc AS (
        |  SELECT a.window_start, a.product_id AS product_a,
        |    b.product_id AS product_b, a.close AS x, b.close AS y
        |  FROM h1 a JOIN h1 b
        |    ON a.window_start = b.window_start AND a.product_id < b.product_id
        |), agg AS (
        |  SELECT product_a, product_b, COUNT(*) AS n_hours,
        |    SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(CAST(CAST(x AS DECIMAL(19,8)) * y AS DECIMAL(38,16))) AS sxy,
        |    SUM(CAST(CAST(x AS DECIMAL(19,8)) * x AS DECIMAL(38,16))) AS sxx,
        |    SUM(CAST(CAST(y AS DECIMAL(19,8)) * y AS DECIMAL(38,16))) AS syy
        |  FROM pc GROUP BY 1, 2)
        |SELECT product_a, product_b, CAST(n_hours AS BIGINT) AS n_hours,
        |  round(CAST(CAST(n_hours AS DECIMAL(6,0)) * CAST(sxy AS DECIMAL(30,16))
        |      - CAST(sx AS DECIMAL(19,8)) * CAST(sy AS DECIMAL(19,8)) AS DOUBLE)
        |    / NULLIF(sqrt(
        |        CAST(CAST(n_hours AS DECIMAL(6,0)) * CAST(sxx AS DECIMAL(30,16))
        |          - CAST(sx AS DECIMAL(19,8)) * CAST(sx AS DECIMAL(19,8)) AS DOUBLE) *
        |        CAST(CAST(n_hours AS DECIMAL(6,0)) * CAST(syy AS DECIMAL(30,16))
        |          - CAST(sy AS DECIMAL(19,8)) * CAST(sy AS DECIMAL(19,8)) AS DOUBLE)), 0.0), 8) AS corr
        |FROM agg""".stripMargin),

    "flow_imbalance" -> withTrades("stg",
      """SELECT product_id, minute_bucket AS window_start,
        |  CAST(bv AS DOUBLE) AS buy_volume, CAST(sv AS DOUBLE) AS sell_volume,
        |  n_buys, n_sells,
        |  (CAST(bv AS DOUBLE) - CAST(sv AS DOUBLE)) /
        |    (CAST(bv AS DOUBLE) + CAST(sv AS DOUBLE)) AS imbalance
        |FROM (
        |  SELECT product_id, minute_bucket,
        |    CAST(SUM(CASE WHEN side = 'buy' THEN size ELSE 0 END) AS DECIMAL(18,8)) AS bv,
        |    CAST(SUM(CASE WHEN side = 'sell' THEN size ELSE 0 END) AS DECIMAL(18,8)) AS sv,
        |    CAST(SUM(CASE WHEN side = 'buy' THEN 1 ELSE 0 END) AS BIGINT) AS n_buys,
        |    CAST(SUM(CASE WHEN side = 'sell' THEN 1 ELSE 0 END) AS BIGINT) AS n_sells
        |  FROM stg GROUP BY 1, 2)""".stripMargin),

    "daily_metrics" -> withTrades("dm",
      """SELECT product_id, date, CAST(open AS DOUBLE) AS open,
        |  CAST(high AS DOUBLE) AS high, CAST(low AS DOUBLE) AS low,
        |  CAST(close AS DOUBLE) AS close,
        |  CAST(total_volume AS DOUBLE) AS total_volume, total_trades,
        |  CAST(daily_return AS DOUBLE) AS daily_return,
        |  CAST(volatility AS DOUBLE) AS volatility,
        |  CAST(max_drawdown AS DOUBLE) AS max_drawdown, _partition_month
        |FROM dm""".stripMargin),

    "price_latest" -> withTrades("dm",
      s""", $priceLatestCtes
        |SELECT product_id, CAST(price AS DOUBLE) AS price, updated_at,
        |  CAST(change_1m_pct AS DOUBLE) AS change_1m_pct,
        |  CAST(change_1h_pct AS DOUBLE) AS change_1h_pct,
        |  CAST(change_24h_pct AS DOUBLE) AS change_24h_pct,
        |  CAST(high_24h AS DOUBLE) AS high_24h,
        |  CAST(low_24h AS DOUBLE) AS low_24h,
        |  CAST(volume_24h AS DOUBLE) AS volume_24h, as_of
        |FROM final""".stripMargin),

    // The market-dashboard rollup: price_latest's serving columns plus
    // a trailing-24h candle aggregation anchored at the same as_of —
    // window (as_of − 24h, as_of], min_by open on the unique
    // window_start, exact decimal volume sums.
    "market_dashboard" -> withTrades("dm",
      s""", $priceLatestCtes,
        |roll AS (
        |  SELECT product_id,
        |    min_by(open, window_start) AS open_24h,
        |    MAX(high) AS high_24h_trailing,
        |    MIN(low) AS low_24h_trailing,
        |    CAST(SUM(volume) AS DECIMAL(18,8)) AS volume_24h_trailing,
        |    CAST(SUM(trade_count) AS BIGINT) AS n_trades_24h,
        |    CAST(COUNT(*) AS BIGINT) AS n_candles_24h
        |  FROM h1, anchor WHERE window_start > as_of - INTERVAL '24 hours'
        |  GROUP BY 1)
        |SELECT f.product_id, CAST(f.price AS DOUBLE) AS price, f.updated_at,
        |  CAST(f.change_1h_pct AS DOUBLE) AS change_1h_pct,
        |  CAST(f.change_24h_pct AS DOUBLE) AS change_24h_pct,
        |  CAST(r.open_24h AS DOUBLE) AS open_24h,
        |  CAST(r.high_24h_trailing AS DOUBLE) AS high_24h_trailing,
        |  CAST(r.low_24h_trailing AS DOUBLE) AS low_24h_trailing,
        |  CAST(r.volume_24h_trailing AS DOUBLE) AS volume_24h_trailing,
        |  r.n_trades_24h, r.n_candles_24h, f.as_of
        |FROM final f LEFT JOIN roll r ON f.product_id = r.product_id""".stripMargin),

    // Health rollup over TWO identical full runs: per-stage row counts
    // Data skipping is answer-INVISIBLE by construction: the key reads
    // a snapshot of lineitem through the file-pruning path, the oracle
    // scans everything — identical rows is exactly the claim.
    "snapshot_skipping_read" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |  l_returnflag
        |FROM lineitem WHERE l_orderkey <= 500""".stripMargin,

    // TopN serving read: the Spark side goes through the connector's
    // pushed-TopN file pruning; event_id is unique, so the top-100 set
    // is deterministic and the row order washes out in the sorted
    // compare
    "topn_serving" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events ORDER BY event_id DESC LIMIT 100""".stripMargin,

    // the filtered dashboard shape: filter skipping + TopN pruning
    // compose on one scan (event_id unique → deterministic top set)
    "topn_serving_filtered" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events WHERE event_type = 'click'
        |ORDER BY event_id DESC LIMIT 100""".stripMargin,

    // initial-default column evolution: odd orders were written BEFORE
    // the column existed (they read the declared default), even orders
    // arrived after with real values — the oracle replays that split
    // with plain literals
    "default_column_read" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority,
        |  CAST(0.05 AS DOUBLE) AS discount_rate
        |FROM orders WHERE o_orderkey % 2 = 1
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority,
        |  CAST(0.1 AS DOUBLE) AS discount_rate
        |FROM orders WHERE o_orderkey % 2 = 0""".stripMargin,

    // the DSv2 connector read (write → pushed filter → file skipping)
    // == the plain full-scan filter: the connector only ever prunes
    // IO, every pushed filter stays a residual row filter
    "datasource_read" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |  l_returnflag
        |FROM lineitem WHERE l_orderkey <= 500""".stripMargin,

    // the runtime-filtered star join == the plain join (the injected
    // key-domain conjunct only refutes files/rows the join drops)
    "star_join_connector" ->
      """SELECT o_orderpriority,
        |  CAST(CAST(SUM(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderdate >= TIMESTAMP '1996-03-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderpriority = '1-URGENT'
        |GROUP BY 1""".stripMargin,

    // bloom-pruned point lookup == the full-scan filter (pruning is
    // IO-only; false positives die in the row filter)
    "snapshot_bloom_read" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |  l_returnflag
        |FROM lineitem WHERE l_orderkey IN (500, 700)""".stripMargin,

    // SCD2 history == consecutive-run collapse over the snapshot
    // chain: a version starts where the price IS DISTINCT FROM the
    // previous snapshot's (or at the key's first snapshot), valid_to =
    // the next version's valid_from, current = open-ended
    "scd2_history" ->
      """WITH tr AS (
        |  SELECT event_id AS trade_id, event_type AS product_id,
        |    value AS price, CAST(ts AS TIMESTAMP) AS trade_time
        |  FROM events WHERE event_id IS NOT NULL),
        |snap AS (
        |  SELECT c.idx, t.product_id, t.price, t.trade_time
        |  FROM (VALUES (1, TIMESTAMP '2024-01-10 00:00:00'),
        |               (2, TIMESTAMP '2024-01-20 00:00:00'),
        |               (3, TIMESTAMP '2024-01-30 00:00:00')) c(idx, cut)
        |  JOIN tr t ON t.trade_time <= c.cut
        |  QUALIFY row_number() OVER (PARTITION BY c.idx, t.product_id
        |    ORDER BY t.trade_time DESC, t.trade_id DESC) = 1),
        |runs AS (
        |  SELECT *,
        |    lag(price) OVER (PARTITION BY product_id ORDER BY idx)
        |      AS prev_price,
        |    min(idx) OVER (PARTITION BY product_id) AS first_idx
        |  FROM snap),
        |starts AS (
        |  SELECT product_id, price, trade_time, idx FROM runs
        |  WHERE idx = first_idx OR price IS DISTINCT FROM prev_price)
        |SELECT product_id, price, trade_time AS valid_from,
        |  lead(trade_time) OVER (PARTITION BY product_id ORDER BY idx)
        |    AS valid_to,
        |  lead(trade_time) OVER (PARTITION BY product_id ORDER BY idx)
        |    IS NULL AS is_current
        |FROM starts""".stripMargin,

    // BPE training replayed step for step: k chained stages of
    // pair-count -> deterministic argmax -> greedy leftmost merge pass
    // (the list_reduce over singleton lists mirrors Spark's aggregate
    // fold exactly — the accumulator starts as the first symbol, every
    // later symbol either merges into the tail or appends)
    "bpe_merges" ->
      s"WITH ${bpeCtes(8)}\n${bpeMergeSelect(8)}",

    // corpus encoding under the same learned merges: per-doc BPE token
    // counts from the final vocab state
    "bpe_tokenize" ->
      s"""WITH ${bpeCtes(8)}
         |SELECT tk.doc_id, CAST(SUM(len(v8.syms)) AS BIGINT) AS bpe_tokens
         |FROM tk JOIN v8 ON tk.word = v8.word
         |WHERE tk.word <> ''
         |GROUP BY tk.doc_id""".stripMargin,

    // unigram-LM tokenizer (SentencePiece family): the trained piece
    // table after 2 hard-EM rounds — exact-integer Viterbi objective,
    // so the DP replays bit-for-bit (see unigramCtes)
    "unigram_train" ->
      (s"WITH ${unigramCtes(4, 96, 2)}\n" +
        "SELECT piece, c AS n_piece FROM v2"),

    // corpus encoding under the trained pieces: per-doc token counts
    // from one more Viterbi pass (sg3) over the word inventory
    "unigram_tokenize" ->
      s"""WITH ${unigramCtes(4, 96, 2)}
         |SELECT tk.doc_id, CAST(SUM(len(sg3.pieces)) AS BIGINT) AS unigram_tokens
         |FROM tk JOIN sg3 ON tk.word = sg3.word
         |WHERE tk.word <> ''
         |GROUP BY tk.doc_id""".stripMargin,

    // fuzzy join: the q-gram-prefiltered pairs == the naive all-pairs
    // levenshtein join (completeness proof; both engines' levenshtein
    // is the classic unit-cost edit distance)
    "fuzzy_join" ->
      """WITH n AS (
        |  SELECT DISTINCT p_name FROM part WHERE p_name IS NOT NULL)
        |SELECT a.p_name AS a, b.p_name AS b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
        |FROM n a, n b
        |WHERE a.p_name < b.p_name
        |  AND levenshtein(a.p_name, b.p_name) <= 2""".stripMargin,

    // the stored-inventory twin: same naive all-pairs oracle — the
    // hash match proves the sidecar-planned path loses no pair
    "fuzzy_join_stored" ->
      """WITH n AS (
        |  SELECT DISTINCT p_name FROM part WHERE p_name IS NOT NULL)
        |SELECT a.p_name AS a, b.p_name AS b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
        |FROM n a, n b
        |WHERE a.p_name < b.p_name
        |  AND levenshtein(a.p_name, b.p_name) <= 2""".stripMargin,

    // incremental MV maintenance: the CDC-incremented view == a
    // from-scratch aggregate over the post-upsert post-delete table
    // (exact decimal sums make the increments associative)
    "mv_incremental" ->
      """WITH batch AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(o_totalprice * 2 AS DOUBLE) AS o_totalprice,
        |    o_orderpriority
        |  FROM orders WHERE o_custkey % 7 = 0),
        |merged AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(o_totalprice AS DOUBLE) AS o_totalprice, o_orderpriority
        |  FROM orders
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM batch)
        |  UNION ALL
        |  SELECT * FROM batch),
        |final AS (SELECT * FROM merged WHERE NOT o_custkey % 11 = 0)
        |SELECT o_orderpriority, COUNT(*) AS n_rows,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |    AS DECIMAL(28,4)) AS DOUBLE) AS total_sum
        |FROM final GROUP BY o_orderpriority""".stripMargin,

    // metadata-only count == the full-scan count after the same
    // merge-on-read delete
    "fast_count" ->
      """SELECT COUNT(*) AS n_rows FROM orders
        |WHERE NOT (o_totalprice > 400000.0)""".stripMargin,

    // multi-column hidden partitioning: the two-level
    // (day × bucket)-pruned read == the full-scan filter on the
    // source columns
    "multi_partition_read" ->
      """SELECT event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
        |FROM events
        |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-12 00:00:00'
        |  AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-14 00:00:00'
        |  AND event_type = 'click'""".stripMargin,

    // hidden partitioning: the days(ts)-pruned read == the full-scan
    // filter on the SOURCE column (the layout is answer-invisible)
    "hidden_partition_read" ->
      """SELECT event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
        |FROM events
        |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-05 00:00:00'
        |  AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-08 00:00:00'""".stripMargin,

    // the table after two stacked merge-on-read delete commits == the
    // source minus both delete predicates (delete-sidecar resolution
    // must be invisible to the answer)
    "mor_delete_read" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders
        |WHERE NOT (o_totalprice > 400000)
        |  AND NOT (o_orderstatus = 'F' AND o_custkey % 10 = 0)""".stripMargin,

    // the incremental scan after snapshot 0 == exactly the two
    // appended batches (orderkey % 3 != 1)
    "snapshot_incremental_read" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CAST(o_totalprice AS DOUBLE) AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 3 != 1""".stripMargin,

    // the version-offset streaming read (bootstrap + incremental
    // micro-batches into a file sink) delivers every row exactly once
    // == the plain full table
    "stream_table_read" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CAST(o_totalprice AS DOUBLE) AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders""".stripMargin,

    // a spec-evolved table (3/4 written under the old layout, 1/4
    // under the new) reads as the plain union of its slices — the
    // directory-layout era of a row must be answer-invisible
    "spec_evolution_read" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CAST(o_totalprice AS DOUBLE) AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders""".stripMargin,

    // the table after one MoR upsert commit == plain MERGE semantics:
    // the batch's rows plus every base row whose key the batch does
    // not carry (equality-delete resolution must be answer-invisible)
    "upsert_mor" ->
      """WITH batch AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |    CAST(o_totalprice * 2 AS DOUBLE) AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders WHERE o_custkey % 7 = 0)
        |SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CAST(o_totalprice AS DOUBLE) AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders
        |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM batch)
        |UNION ALL
        |SELECT * FROM batch""".stripMargin,

    // SQL MERGE + UPDATE replayed as plain set logic: batch-wins-else-
    // base for the merge, then the conditional price bump. All price
    // arithmetic in DOUBLE (*3, +1) — bit-identical on both engines.
    "sql_merge_update" ->
      """WITH batch AS (
        |  SELECT o_orderkey, o_custkey, 'M' AS o_orderstatus,
        |    o_totalprice * 3 AS o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_custkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 30000000, o_custkey, 'N', o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders WHERE o_custkey % 11 = 0),
        |merged AS (
        |  SELECT * FROM batch
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM batch))
        |SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderstatus = 'M' THEN o_totalprice + 1
        |       ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM merged""".stripMargin,

    // Conditional MERGE (Debezium routing) as set logic: d-ops drop,
    // u-ops take only the price/status assignment (the shifted source
    // o_orderdate must NOT appear — partial SET), c-ops insert under
    // shifted keys. Price arithmetic in DOUBLE, bit-identical.
    "sql_merge_conditional" ->
      """WITH upd AS (
        |  SELECT o_orderkey, o_totalprice * 3 AS newprice
        |  FROM orders WHERE o_custkey % 5 = 0 AND o_custkey % 13 <> 0),
        |dels AS (
        |  SELECT o_orderkey FROM orders WHERE o_custkey % 13 = 0),
        |ins AS (
        |  SELECT o_orderkey + 30000000 AS o_orderkey, o_custkey,
        |    'N' AS o_orderstatus, o_totalprice, o_orderdate,
        |    o_orderpriority
        |  FROM orders WHERE o_custkey % 11 = 0)
        |SELECT o.o_orderkey, o.o_custkey,
        |  CASE WHEN u.o_orderkey IS NOT NULL THEN 'M'
        |       ELSE o.o_orderstatus END AS o_orderstatus,
        |  CASE WHEN u.o_orderkey IS NOT NULL THEN u.newprice
        |       ELSE o.o_totalprice END AS o_totalprice,
        |  o.o_orderdate, o.o_orderpriority
        |FROM orders o
        |LEFT JOIN upd u ON o.o_orderkey = u.o_orderkey
        |WHERE o.o_orderkey NOT IN (SELECT o_orderkey FROM dels)
        |UNION ALL
        |SELECT * FROM ins""".stripMargin,

    // recomputed independently from the CTE chain (the quality_report
    // stage is excluded — its row count is the check-suite size, gated
    // by data_quality).
    "pipeline_health" -> withTrades("dm",
      s""", $priceLatestCtes,
        |counts(stage, per_run) AS (VALUES
        |  ('bronze', (SELECT COUNT(*) FROM bronze_dup)),
        |  ('silver', (SELECT COUNT(*) FROM silver)),
        |  ('ohlcv_1m', (SELECT COUNT(*) FROM m1)),
        |  ('ohlcv_1h', (SELECT COUNT(*) FROM h1)),
        |  ('daily_metrics', (SELECT COUNT(*) FROM dm)),
        |  ('price_latest', (SELECT COUNT(*) FROM final)))
        |SELECT stage, CAST(2 AS BIGINT) AS n_runs,
        |  CAST(2 * per_run AS BIGINT) AS total_rows,
        |  CAST(per_run AS BIGINT) AS last_rows,
        |  CAST(0 AS BIGINT) AS total_retries
        |FROM counts ORDER BY stage""".stripMargin),

    "data_quality" -> qualityReport,

    // Final DOUBLE casts on the DECIMAL aggregates below mirror the
    // Spark side's Rounding.asDoubles boundary so both engines hand the
    // comparator float64 (the driver's DuckDB reader happens to
    // materialize result decimals as float64 anyway; the explicit cast
    // makes the contract hold for any reader, incl. tools/selfcheck.py).
    "streaming_bronze" ->
      """SELECT make_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 300) AS BIGINT) * 300 * 1000000) AS window_start,
        |  make_timestamp((CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 300) AS BIGINT) * 300 + 300) * 1000000) AS window_end,
        |  event_type AS product_id, COUNT(*) AS n_trades,
        |  CAST(CAST(SUM(CAST(CAST(json_extract_string(props, '$.k') AS DOUBLE) AS DECIMAL(18,8))) AS DECIMAL(18,8)) AS DOUBLE) AS volume
        |FROM events WHERE event_id IS NOT NULL GROUP BY 1, 2, 3""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(SUM(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS sum_disc_price,
        |  CAST(CAST(SUM(CAST((l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)) * (CAST(1.0 AS DOUBLE) + l_tax) AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS sum_charge,
        |  CAST(CAST(round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS DECIMAL(18,6)) AS DOUBLE) AS avg_qty,
        |  CAST(CAST(round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS DECIMAL(18,6)) AS DOUBLE) AS avg_price,
        |  CAST(CAST(round(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS DECIMAL(18,6)) AS DOUBLE) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-08-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
        |  CAST(CAST(SUM(CAST(l.l_extendedprice * (CAST(1.0 AS DOUBLE) - l.l_discount) AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1996-06-30 00:00:00'
        |  AND l.l_shipdate > TIMESTAMP '1996-06-30 00:00:00'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, o.o_orderkey
        |LIMIT 10""".stripMargin,

    "q5_region_revenue" ->
      """SELECT n.n_name,
        |  CAST(CAST(SUM(CAST(l.l_extendedprice * (CAST(1.0 AS DOUBLE) - l.l_discount) AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey AND s.s_nationkey = c.c_nationkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY 1""".stripMargin,

    "top_orders_window" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3""".stripMargin,

    // Q17 shape: per-part average as a window over the filtered fact
    // (single scan); exact decimal sums under both ratios.
    "q17_small_orders" ->
      """WITH f AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#4'),
        |w AS (
        |  SELECT l.l_extendedprice, l.l_quantity,
        |    CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) OVER (PARTITION BY l.l_partkey) AS DOUBLE)
        |      / CAST(COUNT(*) OVER (PARTITION BY l.l_partkey) AS DOUBLE) AS avg_qty
        |  FROM lineitem l JOIN f ON l.l_partkey = f.p_partkey)
        |SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) FILTER (WHERE l_quantity < 0.2 * avg_qty) AS DOUBLE) / 7.0 AS avg_yearly,
        |  CAST(COUNT(*) FILTER (WHERE l_quantity < 0.2 * avg_qty) AS BIGINT) AS n_small_orders
        |FROM w""".stripMargin,

    // Q4 shape: EXISTS (returned line) decorrelated to a semi-join.
    "q4_order_priority" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_returnflag = 'R')
        |GROUP BY 1""".stripMargin,

    // Q19 shape: OR of brand/size/quantity conjunctions over the join.
    "q19_disjunctive_revenue" ->
      """SELECT
        |  CAST(CAST(SUM(CAST(l.l_extendedprice * (CAST(1.0 AS DOUBLE) - l.l_discount) AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
        |       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
        |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
        |       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
        |   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
        |       AND l.l_quantity >= 20 AND l.l_quantity <= 30)""".stripMargin,

    // Q21 shape: correlated EXISTS + NOT-EXISTS-with-inequality — the
    // oracle keeps the textbook correlated form; the Spark plan
    // decorrelates both into per-order supplier-set cardinalities over
    // one window (see Analytics.q21WaitingSupplier).
    "q21_waiting_supplier" ->
      """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM supplier, lineitem l1, orders, nation
        |WHERE s_suppkey = l1.l_suppkey
        |  AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |  AND s_nationkey = n_nationkey
        |  AND n_name = 'NATION_3'
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,

    // Q22 shape: scalar avg subquery + correlated NOT EXISTS — the
    // oracle keeps both correlated; Spark broadcasts the 1-row average
    // and anti-joins the order keys.
    "q22_global_sales_opp" ->
      """SELECT n_name AS cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
        |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS totacctbal
        |FROM customer, nation
        |WHERE c_nationkey = n_nationkey
        |  AND c_acctbal > (
        |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
        |    FROM customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    // Q16 shape: NOT IN subquery — the oracle keeps NOT IN; Spark
    // decorrelates to a broadcast left-anti join (s_suppkey non-null,
    // so the three-valued NOT IN collapses to anti-join semantics).
    "q16_supplier_parts" ->
      """SELECT p_brand, p_type, p_size,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey
        |  AND p_brand <> 'Brand#4'
        |  AND p_type NOT LIKE 'MEDIUM%'
        |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    // Q13 shape: filtered LEFT OUTER join grouped twice — the oracle
    // keeps the textbook outer-join-then-histogram; Spark pre-aggregates
    // the fact before the outer join.
    "q13_customer_distribution" ->
      """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    // Q6 shape: pure filter + 1-row aggregate (the pushdown benchmark).
    "q6_forecast_revenue" ->
      """SELECT
        |  CAST(CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    // Q10 shape: returned-item revenue per customer, top 20 tie-broken
    // on the unique customer key.
    "q10_returned_items" ->
      """SELECT c.c_custkey, c.c_name,
        |  CAST(CAST(SUM(CAST(l.l_extendedprice * (CAST(1.0 AS DOUBLE) - l.l_discount) AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS revenue,
        |  c.c_acctbal, n.n_name
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE l.l_returnflag = 'R'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |GROUP BY 1, 2, 4, 5
        |ORDER BY revenue DESC, c.c_custkey
        |LIMIT 20""".stripMargin,

    // Q14 shape: promo revenue share in one conditional aggregate.
    "q14_promo_revenue" ->
      """SELECT
        |  round(CAST(100.0 AS DOUBLE) *
        |    CAST(SUM(CASE WHEN p.p_type = 'PROMO'
        |      THEN CAST(l.l_extendedprice * (CAST(1.0 AS DOUBLE) - l.l_discount) AS DECIMAL(18,6))
        |      ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) /
        |    CAST(SUM(CAST(l.l_extendedprice * (CAST(1.0 AS DOUBLE) - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6) AS promo_revenue_pct,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        |  AND l.l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin,

    // Q15 shape: per-supplier quarter revenue, argmax via scalar-max
    // comparison (exact decimal equality; ties ordered by supplier key).
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
        |FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
        |WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
        |ORDER BY s.s_suppkey""".stripMargin,

    // Q18 shape: heavy-order filter from ONE lineitem aggregation;
    // top-100 fully tie-broken (o_totalprice DESC, unique o_orderkey).
    "q18_large_orders" ->
      """WITH heavy AS (
        |  SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS total_qty
        |  FROM lineitem GROUP BY 1)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(total_qty AS DOUBLE) AS total_qty
        |FROM orders
        |JOIN heavy ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE total_qty > 250
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    // Q7 shape: bilateral nation-pair shipping volume by ship year.
    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
        |  CAST(CAST(SUM(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM supplier, lineitem, orders, customer, nation n1, nation n2
        |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        |  AND c_custkey = o_custkey
        |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        |  AND n1.n_name IN ('NATION_3', 'NATION_8', 'NATION_12')
        |  AND n2.n_name IN ('NATION_3', 'NATION_8', 'NATION_12')
        |  AND n1.n_name <> n2.n_name
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,

    // Q8 shape: one nation's market share of a region's PROMO spend by
    // order year — exact decimal sums under the double ratio.
    "q8_market_share" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
        |  round(
        |    CAST(SUM(CASE WHEN n2.n_name = 'NATION_2'
        |      THEN CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(18,6))
        |      ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) /
        |    CAST(SUM(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6) AS mkt_share,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
        |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |  AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        |  AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
        |  AND p_type = 'PROMO'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    // Q2 shape: correlated scalar-MIN subquery — the oracle keeps the
    // textbook correlated form; Spark computes the per-part minimum as
    // a window over the partkey partitioning (one scan, one shuffle).
    // The correlation ranges over ALL lines of the part, which equals
    // the window over the part-filtered join: the size filter restricts
    // WHICH parts, never which lines within a part.
    "q2_min_cost_supplier" ->
      """WITH pf AS (SELECT p_partkey, p_name FROM part WHERE p_size = 15),
        |ml AS (
        |  SELECT DISTINCT l.l_partkey, l.l_suppkey, l.l_extendedprice AS price
        |  FROM lineitem l JOIN pf ON l.l_partkey = pf.p_partkey
        |  WHERE l.l_extendedprice = (
        |    SELECT MIN(l2.l_extendedprice) FROM lineitem l2
        |    WHERE l2.l_partkey = l.l_partkey))
        |SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
        |  CAST(ml.price AS DOUBLE) AS price
        |FROM ml
        |JOIN supplier s ON ml.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN pf p ON ml.l_partkey = p.p_partkey
        |ORDER BY s.s_acctbal DESC, s.s_name, p.p_partkey
        |LIMIT 100""".stripMargin,

    // Q9 shape: per (supplier nation, order year) profit; retail price
    // stands in for ps_supplycost (no partsupp in this schema).
    "q9_product_profit" ->
      """SELECT n_name AS nation,
        |  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
        |  CAST(CAST(SUM(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) - p_retailprice * l_quantity AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS profit,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem, part, supplier, nation, orders
        |WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
        |  AND s_nationkey = n_nationkey AND l_orderkey = o_orderkey
        |  AND p_name LIKE '%red%'
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    // Q12 shape: urgent/non-urgent line counts per line status —
    // integer conditional sums, no FP anywhere.
    "q12_priority_shipping" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    // Q20 shape: nested IN with an aggregate HAVING subquery — the
    // oracle keeps the textbook nested form; Spark decorrelates to a
    // rollup + LEFT SEMI join.
    "q20_potential_promo" ->
      """SELECT s_suppkey, s_name, s_acctbal, n_name
        |FROM supplier, nation
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem, part
        |  WHERE l_partkey = p_partkey AND p_name LIKE 'red%'
        |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY l_suppkey
        |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 200.0)
        |  AND s_nationkey = n_nationkey
        |ORDER BY s_name""".stripMargin,

    // Q11 shape: scalar aggregate subquery in HAVING — the oracle keeps
    // the textbook second-scan total; Spark re-aggregates the rollup
    // (exact decimal sums are associative, so the two are identical).
    // The threshold is 2.0 × the average part value (= 2/‖parts‖ of the
    // total — TPC-H's fraction/SF rule data-derived, so the cut stays
    // sf-invariant); ×2.0 is an exact exponent bump, division is one
    // correctly-rounded IEEE op — bit-identical cross-engine.
    "q11_important_parts" ->
      """SELECT l_partkey,
        |  CAST(CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS part_value
        |FROM lineitem, supplier, nation
        |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |  AND n_name = 'NATION_3'
        |GROUP BY 1
        |HAVING CAST(CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) > 2.0 * (
        |  (SELECT CAST(CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE)
        |   FROM lineitem, supplier, nation
        |   WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |     AND n_name = 'NATION_3')
        |  /
        |  (SELECT CAST(COUNT(DISTINCT l_partkey) AS DOUBLE)
        |   FROM lineitem, supplier, nation
        |   WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |     AND n_name = 'NATION_3'))
        |ORDER BY part_value DESC, l_partkey""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_docs
        |FROM documents GROUP BY 1""".stripMargin,

    // Mirrors Dedup.ngramJaccard's DEFAULT capped path exactly: shingles
    // with doc-frequency > DefaultMaxDocFreq are excluded from candidate
    // generation, then Jaccard is recomputed over the FULL shingle sets —
    // same recall bound on both sides (pairs sharing only above-cap
    // shingles are found by neither).
    "dedup_ngram_jaccard" ->
      s"""WITH $ngramPairsCtes
         |SELECT doc_a, doc_b, jaccard FROM pairs""".stripMargin,

    // Connected components over the near-dup pairs via transitive
    // closure (cluster sizes are small, so the closure is tiny);
    // mirrors Dedup.clusters' min-label fixpoint: every doc labeled
    // with its component's minimum doc_id.
    "dedup_clusters" -> dedupClustersSql,
    // the two-star algorithm computes the SAME labeling (component
    // minimum), so its oracle is the same transitive closure
    "dedup_clusters_twostar" -> dedupClustersSql,

    "dedup_cluster_stats" ->
      s"""WITH RECURSIVE $ngramPairsCtes,
         |edges AS (
         |  SELECT doc_a AS v, doc_b AS u FROM pairs
         |  UNION
         |  SELECT doc_b AS v, doc_a AS u FROM pairs),
         |verts AS (SELECT DISTINCT v FROM edges),
         |reach(v, u) AS (
         |  SELECT v, v FROM verts
         |  UNION
         |  SELECT r.v, e.u FROM reach r JOIN edges e ON r.u = e.v),
         |comp AS (SELECT v AS doc_id, MIN(u) AS cluster_id FROM reach GROUP BY v),
         |sizes AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size FROM comp GROUP BY 1)
         |SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
         |  CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
         |FROM sizes GROUP BY 1""".stripMargin,

    "dedup_minhash" ->
      s"""WITH $shinglesCte,
         |sids AS (
         |  SELECT doc_id, [CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) % ${Hashing.P} FOR s IN shingles] AS sids
         |  FROM shl WHERE len(shingles) > 0),
         |mh AS (
         |  SELECT doc_id,
         |    [list_min([(${Hashing.permsADuck}[k+1] * x + ${Hashing.permsBDuck}[k+1]) % ${Hashing.P} FOR x IN sids]) FOR k IN range(0, ${Hashing.NumPerms})] AS mh
         |  FROM sids),
         |bands AS (
         |  SELECT doc_id, b AS band, array_to_string(mh[b*4+1 : b*4+4], ',') AS sig
         |  FROM mh, UNNEST(range(0, ${Hashing.BandsMinhash})) AS t(b)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)
         |$jaccardVerify""".stripMargin,

    "dedup_simhash" ->
      s"""WITH wt AS (
         |  SELECT doc_id, list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS words FROM documents
         |), hsx AS (
         |  SELECT doc_id, [CAST(concat('0x', substr(md5(wd), 1, 15)) AS BIGINT) FOR wd IN words] AS hs
         |  FROM wt WHERE len(words) > 0
         |), fps AS (
         |  SELECT doc_id, CAST(list_sum(
         |    [CASE WHEN list_sum([CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END FOR h IN hs]) > 0
         |          THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END FOR b IN range(0, ${Hashing.SimhashBits})]) AS BIGINT) AS fp
         |  FROM hsx
         |), bandsx AS (
         |  SELECT doc_id, fp, k AS band, (fp >> (k * ${Hashing.SimhashBandBits})) & ${(1L << Hashing.SimhashBandBits) - 1} AS bval
         |  FROM fps, UNNEST(range(0, ${Hashing.SimhashBands})) AS t(k)
         |), candx AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.fp AS fp_a, b.fp AS fp_b
         |  FROM bandsx a JOIN bandsx b ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, hamming FROM (
         |  SELECT doc_a, doc_b, CAST(bit_count(xor(fp_a, fp_b)) AS INT) AS hamming FROM candx
         |) WHERE hamming <= ${Hashing.SimhashMaxHamming}""".stripMargin,

    "dedup_embedding" ->
      s"""WITH $nrmCte,
         |$sigBndCtes,
         |cnd AS (
         |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         |  FROM bnd a JOIN bnd b ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id)
         |SELECT vec_a, vec_b, cosine FROM (
         |  SELECT vec_a, vec_b,
         |    ${duckDot("na.embedding", "nb.embedding")} / (na.nrm * nb.nrm) AS cosine
         |  FROM cnd JOIN nrm na ON cnd.vec_a = na.vec_id JOIN nrm nb ON cnd.vec_b = nb.vec_id
         |) WHERE cosine >= CAST(0.4 AS DOUBLE)""".stripMargin,

    // Connected components over the embedding near-dup graph — the
    // same recursive-CTE transitive closure as dedup_clusters, edges
    // from the LSH-banded cosine pairs.
    "embedding_dup_clusters" ->
      s"""WITH RECURSIVE $nrmCte,
         |$sigBndCtes,
         |cnd AS (
         |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         |  FROM bnd a JOIN bnd b ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id),
         |epairs AS (
         |  SELECT vec_a, vec_b FROM (
         |    SELECT vec_a, vec_b,
         |      ${duckDot("na.embedding", "nb.embedding")} / (na.nrm * nb.nrm) AS cosine
         |    FROM cnd JOIN nrm na ON cnd.vec_a = na.vec_id JOIN nrm nb ON cnd.vec_b = nb.vec_id
         |  ) WHERE cosine >= CAST(0.4 AS DOUBLE)),
         |edges AS (
         |  SELECT vec_a AS v, vec_b AS u FROM epairs
         |  UNION
         |  SELECT vec_b AS v, vec_a AS u FROM epairs),
         |verts AS (SELECT DISTINCT v FROM edges),
         |reach(v, u) AS (
         |  SELECT v, v FROM verts
         |  UNION
         |  SELECT r.v, e.u FROM reach r JOIN edges e ON r.u = e.v)
         |SELECT v AS vec_id, MIN(u) AS cluster_id, v = MIN(u) AS is_canonical
         |FROM reach GROUP BY v""".stripMargin,

    "ann_topk" ->
      s"""WITH $nrmCte,
         |q AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn FROM nrm WHERE vec_id < 10)
         |SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
         |  SELECT q.query_id, c.vec_id AS neighbor_id,
         |    ${duckDot("q.qe", "c.embedding")} / (q.qn * c.nrm) AS cosine,
         |    row_number() OVER (PARTITION BY q.query_id ORDER BY
         |      ${duckDot("q.qe", "c.embedding")} / (q.qn * c.nrm) DESC, c.vec_id) AS rank
         |  FROM q, nrm c WHERE c.vec_id <> q.query_id)
         |WHERE rank <= 10""".stripMargin,

    // int8 scalar-quantized ANN: per-vector scale max|x|/127, codes
    // round(x/scale), ranking by the EXACT integer code dot over the
    // integer code norms — all integer arithmetic plus
    // correctly-rounded sqrt/divide, so the approximation itself is
    // bit-identical across engines. Round semantics match (both
    // half-away-from-zero on doubles); the float max is exact under
    // any fold order.
    "ann_topk_quantized" ->
      s"""WITH sq AS (
         |  SELECT vec_id,
         |    CAST(list_max([abs(x) FOR x IN embedding]) AS DOUBLE) / 127.0 AS scale,
         |    embedding
         |  FROM embeddings),
         |qz AS (
         |  SELECT vec_id,
         |    [CASE WHEN scale = 0 THEN 0
         |          ELSE CAST(round(CAST(x AS DOUBLE) / scale) AS INT) END
         |     FOR x IN embedding] AS codes
         |  FROM sq),
         |qn AS (
         |  SELECT vec_id, codes,
         |    sqrt(CAST(list_reduce(list_concat([CAST(0 AS BIGINT)],
         |      [CAST(c AS BIGINT) * c FOR c IN codes]), (a, b) -> a + b)
         |      AS DOUBLE)) AS qnrm
         |  FROM qz)
         |SELECT query_id, neighbor_id, qcosine, CAST(rank AS INT) AS rank FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    CAST(list_reduce(list_concat([CAST(0 AS BIGINT)],
         |      [CAST(q.codes[i] AS BIGINT) * c.codes[i] FOR i IN range(1, ${graft.functions.Hashing.EmbDim + 1})]),
         |      (x, y) -> x + y) AS DOUBLE) / nullif(q.qnrm * c.qnrm, 0.0) AS qcosine,
         |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |      CAST(list_reduce(list_concat([CAST(0 AS BIGINT)],
         |        [CAST(q.codes[i] AS BIGINT) * c.codes[i] FOR i IN range(1, ${graft.functions.Hashing.EmbDim + 1})]),
         |        (x, y) -> x + y) AS DOUBLE) / nullif(q.qnrm * c.qnrm, 0.0) DESC,
         |      c.vec_id) AS rank
         |  FROM qn q, qn c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id)
         |WHERE rank <= 10""".stripMargin,

    // product-quantization ANN: codes = per-subspace argmin of the
    // exact ordered squared-distance fold (code tie-break); ADC score
    // = the M LUT terms folded in subspace order — every double on
    // both engines comes from the identical fold, so the approximate
    // ranking hash-matches
    "ann_topk_pq" -> {
      val sq = (a: String, b: String) =>
        s"""list_reduce(list_concat([CAST(0 AS DOUBLE)],
           |  [(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) *
           |   (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))
           |   FOR i IN range(1, 9)]), (x, y) -> x + y)""".stripMargin
      val dot = (a: String, b: String) =>
        s"""list_reduce(list_concat([CAST(0 AS DOUBLE)],
           |  [CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)
           |   FOR i IN range(1, 9)]), (x, y) -> x + y)""".stripMargin
      s"""WITH ms AS (SELECT unnest(range(0, 8)) AS m),
         |cb AS (
         |  SELECT ms.m, CAST(e.vec_id AS INT) AS code,
         |    e.embedding[ms.m*8+1 : ms.m*8+8] AS cw
         |  FROM embeddings e, ms WHERE e.vec_id < 16),
         |sv AS (
         |  SELECT e.vec_id, ms.m, e.embedding[ms.m*8+1 : ms.m*8+8] AS sv
         |  FROM embeddings e, ms),
         |codes AS (
         |  SELECT vec_id, m, code FROM (
         |    SELECT s.vec_id, s.m, c.code,
         |      row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
         |        ${sq("s.sv", "c.cw")}, c.code) AS rn
         |    FROM sv s JOIN cb c ON s.m = c.m) WHERE rn = 1),
         |lut AS (
         |  SELECT s.vec_id AS query_id, s.m, c.code,
         |    ${dot("s.sv", "c.cw")} AS term
         |  FROM sv s JOIN cb c ON s.m = c.m WHERE s.vec_id < 10),
         |scored AS (
         |  SELECT l.query_id, co.vec_id AS neighbor_id,
         |    list_reduce(list_concat([CAST(0 AS DOUBLE)],
         |      list(l.term ORDER BY l.m)), (a, b) -> a + b) AS pq_score
         |  FROM codes co JOIN lut l ON co.m = l.m AND co.code = l.code
         |  WHERE co.vec_id <> l.query_id
         |  GROUP BY l.query_id, co.vec_id)
         |SELECT query_id, neighbor_id, pq_score, CAST(rank AS INT) AS rank
         |FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY pq_score DESC, neighbor_id) AS rank FROM scored)
         |WHERE rank <= 10""".stripMargin
    },

    "ann_topk_bucketed" ->
      s"""WITH $nrmCte,
         |$sigBndCtes,
         |cand AS (
         |  SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
         |  FROM bnd qb JOIN bnd cb ON qb.band = cb.band AND qb.bval = cb.bval
         |  WHERE qb.vec_id < 10 AND cb.vec_id <> qb.vec_id)
         |SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
         |  SELECT cand.query_id, cand.neighbor_id,
         |    ${duckDot("nq.embedding", "nc.embedding")} / (nq.nrm * nc.nrm) AS cosine,
         |    row_number() OVER (PARTITION BY cand.query_id ORDER BY
         |      ${duckDot("nq.embedding", "nc.embedding")} / (nq.nrm * nc.nrm) DESC, cand.neighbor_id) AS rank
         |  FROM cand JOIN nrm nq ON cand.query_id = nq.vec_id JOIN nrm nc ON cand.neighbor_id = nc.vec_id)
         |WHERE rank <= 10""".stripMargin,

    // IVF ANN: deterministic coarse quantizer (nlist lowest-id vectors),
    // nearest-centroid inverted lists, nprobe probed lists per query,
    // exact rank within them. Operand orders in every dot/norm product
    // mirror the Spark side exactly.
    "ivf_topk" ->
      s"""WITH $nrmCte,
         |cent AS (SELECT vec_id AS centroid_id, embedding AS ce, nrm AS cn FROM nrm WHERE vec_id < 16),
         |asg AS (
         |  SELECT v.vec_id, c.centroid_id
         |  FROM nrm v, cent c
         |  QUALIFY row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |    ${duckDot("v.embedding", "c.ce")} / (v.nrm * c.cn) DESC, c.centroid_id) = 1),
         |q AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn FROM nrm WHERE vec_id < 10),
         |probes AS (
         |  SELECT q.query_id, c.centroid_id
         |  FROM q, cent c
         |  QUALIFY row_number() OVER (PARTITION BY q.query_id ORDER BY
         |    ${duckDot("q.qe", "c.ce")} / (q.qn * c.cn) DESC, c.centroid_id) <= 4),
         |cand AS (
         |  SELECT p.query_id, a.vec_id AS neighbor_id
         |  FROM probes p JOIN asg a ON p.centroid_id = a.centroid_id
         |  WHERE a.vec_id <> p.query_id)
         |SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
         |  SELECT cand.query_id, cand.neighbor_id,
         |    ${duckDot("nv.embedding", "nq.embedding")} / (nv.nrm * nq.nrm) AS cosine,
         |    row_number() OVER (PARTITION BY cand.query_id ORDER BY
         |      ${duckDot("nv.embedding", "nq.embedding")} / (nv.nrm * nq.nrm) DESC, cand.neighbor_id) AS rank
         |  FROM cand JOIN nrm nv ON cand.neighbor_id = nv.vec_id JOIN nrm nq ON cand.query_id = nq.vec_id)
         |WHERE rank <= 10""".stripMargin,

    // IVF-PQ: the ivf_topk coarse chain (cent/asg/probes → candidate
    // pairs) composed with ann_topk_pq's ADC chain (cb/sv/codes/lut →
    // subspace-ordered fold), scoring ONLY candidates in probed lists.
    // Every operand order mirrors the Spark side exactly.
    "ivfpq_topk" -> {
      val sq = (a: String, b: String) =>
        s"""list_reduce(list_concat([CAST(0 AS DOUBLE)],
           |  [(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) *
           |   (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))
           |   FOR i IN range(1, 9)]), (x, y) -> x + y)""".stripMargin
      val dot = (a: String, b: String) =>
        s"""list_reduce(list_concat([CAST(0 AS DOUBLE)],
           |  [CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)
           |   FOR i IN range(1, 9)]), (x, y) -> x + y)""".stripMargin
      s"""WITH $nrmCte,
         |cent AS (SELECT vec_id AS centroid_id, embedding AS ce, nrm AS cn FROM nrm WHERE vec_id < 16),
         |asg AS (
         |  SELECT v.vec_id, c.centroid_id
         |  FROM nrm v, cent c
         |  QUALIFY row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |    ${duckDot("v.embedding", "c.ce")} / (v.nrm * c.cn) DESC, c.centroid_id) = 1),
         |q AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn FROM nrm WHERE vec_id < 10),
         |probes AS (
         |  SELECT q.query_id, c.centroid_id
         |  FROM q, cent c
         |  QUALIFY row_number() OVER (PARTITION BY q.query_id ORDER BY
         |    ${duckDot("q.qe", "c.ce")} / (q.qn * c.cn) DESC, c.centroid_id) <= 4),
         |cand AS (
         |  SELECT p.query_id, a.vec_id AS neighbor_id
         |  FROM probes p JOIN asg a ON p.centroid_id = a.centroid_id
         |  WHERE a.vec_id <> p.query_id),
         |ms AS (SELECT unnest(range(0, 8)) AS m),
         |cb AS (
         |  SELECT ms.m, CAST(e.vec_id AS INT) AS code,
         |    e.embedding[ms.m*8+1 : ms.m*8+8] AS cw
         |  FROM embeddings e, ms WHERE e.vec_id < 16),
         |sv AS (
         |  SELECT e.vec_id, ms.m, e.embedding[ms.m*8+1 : ms.m*8+8] AS sv
         |  FROM embeddings e, ms),
         |codes AS (
         |  SELECT vec_id, m, code FROM (
         |    SELECT s.vec_id, s.m, c.code,
         |      row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
         |        ${sq("s.sv", "c.cw")}, c.code) AS rn
         |    FROM sv s JOIN cb c ON s.m = c.m) WHERE rn = 1),
         |lut AS (
         |  SELECT s.vec_id AS query_id, s.m, c.code,
         |    ${dot("s.sv", "c.cw")} AS term
         |  FROM sv s JOIN cb c ON s.m = c.m WHERE s.vec_id < 10),
         |scored AS (
         |  SELECT l.query_id, co.vec_id AS neighbor_id,
         |    list_reduce(list_concat([CAST(0 AS DOUBLE)],
         |      list(l.term ORDER BY l.m)), (a, b) -> a + b) AS pq_score
         |  FROM codes co
         |  JOIN cand cd ON cd.neighbor_id = co.vec_id
         |  JOIN lut l ON co.m = l.m AND co.code = l.code
         |    AND l.query_id = cd.query_id
         |  GROUP BY l.query_id, co.vec_id)
         |SELECT query_id, neighbor_id, pq_score, CAST(rank AS INT) AS rank
         |FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY pq_score DESC, neighbor_id) AS rank FROM scored)
         |WHERE rank <= 10""".stripMargin
    },

    // Recall@k of the IVF probe path against the exact brute-force
    // top-k — the index-quality metric as a first-class gate key.
    // exact mirrors ann_topk, the probe chain mirrors ivf_topk
    // verbatim; recall = hits/k is an exact integer-ratio double on
    // both engines.
    "ann_recall" ->
      s"""WITH $nrmCte,
         |q AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn FROM nrm WHERE vec_id < 10),
         |exact AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.query_id, c.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.query_id ORDER BY
         |        ${duckDot("q.qe", "c.embedding")} / (q.qn * c.nrm) DESC, c.vec_id) AS rank
         |    FROM q, nrm c WHERE c.vec_id <> q.query_id)
         |  WHERE rank <= 10),
         |cent AS (SELECT vec_id AS centroid_id, embedding AS ce, nrm AS cn FROM nrm WHERE vec_id < 16),
         |asg AS (
         |  SELECT v.vec_id, c.centroid_id
         |  FROM nrm v, cent c
         |  QUALIFY row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |    ${duckDot("v.embedding", "c.ce")} / (v.nrm * c.cn) DESC, c.centroid_id) = 1),
         |probes AS (
         |  SELECT q.query_id, c.centroid_id
         |  FROM q, cent c
         |  QUALIFY row_number() OVER (PARTITION BY q.query_id ORDER BY
         |    ${duckDot("q.qe", "c.ce")} / (q.qn * c.cn) DESC, c.centroid_id) <= 4),
         |cand AS (
         |  SELECT p.query_id, a.vec_id AS neighbor_id
         |  FROM probes p JOIN asg a ON p.centroid_id = a.centroid_id
         |  WHERE a.vec_id <> p.query_id),
         |approx AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT cand.query_id, cand.neighbor_id,
         |      row_number() OVER (PARTITION BY cand.query_id ORDER BY
         |        ${duckDot("nv.embedding", "nq.embedding")} / (nv.nrm * nq.nrm) DESC, cand.neighbor_id) AS rank
         |    FROM cand JOIN nrm nv ON cand.neighbor_id = nv.vec_id JOIN nrm nq ON cand.query_id = nq.vec_id)
         |  WHERE rank <= 10)
         |SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS k,
         |  CAST(COUNT(a.neighbor_id) AS BIGINT) AS hits,
         |  CAST(COUNT(a.neighbor_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
         |FROM exact e LEFT JOIN approx a
         |  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
         |GROUP BY e.query_id""".stripMargin,

    // IVF over a TRAINED quantizer: one deterministic Lloyd iteration
    // from the lowest-id seeds. The per-cluster mean folds members in
    // strict ascending vec_id order (list(... ORDER BY vec_id) +
    // list_reduce here; sort_array(collect_list) + aggregate on the
    // Spark side), so the IEEE double sums are bit-identical — a
    // partial-sum mean would be partition-order-dependent and could
    // hash-diverge on near-tie assignments. Means are narrowed to FLOAT
    // on both engines (same round-to-nearest), norms recomputed from
    // the narrowed arrays, then the probe path is ivf_topk verbatim.
    "ivf_topk_trained" ->
      s"""WITH $nrmCte,
         |$trainedAsgCtes,
         |q AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn FROM nrm WHERE vec_id < 10),
         |probes AS (
         |  SELECT q.query_id, c.centroid_id
         |  FROM q, cent c
         |  QUALIFY row_number() OVER (PARTITION BY q.query_id ORDER BY
         |    ${duckDot("q.qe", "c.ce")} / (q.qn * c.cn) DESC, c.centroid_id) <= 4),
         |cand AS (
         |  SELECT p.query_id, a.vec_id AS neighbor_id
         |  FROM probes p JOIN asg a ON p.centroid_id = a.centroid_id
         |  WHERE a.vec_id <> p.query_id)
         |SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
         |  SELECT cand.query_id, cand.neighbor_id,
         |    ${duckDot("nv.embedding", "nq.embedding")} / (nv.nrm * nq.nrm) AS cosine,
         |    row_number() OVER (PARTITION BY cand.query_id ORDER BY
         |      ${duckDot("nv.embedding", "nq.embedding")} / (nv.nrm * nq.nrm) DESC, cand.neighbor_id) AS rank
         |  FROM cand JOIN nrm nv ON cand.neighbor_id = nv.vec_id JOIN nrm nq ON cand.query_id = nq.vec_id)
         |WHERE rank <= 10""".stripMargin,

    // SemDeDup: same trained clustering as ivf_topk_trained, then
    // within-cluster cosine pairs — a vector is dropped iff a lower-id
    // cluster-mate sits above the threshold.
    "semantic_dedup" ->
      s"""WITH $nrmCte,
         |$trainedAsgCtes,
         |dup AS (
         |  SELECT DISTINCT b.vec_id AS vec_b
         |  FROM asg a JOIN asg b
         |    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
         |  JOIN nrm na ON a.vec_id = na.vec_id
         |  JOIN nrm nb ON b.vec_id = nb.vec_id
         |  WHERE ${duckDot("na.embedding", "nb.embedding")} / (na.nrm * nb.nrm) >= CAST(0.4 AS DOUBLE))
         |SELECT asg.vec_id, asg.centroid_id AS cluster_id,
         |  asg.vec_id NOT IN (SELECT vec_b FROM dup) AS keep
         |FROM asg""".stripMargin,

    "lang_id" ->
      s"""WITH $langIdCtes
         |SELECT doc_id, pred_lang, score FROM lid""".stripMargin,

    // α=0.5 temperature mixture: weight ∝ sqrt(source tokens), the
    // normalizer folded in source order (ordered-fold determinism);
    // token estimate matches corpus_stats' ceil(n_chars/4)
    "mixture_plan" ->
      """WITH per AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(CAST(ceil(CAST(n_chars AS DOUBLE) / 4.0) AS BIGINT)) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |tot AS (
        |  SELECT list_reduce(
        |    list_prepend(CAST(0 AS DOUBLE),
        |      list(sqrt(CAST(n_tokens AS DOUBLE)) ORDER BY source)),
        |    (a, b) -> a + b) AS z
        |  FROM per)
        |SELECT source, n_docs, n_tokens,
        |  sqrt(CAST(n_tokens AS DOUBLE)) / z AS weight,
        |  CAST(floor(1000000.0 * (sqrt(CAST(n_tokens AS DOUBLE)) / z)) AS BIGINT) AS target_tokens,
        |  1000000.0 * (sqrt(CAST(n_tokens AS DOUBLE)) / z) / CAST(n_tokens AS DOUBLE) AS epochs
        |FROM per, tot""".stripMargin,

    // PII redaction over the deterministically-augmented corpus: the
    // SAME RE2-compatible patterns as PiiRedact, applied in the same
    // sequence (email → IP → id) with counts on the intermediate
    // strings — replacement order is part of the contract.
    "pii_redact" ->
      s"""WITH aug AS (
         |  SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)
         |    || '@example.com from 10.1.' || CAST(doc_id % 256 AS VARCHAR)
         |    || '.7 card ' || CAST(doc_id + 4000000000000000 AS VARCHAR) AS text
         |  FROM documents),
         |r1 AS (SELECT doc_id, text,
         |  regexp_replace(text, '${PiiRedact.EmailRe}', '${PiiRedact.EmailToken}', 'g') AS t1 FROM aug),
         |r2 AS (SELECT doc_id, text, t1,
         |  regexp_replace(t1, '${PiiRedact.Ipv4Re}', '${PiiRedact.IpToken}', 'g') AS t2 FROM r1)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '${PiiRedact.EmailRe}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(t1, '${PiiRedact.Ipv4Re}')) AS BIGINT) AS n_ips,
         |  CAST(len(regexp_extract_all(t2, '${PiiRedact.IdRe}')) AS BIGINT) AS n_ids,
         |  regexp_replace(t2, '${PiiRedact.IdRe}', '${PiiRedact.IdToken}', 'g') AS redacted
         |FROM r2""".stripMargin,

    // Per-language corpus rollup: same token/quality expressions as
    // token_count / text_quality, joined to the lang_id prediction and
    // reduced per language. Exact long sums; rates as double/COUNT.
    "corpus_stats" ->
      s"""WITH $langIdCtes,
         |per AS (
         |  SELECT doc_id, n_chars,
         |    CAST(len(w) AS BIGINT) AS ws_tokens,
         |    CAST(ceil(CAST(n_chars AS DOUBLE) / 4.0) AS BIGINT) AS est_bpe_tokens,
         |    (len(w) >= 5 AND len(w) <= 100000
         |     AND CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE) >= 0.1
         |     AND CAST(CAST(list_sum(list_concat([0], [length(x) FOR x IN w])) AS BIGINT) AS DOUBLE) / CAST(len(w) AS DOUBLE) >= 2.0
         |     AND CAST(CAST(list_sum(list_concat([0], [length(x) FOR x IN w])) AS BIGINT) AS DOUBLE) / CAST(len(w) AS DOUBLE) <= 20.0) AS quality_pass
         |  FROM (SELECT doc_id, n_chars, string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents))
         |SELECT lid.pred_lang, COUNT(*) AS n_docs,
         |  CAST(SUM(per.ws_tokens) AS BIGINT) AS total_ws_tokens,
         |  CAST(SUM(per.est_bpe_tokens) AS BIGINT) AS total_est_bpe_tokens,
         |  CAST(SUM(CASE WHEN per.quality_pass THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS quality_pass_rate,
         |  CAST(SUM(per.n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
         |FROM lid JOIN per ON lid.doc_id = per.doc_id
         |GROUP BY 1""".stripMargin,

    // Decontamination: corpus docs sharing any word-3-gram with the
    // eval shard; per-doc shingle sets are distinct, so the inner join
    // row count IS the distinct shared-shingle count.
    "decontaminate" ->
      s"""WITH $shinglesCte,
         |inv AS (
         |  SELECT s.doc_id, d.source, UNNEST(s.shingles) AS sh
         |  FROM shl s JOIN documents d ON s.doc_id = d.doc_id),
         |ev AS (SELECT DISTINCT sh FROM inv WHERE source = 'src0')
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_shingles
         |FROM inv JOIN ev USING (sh)
         |WHERE source <> 'src0' GROUP BY doc_id""".stripMargin,

    // End-of-pipeline curation verdict: every filter signal joined per
    // doc, keep = quality AND repetition AND canonical AND clean. The
    // component expressions are verbatim from text_quality /
    // repetition_quality / dedup_exact / decontaminate (all
    // independently hash-green), so the composite cannot drift.
    "curation_report" ->
      s"""WITH $shinglesCte,
         |q AS (
         |  SELECT doc_id,
         |    (CAST(len(w) AS BIGINT) >= 5 AND CAST(len(w) AS BIGINT) <= 100000
         |     AND CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE) >= 0.1
         |     AND CAST(CAST(list_sum(list_concat([0], [length(x) FOR x IN w])) AS BIGINT) AS DOUBLE) / CAST(len(w) AS DOUBLE) >= 2.0
         |     AND CAST(CAST(list_sum(list_concat([0], [length(x) FOR x IN w])) AS BIGINT) AS DOUBLE) / CAST(len(w) AS DOUBLE) <= 20.0) AS quality_pass
         |  FROM dt),
         |cnt AS (
         |  SELECT doc_id, t, COUNT(*) AS c
         |  FROM (SELECT doc_id, UNNEST(w) AS t FROM dt) GROUP BY 1, 2),
         |rep AS (
         |  SELECT m.doc_id,
         |    (CAST(top.top_word_count AS DOUBLE) / CAST(m.n_words AS DOUBLE) <= 0.10
         |     AND (CASE WHEN m.n_bigrams = 0 THEN CAST(0.0 AS DOUBLE)
         |       ELSE CAST(m.n_bigrams - m.n_distinct_bigrams AS DOUBLE) / CAST(m.n_bigrams AS DOUBLE)
         |       END) <= 0.10) AS repetition_pass
         |  FROM (
         |    SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
         |      CAST(len(w) - 1 AS BIGINT) AS n_bigrams,
         |      CAST(len(list_distinct([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))])) AS BIGINT) AS n_distinct_bigrams
         |    FROM dt) m
         |  JOIN (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_word_count FROM cnt GROUP BY 1) top
         |    ON m.doc_id = top.doc_id),
         |keepers AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         |inv AS (
         |  SELECT s.doc_id, d.source, UNNEST(s.shingles) AS sh
         |  FROM shl s JOIN documents d ON s.doc_id = d.doc_id),
         |ev AS (SELECT DISTINCT sh FROM inv WHERE source = 'src0'),
         |cont AS (
         |  SELECT DISTINCT doc_id FROM inv JOIN ev USING (sh) WHERE source <> 'src0')
         |SELECT d.doc_id, q.quality_pass, rep.repetition_pass,
         |  (k.doc_id IS NOT NULL) AS is_canonical,
         |  (c.doc_id IS NOT NULL) AS contaminated,
         |  (q.quality_pass AND rep.repetition_pass AND k.doc_id IS NOT NULL
         |   AND c.doc_id IS NULL) AS keep
         |FROM documents d
         |JOIN q ON d.doc_id = q.doc_id
         |JOIN rep ON d.doc_id = rep.doc_id
         |LEFT JOIN keepers k ON d.doc_id = k.doc_id
         |LEFT JOIN cont c ON d.doc_id = c.doc_id""".stripMargin,

    // Sequential packing into 512-token contexts per source shard:
    // pack = floor(preceding-token cumsum / context); doc_id is unique
    // inside a shard so the ROWS cumsum is a total order on both
    // engines.
    // training export plan == the same permutation in SQL: md5 digest
    // orders, a 6-hex-digit prefix mods into shards, the cumulative
    // whitespace-token fill packs — every step exact integer/string
    // arithmetic both engines share
    "training_shards" ->
      """WITH t AS (
        |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS ws_tokens
        |  FROM documents
        |), s AS (
        |  SELECT *,
        |    CAST(CAST(concat('0x', substr(shuffle_key, 1, 6)) AS BIGINT) % 8 AS BIGINT) AS shard
        |  FROM t
        |), c AS (
        |  SELECT *, SUM(ws_tokens) OVER (PARTITION BY shard
        |    ORDER BY shuffle_key, doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM s)
        |SELECT doc_id, shard, shuffle_key, ws_tokens,
        |  CAST((cum - ws_tokens) // 2048 AS BIGINT) AS pack_id
        |FROM c""".stripMargin,

    // deterministic mixture sampling == the same epochs rates (the
    // mixture_plan CTE) fanned out by ceil(epochs) copies, the
    // fractional epoch kept by the identical 13-hex-digit unit hash
    // (2^52 denominator: exact doubles both engines)
    "mixture_sample" ->
      """WITH per AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(CAST(ceil(CAST(n_chars AS DOUBLE) / 4.0) AS BIGINT)) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |tot AS (
        |  SELECT list_reduce(
        |    list_prepend(CAST(0 AS DOUBLE),
        |      list(sqrt(CAST(n_tokens AS DOUBLE)) ORDER BY source)),
        |    (a, b) -> a + b) AS z
        |  FROM per),
        |r AS (
        |  SELECT source,
        |    1000000.0 * (sqrt(CAST(n_tokens AS DOUBLE)) / z) / CAST(n_tokens AS DOUBLE) AS epochs
        |  FROM per, tot),
        |eps AS (
        |  SELECT CAST(unnest(range(64)) AS BIGINT) AS epoch),
        |e AS (
        |  SELECT d.doc_id, d.source, r.epochs, eps.epoch
        |  FROM documents d JOIN r USING (source)
        |  JOIN eps ON CAST(eps.epoch AS DOUBLE) < ceil(r.epochs))
        |SELECT doc_id, source, epoch
        |FROM e
        |WHERE CAST(epoch AS DOUBLE) < floor(epochs)
        |   OR CAST(CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), '::', CAST(epoch AS VARCHAR))), 1, 13)) AS BIGINT) AS DOUBLE) / 4503599627370496.0
        |      < epochs - floor(epochs)""".stripMargin,

    "sequence_packing" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS ws_tokens
        |  FROM documents
        |), c AS (
        |  SELECT source, doc_id, ws_tokens,
        |    SUM(ws_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |SELECT source, CAST((cum - ws_tokens) // 512 AS BIGINT) AS pack_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(ws_tokens) AS BIGINT) AS pack_tokens
        |FROM c GROUP BY 1, 2""".stripMargin,

    // Sliding-window chunking: 32-token windows every 24 tokens, last
    // window clamped to the doc end; chunk count in integer arithmetic
    // ((n-32+23) // 24 + 1) so no float ceil drifts between engines.
    "doc_chunks" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n,
        |    CASE WHEN len(w) <= 32 THEN CAST(1 AS BIGINT)
        |         ELSE (CAST(len(w) AS BIGINT) - 32 + 23) // 24 + 1 END AS nc
        |  FROM t
        |), e AS (
        |  SELECT doc_id, w, n,
        |    UNNEST(generate_series(0, nc - 1)) AS i
        |  FROM c)
        |SELECT doc_id,
        |  CAST(i AS BIGINT) AS chunk_idx,
        |  array_to_string(w[CAST(i * 24 + 1 AS INT) : CAST(i * 24 + 32 AS INT)], ' ') AS chunk_text,
        |  CAST(LEAST(32, n - i * 24) AS BIGINT) AS n_tokens
        |FROM e""".stripMargin,

    // Exact substring dedup (Lee et al. 2022 ExactSubstr): every
    // 20-token window at stride 1 md5-hashed; occurrences that are not
    // their hash group's earliest (doc_id*1e7+pos order) are duplicated
    // windows, island-merged per doc into maximal [start, end) token
    // spans (same-span iff next window starts within `window` of the
    // previous — overlap or adjacency).
    "dedup_substring" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents
        |), f AS (
        |  SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n
        |  FROM t WHERE len(w) >= 20
        |), e AS (
        |  SELECT doc_id, w,
        |    UNNEST(generate_series(0, n - 20)) AS i
        |  FROM f
        |), h AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS i,
        |    md5(array_to_string(w[CAST(i + 1 AS INT) : CAST(i + 20 AS INT)], ' ')) AS wh
        |  FROM e
        |), d AS (
        |  SELECT doc_id, i FROM (
        |    SELECT doc_id, i,
        |      COUNT(*) OVER (PARTITION BY wh) AS cnt,
        |      MIN(doc_id * 10000000 + i) OVER (PARTITION BY wh) AS canon_key
        |    FROM h)
        |  WHERE cnt > 1 AND doc_id * 10000000 + i <> canon_key
        |), s AS (
        |  SELECT doc_id, i,
        |    CASE WHEN lag(i) OVER (PARTITION BY doc_id ORDER BY i) IS NULL
        |      OR i > lag(i) OVER (PARTITION BY doc_id ORDER BY i) + 20
        |      THEN 1 ELSE 0 END AS ns
        |  FROM d
        |), c AS (
        |  SELECT doc_id, i,
        |    SUM(ns) OVER (PARTITION BY doc_id ORDER BY i
        |      ROWS UNBOUNDED PRECEDING) AS span_id
        |  FROM s)
        |SELECT doc_id,
        |  CAST(MIN(i) AS BIGINT) AS span_start,
        |  CAST(MAX(i) + 20 AS BIGINT) AS span_end,
        |  CAST(COUNT(*) AS BIGINT) AS n_windows
        |FROM c GROUP BY doc_id, span_id""".stripMargin,

    // The cut half of ExactSubstr: the dedup_substring spans applied —
    // tokens whose position falls inside a span drop, the text rebuilds
    // from the survivors in order (both engines rebuild EVERY doc from
    // its tokens, so whitespace normalization is identical).
    "substring_clean" ->
      """WITH t0 AS (
        |  SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents
        |), f AS (
        |  SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n
        |  FROM t0 WHERE len(w) >= 20
        |), e AS (
        |  SELECT doc_id, w,
        |    UNNEST(generate_series(0, n - 20)) AS i
        |  FROM f
        |), h AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS i,
        |    md5(array_to_string(w[CAST(i + 1 AS INT) : CAST(i + 20 AS INT)], ' ')) AS wh
        |  FROM e
        |), d AS (
        |  SELECT doc_id, i FROM (
        |    SELECT doc_id, i,
        |      COUNT(*) OVER (PARTITION BY wh) AS cnt,
        |      MIN(doc_id * 10000000 + i) OVER (PARTITION BY wh) AS canon_key
        |    FROM h)
        |  WHERE cnt > 1 AND doc_id * 10000000 + i <> canon_key
        |), s AS (
        |  SELECT doc_id, i,
        |    CASE WHEN lag(i) OVER (PARTITION BY doc_id ORDER BY i) IS NULL
        |      OR i > lag(i) OVER (PARTITION BY doc_id ORDER BY i) + 20
        |      THEN 1 ELSE 0 END AS ns
        |  FROM d
        |), c AS (
        |  SELECT doc_id, i,
        |    SUM(ns) OVER (PARTITION BY doc_id ORDER BY i
        |      ROWS UNBOUNDED PRECEDING) AS span_id
        |  FROM s
        |), spans AS (
        |  SELECT doc_id, MIN(i) AS span_start, MAX(i) + 20 AS span_end
        |  FROM c GROUP BY doc_id, span_id
        |), toks AS (
        |  SELECT doc_id,
        |    UNNEST(string_split_regex(trim(text), '\s+')) AS tok,
        |    UNNEST(generate_series(0,
        |      len(string_split_regex(trim(text), '\s+')) - 1)) AS i
        |  FROM documents
        |), kept AS (
        |  SELECT tk.doc_id, tk.tok, tk.i
        |  FROM toks tk
        |  WHERE NOT EXISTS (SELECT 1 FROM spans sp
        |    WHERE sp.doc_id = tk.doc_id
        |      AND tk.i >= sp.span_start AND tk.i < sp.span_end)
        |), agg AS (
        |  SELECT doc_id,
        |    string_agg(tok, ' ' ORDER BY i) AS clean_text,
        |    CAST(COUNT(*) AS BIGINT) AS n_kept
        |  FROM kept GROUP BY doc_id
        |), nt AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_all
        |  FROM documents)
        |SELECT nt.doc_id,
        |  COALESCE(agg.clean_text, '') AS clean_text,
        |  nt.n_all - COALESCE(agg.n_kept, 0) AS n_removed
        |FROM nt LEFT JOIN agg USING (doc_id)""".stripMargin,

    // Chunk-level repeated-passage spans: the doc_chunks CTE hashed per
    // window; every occurrence that is not its hash group's earliest
    // (in doc_id*IdSpace+chunk_idx order) is a removal span pointing at
    // the canonical occurrence. Pure integer span arithmetic.
    "chunk_dedup" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n,
        |    CASE WHEN len(w) <= 32 THEN CAST(1 AS BIGINT)
        |         ELSE (CAST(len(w) AS BIGINT) - 32 + 23) // 24 + 1 END AS nc
        |  FROM t
        |), e AS (
        |  SELECT doc_id, w, n,
        |    UNNEST(generate_series(0, nc - 1)) AS i
        |  FROM c
        |), ch AS (
        |  SELECT doc_id,
        |    CAST(i AS BIGINT) AS chunk_idx,
        |    md5(array_to_string(w[CAST(i * 24 + 1 AS INT) : CAST(i * 24 + 32 AS INT)], ' ')) AS chunk_hash,
        |    CAST(LEAST(32, n - i * 24) AS BIGINT) AS n_tokens
        |  FROM e
        |), g AS (
        |  SELECT chunk_hash,
        |    MIN(doc_id * 10000000 + chunk_idx) AS canon_key,
        |    CAST(COUNT(*) AS BIGINT) AS n_occurrences
        |  FROM ch GROUP BY 1)
        |SELECT ch.doc_id, ch.chunk_idx,
        |  CAST(ch.chunk_idx * 24 AS BIGINT) AS span_start,
        |  CAST(ch.chunk_idx * 24 + ch.n_tokens AS BIGINT) AS span_end,
        |  CAST(g.canon_key // 10000000 AS BIGINT) AS canonical_doc,
        |  CAST(g.canon_key % 10000000 AS BIGINT) AS canonical_chunk,
        |  g.n_occurrences
        |FROM ch JOIN g USING (chunk_hash)
        |WHERE ch.doc_id * 10000000 + ch.chunk_idx <> g.canon_key""".stripMargin,

    // Discrete per-language token-count quantiles: rank index in pure
    // integer arithmetic (ceil(p*n) = (p_num*n + p_den-1) // p_den), no
    // FP interpolation — values are exact BIGINTs on both engines.
    "token_percentiles" ->
      """WITH t AS (
        |  SELECT lang, doc_id,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS ws_tokens
        |  FROM documents
        |), r AS (
        |  SELECT lang, ws_tokens,
        |    row_number() OVER (PARTITION BY lang ORDER BY ws_tokens, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY lang) AS n
        |  FROM t)
        |SELECT lang, CAST(MAX(n) AS BIGINT) AS n_docs,
        |  MIN(CASE WHEN rn = (1 * n + 1) // 2 THEN ws_tokens END) AS p50_tokens,
        |  MIN(CASE WHEN rn = (9 * n + 9) // 10 THEN ws_tokens END) AS p90_tokens,
        |  MIN(CASE WHEN rn = (99 * n + 99) // 100 THEN ws_tokens END) AS p99_tokens
        |FROM r GROUP BY lang""".stripMargin,

    "text_quality" ->
      """SELECT doc_id, n_words, n_distinct_words, avg_word_len, distinct_ratio, punct_count,
        |  (n_words >= 5 AND n_words <= 100000 AND distinct_ratio >= 0.1
        |   AND avg_word_len >= 2.0 AND avg_word_len <= 20.0) AS quality_pass
        |FROM (
        |  SELECT doc_id,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct_words,
        |    CAST(CAST(list_sum(list_concat([0], [length(x) FOR x IN w])) AS BIGINT) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS avg_word_len,
        |    CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS distinct_ratio,
        |    CAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS BIGINT) AS punct_count
        |  FROM (SELECT doc_id, text, string_split_regex(trim(lower(text)), '\s+') AS w FROM documents))""".stripMargin,

    // Repetition filters: exact integer counts on both engines (Spark:
    // sorted-run fold + zip_with bigrams, shuffle-free; here: unnest +
    // GROUP BY and a list comprehension), fractions are IEEE divisions
    // of those integers.
    "repetition_quality" ->
      """WITH dt AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM documents
        |), m AS (
        |  SELECT doc_id,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(len(w) - 1 AS BIGINT) AS n_bigrams,
        |    CAST(len(list_distinct([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))])) AS BIGINT) AS n_distinct_bigrams
        |  FROM dt
        |), cnt AS (
        |  SELECT doc_id, t, COUNT(*) AS c
        |  FROM (SELECT doc_id, UNNEST(w) AS t FROM dt) GROUP BY 1, 2
        |), top AS (
        |  SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_word_count FROM cnt GROUP BY 1
        |), f AS (
        |  SELECT m.doc_id, m.n_words, top.top_word_count,
        |    CAST(top.top_word_count AS DOUBLE) / CAST(m.n_words AS DOUBLE) AS top_word_frac,
        |    m.n_bigrams, m.n_distinct_bigrams,
        |    CASE WHEN m.n_bigrams = 0 THEN CAST(0.0 AS DOUBLE)
        |      ELSE CAST(m.n_bigrams - m.n_distinct_bigrams AS DOUBLE) / CAST(m.n_bigrams AS DOUBLE)
        |    END AS dup_bigram_frac
        |  FROM m JOIN top ON m.doc_id = top.doc_id)
        |SELECT doc_id, n_words, top_word_count, top_word_frac,
        |  n_bigrams, n_distinct_bigrams, dup_bigram_frac,
        |  (top_word_frac <= 0.10 AND dup_bigram_frac <= 0.10) AS repetition_pass
        |FROM f""".stripMargin,

    // Top-k bigram pairs with conditional probability; tie-break is
    // (count DESC, token_a, token_b) so LIMIT is deterministic.
    "bigram_lm" ->
      """WITH dt AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM documents
        |), bg AS (
        |  SELECT pair, CAST(COUNT(*) AS BIGINT) AS pair_count,
        |    split_part(pair, ' ', 1) AS token_a,
        |    split_part(pair, ' ', 2) AS token_b
        |  FROM (SELECT UNNEST([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS pair FROM dt)
        |  GROUP BY 1
        |), uni AS (
        |  SELECT t AS token_a, CAST(COUNT(*) AS BIGINT) AS unigram_count
        |  FROM (SELECT UNNEST(w) AS t FROM dt) GROUP BY 1)
        |SELECT bg.token_a, bg.token_b, bg.pair_count, uni.unigram_count,
        |  CAST(bg.pair_count AS DOUBLE) / CAST(uni.unigram_count AS DOUBLE) AS cond_p
        |FROM bg JOIN uni ON bg.token_a = uni.token_a
        |ORDER BY bg.pair_count DESC, bg.token_a, bg.token_b LIMIT 100""".stripMargin,

    // Per-doc LM quality score: add-one-smoothed transition
    // probabilities from the src1-shard bigram LM, averaged per doc by
    // an ORDERED fold (list(p ORDER BY pos) + list_reduce ==
    // sort_array(collect_list) + aggregate on the Spark side) so the
    // IEEE sum is bit-identical; all p values are exact integer ratios
    // through one correctly-rounded division — no libm (ln/exp) terms.
    "bigram_doc_score" ->
      """WITH toksc AS (
        |  SELECT doc_id, source, string_split_regex(trim(lower(text)), '\s+') AS w FROM documents
        |), docbg0 AS (
        |  SELECT doc_id, UNNEST(list_transform(range(1, len(w)),
        |    i -> {'pos': i, 'a': w[i], 'pair': w[i] || ' ' || w[i + 1]})) AS s
        |  FROM toksc WHERE len(w) >= 2
        |), docbg AS (
        |  SELECT doc_id, s.pos AS pos, s.a AS a, s.pair AS pair FROM docbg0
        |), lmbg AS (
        |  SELECT pair, CAST(COUNT(*) AS BIGINT) AS pair_count
        |  FROM (SELECT UNNEST([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS pair
        |        FROM toksc WHERE source = 'src1')
        |  GROUP BY 1
        |), lmuni AS (
        |  SELECT t AS a, CAST(COUNT(*) AS BIGINT) AS uni_count
        |  FROM (SELECT UNNEST(w) AS t FROM toksc WHERE source = 'src1') GROUP BY 1
        |), vsz AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM lmuni),
        |scored AS (
        |  SELECT d.doc_id, d.pos,
        |    CAST(COALESCE(b.pair_count, 0) + 1 AS DOUBLE) /
        |      CAST(COALESCE(u.uni_count, 0) + vsz.v AS DOUBLE) AS p,
        |    CASE WHEN b.pair_count IS NULL THEN 1 ELSE 0 END AS unseen
        |  FROM docbg d LEFT JOIN lmbg b ON d.pair = b.pair
        |  LEFT JOIN lmuni u ON d.a = u.a CROSS JOIN vsz)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(unseen) AS BIGINT) AS n_unseen,
        |  round(list_reduce(list_prepend(CAST(0 AS DOUBLE), list(p ORDER BY pos)),
        |    (x, y) -> x + y) / CAST(COUNT(*) AS DOUBLE), 8) AS avg_p
        |FROM scored GROUP BY doc_id""".stripMargin,

    "token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS regex_tokens,
        |  CAST(ceil(CAST(n_chars AS DOUBLE) / 4.0) AS BIGINT) AS est_bpe_tokens
        |FROM documents""".stripMargin,

    "doc_fingerprint" ->
      s"""SELECT doc_id, md5(text) AS md5_hash, n_chars,
         |  CAST(list_sum(list_concat([CAST(0 AS BIGINT)],
         |    [CAST(ascii(text[i]) AS BIGINT) * ${Hashing.pow31Duck}[i] FOR i IN range(1, least(64, length(text)) + 1)])) % ${Hashing.FpP} AS BIGINT) AS prefix_hash
         |FROM documents""".stripMargin,

    // Top-k vocabulary by total occurrences; k includes full tie-break
    // (count desc, token asc) so LIMIT is deterministic on both engines.
    "vocab_topk" ->
      """WITH tk AS (
        |  SELECT doc_id, UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS token
        |  FROM documents)
        |SELECT token, COUNT(*) AS total_occurrences, COUNT(DISTINCT doc_id) AS doc_freq
        |FROM tk GROUP BY token
        |ORDER BY total_occurrences DESC, token LIMIT 100""".stripMargin,

    // Mirrors TextAnalysis.clean step for step: count URL/email matches
    // on the raw text, redact URLs then emails, tokenize the redacted
    // text, list-filter the stoplist (duplicates preserved). All
    // patterns are RE2-safe; DuckDB regexp_replace needs the 'g' flag
    // to match Spark's replace-all semantics.
    "text_clean" -> {
      val stopList = graft.operators.TextAnalysis.CleanStoplist
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH red AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_extract_all(text, 'https?://[^\\s]+')) AS BIGINT) AS n_urls,
         |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
         |    regexp_replace(regexp_replace(text, 'https?://[^\\s]+', '<URL>', 'g'),
         |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS redacted
         |  FROM documents
         |), tok AS (
         |  SELECT doc_id, n_urls, n_emails,
         |    string_split_regex(trim(lower(redacted)), '\\s+') AS w
         |  FROM red
         |), kept AS (
         |  SELECT doc_id, n_urls, n_emails, w,
         |    list_filter(w, t -> NOT list_contains($stopList, t)) AS kept
         |  FROM tok)
         |SELECT doc_id, array_to_string(kept, ' ') AS clean_text, n_urls, n_emails,
         |  CAST(len(w) - len(kept) AS BIGINT) AS n_stopwords_removed,
         |  CAST(len(kept) AS BIGINT) AS n_tokens_kept
         |FROM kept""".stripMargin
    },

    // Deterministic hash-stratified sampling: identical 60-bit md5
    // bucket on both engines, rates folded to a CASE expression.
    // stable hash split: md5-bucket mod 100 (engines bit-identical),
    // CASE thresholds mirror datasetSplit's defaults
    "dataset_split" ->
      s"""SELECT doc_id, lang, source, bucket,
         |  CASE WHEN bucket < 90 THEN 'train'
         |       WHEN bucket < 95 THEN 'validation'
         |       ELSE 'test' END AS split
         |FROM (
         |  SELECT doc_id, lang, source,
         |    ${Hashing.sid60Duck("CAST(doc_id AS VARCHAR)")} % 100 AS bucket
         |  FROM documents)""".stripMargin,

    "stratified_sample" -> {
      val rateCase = graft.operators.TextAnalysis.SampleRates
        .map { case (l, r) => s"WHEN lang = '$l' THEN $r" }
        .mkString("CASE ", " ", " ELSE 0.0 END")
      s"""SELECT doc_id, lang, source, bucket, sample_rate FROM (
         |  SELECT doc_id, lang, source,
         |    ${Hashing.sid60Duck("CAST(doc_id AS VARCHAR)")} % 1000 AS bucket,
         |    CAST($rateCase AS DOUBLE) AS sample_rate
         |  FROM documents)
         |WHERE bucket < sample_rate * 1000""".stripMargin
    },

    // Ordered funnel: cumulative per-user minima with the DEFAULT RANGE
    // window frame (peers included) so same-timestamp tie order cannot
    // change the result; strict < between steps on both engines.
    "event_funnel" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events
        |), s1 AS (
        |  SELECT user_id, ts, event_type,
        |    MIN(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id ORDER BY ts) AS cum_view
        |  FROM e
        |), s2 AS (
        |  SELECT user_id, ts, event_type, cum_view,
        |    MIN(CASE WHEN event_type = 'click' AND cum_view < ts THEN ts END)
        |      OVER (PARTITION BY user_id ORDER BY ts) AS cum_click
        |  FROM s1
        |), u AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t1,
        |    MIN(CASE WHEN event_type = 'click' AND cum_view < ts THEN ts END) AS t2,
        |    MIN(CASE WHEN event_type = 'purchase' AND cum_click < ts THEN ts END) AS t3
        |  FROM s2 GROUP BY user_id
        |), a AS (
        |  SELECT CAST(COUNT(t1) AS BIGINT) AS nv, CAST(COUNT(t2) AS BIGINT) AS nc,
        |         CAST(COUNT(t3) AS BIGINT) AS np FROM u)
        |SELECT '1_view' AS step, nv AS n_users, CAST(1.0 AS DOUBLE) AS conv_from_prev,
        |       CAST(1.0 AS DOUBLE) AS conv_from_first FROM a
        |UNION ALL
        |SELECT '2_click_after_view', nc,
        |       CAST(nc AS DOUBLE) / NULLIF(CAST(nv AS DOUBLE), 0.0),
        |       CAST(nc AS DOUBLE) / NULLIF(CAST(nv AS DOUBLE), 0.0) FROM a
        |UNION ALL
        |SELECT '3_purchase_after_click', np,
        |       CAST(np AS DOUBLE) / NULLIF(CAST(nc AS DOUBLE), 0.0),
        |       CAST(np AS DOUBLE) / NULLIF(CAST(nv AS DOUBLE), 0.0) FROM a""".stripMargin,

    // Retention cohorts: first-seen date per user via a window over the
    // same user shuffle, distinct actives per (cohort, day offset).
    "retention_cohorts" ->
      """WITH e AS (
        |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events
        |), c AS (
        |  SELECT user_id, d, MIN(d) OVER (PARTITION BY user_id) AS cohort_date
        |  FROM e)
        |SELECT cohort_date, CAST(date_diff('day', cohort_date, d) AS INT) AS day_offset,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM c GROUP BY 1, 2""".stripMargin,

    // Gap-based sessionization (30-min gap) as lag + running session
    // index; session boundaries depend only on the sorted ts_ms sequence
    // (tie order is irrelevant: equal timestamps always share a
    // session), and total_value is an exact decimal sum, so the result
    // is order-independent on both engines.
    "sessionize" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms, value FROM events
        |), m AS (
        |  SELECT user_id, ts_ms, value,
        |    CASE WHEN lag(ts_ms) OVER w IS NULL
        |         OR ts_ms - lag(ts_ms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, value)
        |), g AS (
        |  SELECT user_id, ts_ms, value,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ms, value
        |      ROWS UNBOUNDED PRECEDING) AS sess_idx
        |  FROM m)
        |SELECT user_id,
        |  MIN(ts_ms) AS session_start_ms,
        |  MAX(ts_ms) AS session_end_ms,
        |  CAST(COUNT(*) AS INT) AS n_events,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DECIMAL(18,8)) AS DOUBLE) AS total_value
        |FROM g GROUP BY user_id, sess_idx""".stripMargin,

    "multimodal_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image/png' WHEN doc_id % 3 = 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
        |  CASE WHEN doc_id % 3 = 0 THEN 64 + (doc_id % 16) * 16 END AS width,
        |  CASE WHEN doc_id % 3 = 0 THEN 64 + (doc_id % 8) * 32 END AS height,
        |  CASE WHEN doc_id % 3 <> 0 THEN (doc_id % 120) + 1 END AS duration_s,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  md5(text) AS payload_md5
        |FROM documents""".stripMargin,

    // Log-free rational idf (tf · N / df) — same expression tree as
    // Retrieval.tfIdf; rank over the ROUNDED score with term tie-break.
    "tf_idf" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM documents
        |), tf AS (
        |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, UNNEST(w) AS term FROM toks) GROUP BY 1, 2
        |), dfq AS (
        |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
        |), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
        |    round(CAST(tf.tf AS DOUBLE) * CAST(n.n_docs AS DOUBLE) /
        |      CAST(dfq.df AS DOUBLE), 8) AS tf_idf
        |  FROM tf JOIN dfq USING (term) CROSS JOIN n
        |), ranked AS (
        |  SELECT *, CAST(row_number() OVER (
        |    PARTITION BY doc_id ORDER BY tf_idf DESC, term) AS INT) AS rnk
        |  FROM scored)
        |SELECT doc_id, term, tf, df, tf_idf, rnk FROM ranked WHERE rnk <= 5""".stripMargin,

    // BM25 with rational idf, k1=1.2 b=0.75 (literals match the Spark
    // side bit-for-bit; k1+1 pre-folded to 2.2). Per-doc sum folds in
    // term order like bigram_doc_score; ranking over the rounded score.
    "bm25_search" -> bm25Sql,
    // the stored-index path must equal the corpus-scan path exactly —
    // one oracle proves both
    "bm25_stored" -> bm25Sql,
    // ... and the SEGMENTED + liveDocs incremental index (full build
    // over the low doc_id half, one range-disjoint delta segment over
    // the high half, then a MERGE-upsert absorbed as a tombstoned
    // delta — the driver key asserts both deltas landed as segments,
    // so the rebuild path cannot pass this trivially) must equal a
    // corpus-scan BM25 over the POST-UPSERT table: same expression
    // tree over a CTE that replays the upsert's text edit
    "bm25_incremental" -> (
      s"""WITH docs_u AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 3 THEN text || ' merge vector merge'
         |         ELSE text END AS text
         |  FROM documents
         |), ${bm25Ctes("docs_u", graft.operators.Retrieval.DefaultQuery)}
         |$bm25Select""".stripMargin),

    // BATCHED serving: three fixed queries scored in one statement —
    // per-term df is GLOBAL (not per query), per-(query, doc) sums
    // fold in term order, per-query top-20 via one partitioned
    // row_number — exactly the Spark batch path's shape
    "bm25_search_batch" -> {
      val qb = graft.operators.Retrieval.DefaultQueryBatch
      val qvals = qb.flatMap { case (q, ts) =>
        ts.distinct.map(t => s"('$q', '$t')") }.mkString(", ")
      s"""WITH ${bm25Ctes("documents", qb.flatMap(_._2))},
         |q(query_id, term) AS (VALUES $qvals),
         |qc AS (
         |  SELECT q.query_id, c.doc_id, c.term, c.dl, c.contrib
         |  FROM q JOIN contribs c USING (term)),
         |agg AS (
         |  SELECT query_id, doc_id, MAX(dl) AS dl,
         |    CAST(COUNT(*) AS BIGINT) AS n_hits,
         |    round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |      list(contrib ORDER BY term)), (x, y) -> x + y), 8) AS bm25
         |  FROM qc GROUP BY 1, 2),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY bm25 DESC, doc_id) AS rn FROM agg)
         |SELECT query_id, doc_id, dl, n_hits, bm25 FROM ranked
         |WHERE rn <= 20 ORDER BY query_id, bm25 DESC, doc_id""".stripMargin
    },

    // exact-phrase search: per doc, count token offsets whose
    // adjacent pair equals ('merge', 'group') — OVERLAPPING
    // occurrences counted (position arithmetic, the same rule the
    // positional-postings intersection implements; a regex count
    // would be non-overlapping and wrong)
    "phrase_search" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM documents
        |)
        |SELECT doc_id,
        |  CAST(length([i FOR i IN range(1, len(w))
        |    IF w[i] = 'merge' AND w[i+1] = 'group']) AS INT) AS n_occurrences
        |FROM toks
        |WHERE length([i FOR i IN range(1, len(w))
        |  IF w[i] = 'merge' AND w[i+1] = 'group']) > 0
        |ORDER BY doc_id""".stripMargin,

    // ordered PROXIMITY phrase search ("merge group"~2): an
    // occurrence is an END position j of 'group' reachable from some
    // 'merge' position i with gap 1 ≤ j−i ≤ slop+1 = 3 — the same
    // consecutive-gap positional arithmetic the index path's
    // filter/exists extension implements, counted at end positions
    // (so overlapping matches count once per distinct end)
    "phrase_search_slop" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM documents
        |), p AS (
        |  SELECT doc_id,
        |    [i FOR i IN range(1, len(w) + 1) IF w[i] = 'merge'] AS p1,
        |    [i FOR i IN range(1, len(w) + 1) IF w[i] = 'group'] AS p2
        |  FROM toks
        |), m AS (
        |  SELECT doc_id, CAST(len([j FOR j IN p2 IF
        |    len([i FOR i IN p1 IF j - i >= 1 AND j - i <= 3]) > 0])
        |    AS INT) AS n_occurrences
        |  FROM p)
        |SELECT doc_id, n_occurrences FROM m
        |WHERE n_occurrences > 0 ORDER BY doc_id""".stripMargin,


    // Reciprocal Rank Fusion of the BM25 leg (top-50) and the dense
    // cosine leg (query = vec 0's embedding, top-50): rrf =
    // 1/(60+lex_rank) + 1/(60+dense_rank), absent leg contributes 0.
    // Ranks are integers off totally-ordered legs (score DESC, id ASC)
    // whose scores already replay bit-for-bit (bm25_search / ann_topk
    // forms); the fused sum adds the two divides in the same
    // lexical-then-dense order as Spark, rounded at the boundary.
    "hybrid_search" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents
         |), tf AS (
         |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, UNNEST(w) AS term FROM toks) GROUP BY 1, 2
         |), qtf AS (
         |  SELECT * FROM tf WHERE term IN ('merge', 'spark', 'vector', 'window')
         |), dfq AS (
         |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qtf GROUP BY 1
         |), dls AS (
         |  SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM toks
         |), stats AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dls
         |), contribs AS (
         |  SELECT q.doc_id, q.term,
         |    (CAST(s.n_docs AS DOUBLE) - CAST(f.df AS DOUBLE) + 0.5) /
         |      (CAST(f.df AS DOUBLE) + 0.5)
         |      * (CAST(q.tf AS DOUBLE) * 2.2) /
         |      (CAST(q.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
         |        (CAST(d.dl AS DOUBLE) /
         |          (CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE))))) AS contrib
         |  FROM qtf q JOIN dfq f USING (term)
         |  JOIN dls d ON q.doc_id = d.doc_id CROSS JOIN stats s
         |), bmtop AS (
         |  SELECT doc_id,
         |    round(list_reduce(list_prepend(CAST(0 AS DOUBLE), list(contrib ORDER BY term)),
         |      (x, y) -> x + y), 8) AS bm25
         |  FROM contribs GROUP BY doc_id
         |  ORDER BY bm25 DESC, doc_id LIMIT 50
         |), lex AS (
         |  SELECT doc_id, CAST(row_number() OVER (
         |    ORDER BY bm25 DESC, doc_id) AS INT) AS lex_rank FROM bmtop
         |), $nrmCte,
         |q AS (SELECT embedding AS qe, nrm AS qn FROM nrm WHERE vec_id = 0),
         |dtop AS (
         |  SELECT c.vec_id AS doc_id,
         |    ${duckDot("q.qe", "c.embedding")} / (q.qn * c.nrm) AS cosine
         |  FROM nrm c, q WHERE c.vec_id <> 0
         |  ORDER BY cosine DESC, c.vec_id LIMIT 50
         |), dense AS (
         |  SELECT doc_id, CAST(row_number() OVER (
         |    ORDER BY cosine DESC, doc_id) AS INT) AS dense_rank FROM dtop)
         |SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
         |  COALESCE(l.lex_rank, 0) AS lex_rank,
         |  COALESCE(d.dense_rank, 0) AS dense_rank,
         |  round(COALESCE(1.0 / (60.0 + CAST(l.lex_rank AS DOUBLE)), 0) +
         |        COALESCE(1.0 / (60.0 + CAST(d.dense_rank AS DOUBLE)), 0), 8) AS rrf
         |FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id
         |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,

    // The fully STORED hybrid: the same BM25 lexical leg (index ≡ scan
    // is proven by bm25_stored's shared oracle, so the scan SQL stands
    // in for the posting read), the IVF dense leg (ivf_topk's chain:
    // lowest-16 quantizer, nearest-centroid lists, nprobe=4, ranked
    // WITHIN probed lists — the stored index's exact semantics), and
    // the identical RRF tail.
    "hybrid_search_stored" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents
         |), tf AS (
         |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, UNNEST(w) AS term FROM toks) GROUP BY 1, 2
         |), qtf AS (
         |  SELECT * FROM tf WHERE term IN ('merge', 'spark', 'vector', 'window')
         |), dfq AS (
         |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qtf GROUP BY 1
         |), dls AS (
         |  SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM toks
         |), stats AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dls
         |), contribs AS (
         |  SELECT q.doc_id, q.term,
         |    (CAST(s.n_docs AS DOUBLE) - CAST(f.df AS DOUBLE) + 0.5) /
         |      (CAST(f.df AS DOUBLE) + 0.5)
         |      * (CAST(q.tf AS DOUBLE) * 2.2) /
         |      (CAST(q.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
         |        (CAST(d.dl AS DOUBLE) /
         |          (CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE))))) AS contrib
         |  FROM qtf q JOIN dfq f USING (term)
         |  JOIN dls d ON q.doc_id = d.doc_id CROSS JOIN stats s
         |), bmtop AS (
         |  SELECT doc_id,
         |    round(list_reduce(list_prepend(CAST(0 AS DOUBLE), list(contrib ORDER BY term)),
         |      (x, y) -> x + y), 8) AS bm25
         |  FROM contribs GROUP BY doc_id
         |  ORDER BY bm25 DESC, doc_id LIMIT 50
         |), lex AS (
         |  SELECT doc_id, CAST(row_number() OVER (
         |    ORDER BY bm25 DESC, doc_id) AS INT) AS lex_rank FROM bmtop
         |), $nrmCte,
         |cent AS (SELECT vec_id AS centroid_id, embedding AS ce, nrm AS cn FROM nrm WHERE vec_id < 16),
         |asg AS (
         |  SELECT v.vec_id, c.centroid_id
         |  FROM nrm v, cent c
         |  QUALIFY row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |    ${duckDot("v.embedding", "c.ce")} / (v.nrm * c.cn) DESC, c.centroid_id) = 1),
         |q AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn FROM nrm WHERE vec_id = 0),
         |probes AS (
         |  SELECT q.query_id, c.centroid_id
         |  FROM q, cent c
         |  QUALIFY row_number() OVER (PARTITION BY q.query_id ORDER BY
         |    ${duckDot("q.qe", "c.ce")} / (q.qn * c.cn) DESC, c.centroid_id) <= 4),
         |cand AS (
         |  SELECT p.query_id, a.vec_id AS neighbor_id
         |  FROM probes p JOIN asg a ON p.centroid_id = a.centroid_id
         |  WHERE a.vec_id <> p.query_id),
         |dtop AS (
         |  SELECT neighbor_id AS doc_id, CAST(rank AS INT) AS dense_rank FROM (
         |    SELECT cand.neighbor_id,
         |      row_number() OVER (PARTITION BY cand.query_id ORDER BY
         |        ${duckDot("nv.embedding", "nq.embedding")} / (nv.nrm * nq.nrm) DESC, cand.neighbor_id) AS rank
         |    FROM cand JOIN nrm nv ON cand.neighbor_id = nv.vec_id
         |    JOIN nrm nq ON cand.query_id = nq.vec_id)
         |  WHERE rank <= 50)
         |SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
         |  COALESCE(l.lex_rank, 0) AS lex_rank,
         |  COALESCE(d.dense_rank, 0) AS dense_rank,
         |  round(COALESCE(1.0 / (60.0 + CAST(l.lex_rank AS DOUBLE)), 0) +
         |        COALESCE(1.0 / (60.0 + CAST(d.dense_rank AS DOUBLE)), 0), 8) AS rrf
         |FROM lex l FULL OUTER JOIN dtop d ON l.doc_id = d.doc_id
         |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin
  )
}

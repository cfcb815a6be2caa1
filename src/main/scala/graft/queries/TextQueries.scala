package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Text-analysis operator queries over the `documents` table, with DuckDB
  * oracles wherever the semantics are ANSI-SQL-expressible. */
object TextQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  // ---------------------------------------------------------------- t01
  def t01TokenStats(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"),
      length(col("text")).cast("bigint").as("n_chars_obs"))
      .orderBy("doc_id")

  val t01Sql: String =
    """SELECT doc_id,
      | CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
      |      ELSE LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) END::BIGINT AS n_tokens,
      | LENGTH(text)::BIGINT AS n_chars_obs
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t02
  def t02LangId(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"), col("lang").as("lang_label"),
      TextAnalysis.langId(col("text")).as("lang_pred"))
      .orderBy("doc_id")

  /** Shared DuckDB mirror of [[TextAnalysis.langId]]: per-language
    * distinct-stopword hit counts; CASE evaluates languages alphabetically
    * so ties resolve to the lexicographically-first language like the
    * Spark side. Ends in a relation `pred(doc_id, lang_label, lang_pred)`
    * so both the per-doc gate (t02) and the confusion-matrix eval (t41)
    * replay the identical heuristic. */
  private def langIdPredCte: String = {
    def listLit(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("[", ", ", "]")
    val scores = TextAnalysis.stopwords.toSeq.sortBy(_._1).map { case (l, ws) =>
      s"LEN(LIST_INTERSECT(w, ${listLit(ws)})) AS s_$l"
    }.mkString(",\n      ")
    val langs = TextAnalysis.stopwords.keys.toSeq.sorted
    val greatest = langs.map(l => s"s_$l").mkString("GREATEST(", ", ", ")")
    val cases = langs.map(l => s"WHEN s_$l = m THEN '$l'").mkString("\n      ")
    s"""toks AS (
       |  SELECT doc_id, lang,
       |    LIST_DISTINCT(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+')) AS w
       |  FROM documents),
       |scored AS (
       |  SELECT doc_id, lang, $scores
       |  FROM toks),
       |m AS (SELECT *, $greatest AS m FROM scored),
       |pred AS (
       |  SELECT doc_id, lang AS lang_label,
       |    CASE WHEN m = 0 THEN 'und'
       |        $cases
       |    END AS lang_pred
       |  FROM m)""".stripMargin
  }

  val t02Sql: String =
    s"""WITH $langIdPredCte
       |SELECT doc_id, lang_label, lang_pred FROM pred
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t03
  def t03Quality(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      round(TextAnalysis.punctRatio(col("text")), 6).as("punct_ratio"),
      round(TextAnalysis.meanTokenLen(col("text")), 6).as("mean_token_len"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  val t03Sql: String =
    """WITH base AS (
      |  SELECT doc_id, text,
      |    STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS w,
      |    CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
      |         ELSE LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) END AS n_tok
      |  FROM documents),
      |derived AS (
      |  SELECT doc_id,
      |    CASE WHEN LENGTH(text) = 0 THEN 0.0
      |         ELSE (LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[^\p{L}\p{N}\s]', '', 'g')))::DOUBLE
      |              / LENGTH(text)::DOUBLE END AS pr,
      |    CASE WHEN LEN(w) = 0 THEN 0.0
      |         ELSE LENGTH(REGEXP_REPLACE(LOWER(TRIM(text)), '\s+', '', 'g'))::DOUBLE / LEN(w)::DOUBLE
      |    END AS mtl,
      |    n_tok
      |  FROM base)
      |SELECT doc_id,
      |  ROUND(pr, 6) AS punct_ratio,
      |  ROUND(mtl, 6) AS mean_token_len,
      |  ROUND(
      |    (CASE WHEN n_tok >= 10 AND n_tok <= 10000 THEN 1.0 ELSE 0.0 END) * 0.4
      |    + (1.0 - LEAST(pr * 5.0, 1.0)) * 0.3
      |    + (CASE WHEN mtl >= 3.0 AND mtl <= 12.0 THEN 1.0 ELSE 0.0 END) * 0.3,
      |    4) AS quality
      |FROM derived ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t04
  /** Document fingerprint: MD5 (cross-engine oracle) — the FNV-1a-64
    * codegen fingerprint is exercised by the dedup operators and specs. */
  def t04Fingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      md5(col("text").cast("binary")).as("fp_md5"))
      .orderBy("doc_id")

  val t04Sql: String =
    """SELECT doc_id, MD5(text) AS fp_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t05
  /** BPE-ish subword counting (whitespace + case/digit-boundary splits).
    * The boundary regex uses lookarounds, which DuckDB's RE2 lacks — but
    * the SEMANTICS need no regex at all: piece count = 1 + whitespace-run
    * starts + adjacent-char transitions (lower→upper, letter→digit,
    * digit→letter), with Java-split quirks preserved (limit -1 keeps
    * leading/trailing empty pieces from non-space whitespace that Spark's
    * space-only trim leaves in place). The oracle computes exactly that
    * with character-pair list comprehensions — converted from rows-only. */
  def t05SubwordStats(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"),
      TextAnalysis.subwordCount(col("text")).as("n_subwords"))
      .orderBy("doc_id")

  /** Shared DuckDB mirror of the per-doc token/subword arithmetic: ends
    * in a relation `tok(doc_id, lang, n_chars, n_tokens, n_subwords)` so
    * both the per-doc gate (t05) and the per-language fertility rollup
    * (t43) replay the IDENTICAL lookaround-free char-pair mirror. */
  private val subwordTokCte: String =
    """base AS (SELECT doc_id, lang, text, TRIM(text) AS s FROM documents),
      |ch AS (SELECT doc_id, lang, text, s, STRING_SPLIT(s, '') AS c,
      |              LENGTH(s) AS n
      |       FROM base),
      |tok AS (SELECT doc_id, lang, LENGTH(text)::BIGINT AS n_chars,
      |  CASE WHEN LENGTH(s) = 0 THEN 0
      |       ELSE LEN(STRING_SPLIT_REGEX(s, '\s+')) END::BIGINT AS n_tokens,
      |  CASE WHEN s IS NULL THEN NULL
      |       WHEN LENGTH(s) = 0 THEN 0
      |       ELSE 1
      |         + LEN([i FOR i IN RANGE(1, n + 1)
      |                IF list_contains([' ', CHR(9), CHR(10), CHR(11),
      |                                  CHR(12), CHR(13)], c[i])
      |                   AND (i = 1 OR NOT list_contains([' ', CHR(9),
      |                     CHR(10), CHR(11), CHR(12), CHR(13)], c[i-1]))])
      |         + LEN([i FOR i IN RANGE(2, n + 1) IF
      |                ((c[i-1] BETWEEN 'a' AND 'z')
      |                 AND (c[i] BETWEEN 'A' AND 'Z'))
      |             OR (((c[i-1] BETWEEN 'a' AND 'z')
      |                  OR (c[i-1] BETWEEN 'A' AND 'Z'))
      |                 AND (c[i] BETWEEN '0' AND '9'))
      |             OR ((c[i-1] BETWEEN '0' AND '9')
      |                 AND ((c[i] BETWEEN 'a' AND 'z')
      |                      OR (c[i] BETWEEN 'A' AND 'Z')))])
      |       END::BIGINT AS n_subwords
      |  FROM ch)""".stripMargin

  val t05Sql: String =
    s"""WITH $subwordTokCte
       |SELECT doc_id, n_tokens, n_subwords
       |FROM tok ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t06
  /** Rolling-hash (FNV-1a64, codegen Catalyst expression) fingerprint.
    * Oracle: byte-exact FNV-1a mirror in DuckDB — HUGEINT fold over the
    * text's characters (corpus is ASCII, so codepoint == UTF-8 byte) with
    * multiply mod 2⁶⁴, re-signed to BIGINT. Value correctness is further
    * pinned by public FNV test vectors in LlmOpsSpec/SqlSurfaceSpec. */
  def t06FnvFingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      graft.functions.TextExpressions.fnv1a64(col("text")).as("fp_fnv64"))
      .orderBy("doc_id")

  val t06Sql: String =
    """SELECT doc_id,
      |  CAST(CASE WHEN fnv >= 9223372036854775808::HUGEINT
      |       THEN fnv - 18446744073709551616::HUGEINT ELSE fnv END AS BIGINT) AS fp_fnv64
      |FROM (SELECT doc_id,
      |        CASE WHEN text = '' THEN 14695981039346656037::HUGEINT
      |             ELSE list_reduce(
      |               list_prepend(14695981039346656037::HUGEINT,
      |                 [unicode(c)::HUGEINT for c in string_split(text, '')]),
      |               (h, b) -> (xor(h, b) * 1099511628211::HUGEINT)
      |                           % 18446744073709551616::HUGEINT) END AS fnv
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t07
  /** Intra-document repetition (duplicate-bigram fraction, the Gopher-style
    * boilerplate signal). To guarantee non-trivial values on the synthetic
    * corpus, every 10th document is measured with its own first 5 words
    * appended once — a controlled repetition both engines construct
    * identically. */
  def t07Repetition(spark: SparkSession, dir: String): DataFrame = {
    val t = split(trim(col("text")), "\\s+")
    val boosted = when(pmod(col("doc_id"), lit(10)) === 0 && size(t) >= 5,
      concat_ws(" ", col("text"), concat_ws(" ", slice(t, 1, 5))))
      .otherwise(col("text"))
    docs(spark, dir).select(
      col("doc_id"),
      round(TextAnalysis.repetitionRatio(boosted, n = 2), 6).as("rep_ratio"))
      .orderBy("doc_id")
  }

  val t07Sql: String =
    """WITH boosted AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 10 = 0 AND LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) >= 5
      |      THEN text || ' ' ||
      |        ARRAY_TO_STRING(STRING_SPLIT_REGEX(TRIM(text), '\s+')[1:5], ' ')
      |      ELSE text END AS text
      |  FROM documents),
      |toks AS (
      |  SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS w
      |  FROM boosted),
      |grams AS (
      |  SELECT doc_id, LEN(w) - 1 AS total,
      |    LIST_TRANSFORM(RANGE(1, GREATEST(LEN(w) - 1, 0) + 1),
      |      i -> w[i] || ' ' || w[i+1]) AS ng
      |  FROM toks)
      |SELECT doc_id,
      |  CASE WHEN total <= 0 THEN 0.0
      |       ELSE ROUND(1.0 - LEN(LIST_DISTINCT(ng))::DOUBLE / total::DOUBLE, 6)
      |  END AS rep_ratio
      |FROM grams ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t08
  /** PII-style scrubbing: the corpus is synthetic/clean, so each document
    * gets a deterministic doc-derived contact suffix appended first; the
    * scrubber must then mask the email and the long number, and both
    * engines hash the scrubbed text for compact comparison. */
  def t08PiiScrub(spark: SparkSession, dir: String): DataFrame = {
    val withPii = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com id "), (col("doc_id") * 7919L).cast("string"))
    docs(spark, dir).select(
      col("doc_id"),
      regexp_count(withPii, lit(TextAnalysis.EmailRe)).cast("bigint")
        .as("n_emails"),
      regexp_count(withPii, lit(TextAnalysis.LongNumberRe)).cast("bigint")
        .as("n_longnums"),
      md5(TextAnalysis.scrubPii(withPii).cast("binary")).as("scrub_fp"))
      .orderBy("doc_id")
  }

  val t08Sql: String = {
    val email = TextAnalysis.EmailRe // literal chars incl. \. survive into SQL
    s"""WITH pii AS (
       |  SELECT doc_id,
       |    text || ' contact user' || doc_id || '@example.com id ' ||
       |      (doc_id * 7919) AS t
       |  FROM documents)
       |SELECT doc_id,
       |  LEN(REGEXP_EXTRACT_ALL(t, '$email'))::BIGINT AS n_emails,
       |  LEN(REGEXP_EXTRACT_ALL(t, '[0-9]{4,}'))::BIGINT AS n_longnums,
       |  MD5(REGEXP_REPLACE(REGEXP_REPLACE(t, '$email', '<EMAIL>', 'g'),
       |      '[0-9]{4,}', '<NUM>', 'g')) AS scrub_fp
       |FROM pii ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- t09
  /** Top-3 keywords per document by TF/DF weight (rank-equivalent to
    * TF-IDF, integer outputs — see
    * [[graft.operators.TextAnalysis.topKeywords]]); ties by word asc. */
  def t09Keywords(spark: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.topKeywords(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
      topK = 3, minLen = 4)
      .orderBy("doc_id", "rank")

  val t09Sql: String =
    """WITH words AS (
      |  SELECT doc_id,
      |         UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')) AS word
      |  FROM documents),
      |fw AS (SELECT doc_id, word FROM words WHERE LEN(word) >= 4),
      |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM fw GROUP BY 1, 2),
      |dfreq AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1),
      |ranked AS (
      |  SELECT doc_id, word, tf, df,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id
      |      ORDER BY tf::DOUBLE / df::DOUBLE DESC, word) AS rank
      |  FROM tf JOIN dfreq USING (word))
      |SELECT doc_id, rank, word, tf, df FROM ranked
      |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin

  // ---------------------------------------------------------------- t10
  /** Domain extraction + provenance histogram: the curation step that
    * groups a web corpus by source domain (domain filters, per-domain
    * caps, provenance audits). URLs are planted deterministically (20
    * domains keyed by doc_id) since the corpus has none; extraction takes
    * the LAST url match so organic text can never shadow the planted one.
    * RE2-safe pattern shared verbatim with the oracle. */
  def t10DomainStats(spark: SparkSession, dir: String): DataFrame = {
    val withUrl = concat(col("text"),
      lit(" source: https://host"), pmod(col("doc_id"), lit(20)).cast("string"),
      lit(".example.org/p/"), col("doc_id").cast("string"))
    docs(spark, dir).select(
      col("doc_id"),
      element_at(regexp_extract_all(withUrl,
        lit("https?://([A-Za-z0-9.-]+)"), lit(1)), -1).as("domain"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .orderBy("domain")
  }

  val t10Sql: String =
    """WITH u AS (
      |  SELECT doc_id,
      |    (REGEXP_EXTRACT_ALL(
      |       text || ' source: https://host' || (doc_id % 20)
      |            || '.example.org/p/' || doc_id,
      |       'https?://([A-Za-z0-9.-]+)', 1))[-1] AS domain
      |  FROM documents)
      |SELECT domain, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
      |FROM u GROUP BY domain ORDER BY domain""".stripMargin

  // ---------------------------------------------------------------- t11
  /** URL canonicalization + URL-level dup counting: six deterministic
    * spellings of the same logical pages (case, default ports, `www.`,
    * tracking params, param order, fragments, trailing slashes) are
    * planted per doc_id; [[graft.operators.Urls.canonicalizeUrl]] must
    * collapse the colliding spellings so the per-canonical window count
    * sees them as one page. Every rule is portable regex/array
    * arithmetic, mirrored verbatim in DuckDB. */
  def t11UrlCanon(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = pmod(col("doc_id"), lit(7)).cast("string")
    val p = pmod(col("doc_id"), lit(5)).cast("string")
    val form = pmod(col("doc_id"), lit(6))
    val url =
      when(form === 0, concat(lit("https://www.host"), h,
        lit(".example.com/a"), p, lit("/b/")))
      .when(form === 1, concat(lit("HTTPS://Host"), h,
        lit(".Example.Com:443/a"), p, lit("/b")))
      .when(form === 2, concat(lit("https://host"), h,
        lit(".example.com/a"), p, lit("/b?utm_source=feed&gclid=x")))
      .when(form === 3, concat(lit("https://host"), h,
        lit(".example.com:8443")))
      .when(form === 4, concat(lit("http://host"), h,
        lit(".example.com/a"), p, lit("/b?z=2&a=1&utm_medium=m#frag")))
      .otherwise(concat(lit("http://www.host"), h,
        lit(".example.com:80/a"), p, lit("/b?a=1&z=2")))
    docs(spark, dir)
      .select(col("doc_id"), url.as("url"))
      .withColumn("canon", graft.operators.Urls.canonicalizeUrl(col("url")))
      .withColumn("n_same",
        count(lit(1)).over(Window.partitionBy("canon")))
      .orderBy("doc_id")
  }

  val t11Sql: String =
    """WITH u AS (
      |  SELECT doc_id,
      |    CASE doc_id % 6
      |      WHEN 0 THEN 'https://www.host' || (doc_id % 7) || '.example.com/a' || (doc_id % 5) || '/b/'
      |      WHEN 1 THEN 'HTTPS://Host' || (doc_id % 7) || '.Example.Com:443/a' || (doc_id % 5) || '/b'
      |      WHEN 2 THEN 'https://host' || (doc_id % 7) || '.example.com/a' || (doc_id % 5) || '/b?utm_source=feed&gclid=x'
      |      WHEN 3 THEN 'https://host' || (doc_id % 7) || '.example.com:8443'
      |      WHEN 4 THEN 'http://host' || (doc_id % 7) || '.example.com/a' || (doc_id % 5) || '/b?z=2&a=1&utm_medium=m#frag'
      |      ELSE 'http://www.host' || (doc_id % 7) || '.example.com:80/a' || (doc_id % 5) || '/b?a=1&z=2'
      |    END AS url
      |  FROM documents),
      |parts AS (
      |  SELECT doc_id, url,
      |    LOWER(REGEXP_EXTRACT(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
      |    LOWER(REGEXP_EXTRACT(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hostport,
      |    REGEXP_EXTRACT(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS rawpath,
      |    REGEXP_EXTRACT(url, '^[^#?]*\?([^#]*)', 1) AS query
      |  FROM u),
      |norm AS (
      |  SELECT doc_id, url, scheme,
      |    REGEXP_REPLACE(REGEXP_REPLACE(hostport, ':[0-9]+$', ''), '^www\.', '') AS host,
      |    REGEXP_EXTRACT(hostport, ':([0-9]+)$', 1) AS port,
      |    CASE WHEN REGEXP_REPLACE(rawpath, '/+$', '') = '' THEN '/'
      |         ELSE REGEXP_REPLACE(rawpath, '/+$', '') END AS path,
      |    COALESCE(ARRAY_TO_STRING(LIST_SORT(LIST_FILTER(STR_SPLIT(query, '&'),
      |      x -> x <> '' AND NOT REGEXP_MATCHES(x,
      |        '^(utm_[a-z0-9_]*|gclid|fbclid|ref)='))), '&'), '') AS q
      |  FROM parts),
      |c AS (
      |  SELECT doc_id, url,
      |    scheme || '://' || host ||
      |    CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
      |              OR (scheme = 'https' AND port = '443')
      |         THEN '' ELSE ':' || port END ||
      |    path || CASE WHEN q = '' THEN '' ELSE '?' || q END AS canon
      |  FROM norm)
      |SELECT doc_id, url, canon,
      |  COUNT(*) OVER (PARTITION BY canon) AS n_same
      |FROM c ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t12
  /** Gopher-rule quality filtering: the corpus text is deterministically
    * decorated (bullet lines every 5th doc, an ellipsis line every 7th,
    * a `#` run every 11th) so every rule fires on a known subset, then
    * [[TextAnalysis.gopherRules]] emits the per-rule verdicts and the
    * folded keep bit. DuckDB mirrors the decoration and every rule. */
  def t12GopherFilter(spark: SparkSession, dir: String): DataFrame = {
    val aug = concat(col("text"),
      when(pmod(col("doc_id"), lit(5)) === 0,
        lit("\n- planted bullet item\n- second bullet")).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(7)) === 0,
        lit("\nto be continued...")).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(11)) === 0,
        lit(" ## ### #")).otherwise(lit("")))
    // two-step projection: the rule struct materializes ONCE per row
    // (CollapseProject refuses to inline a multiply-referenced non-cheap
    // expression), instead of once per extracted field — the one-select
    // form re-evaluated the full battery ~9× and doubled gate time.
    // The sort sits BELOW the battery: orderBy's range-sampling pass
    // re-executes its child subtree, so sorting first means the sampler
    // reads (doc_id, text), not a recomputation of every rule
    docs(spark, dir)
      .select(col("doc_id"), aug.as("t"))
      .orderBy("doc_id")
      .select(col("doc_id"), TextAnalysis.gopherRules(col("t")).as("r"))
      .select(col("doc_id"),
        col("r.n_words").as("n_words"),
        col("r.words_ok").as("words_ok"),
        col("r.mwl_ok").as("mwl_ok"),
        col("r.symbol_ok").as("symbol_ok"),
        col("r.bullet_ok").as("bullet_ok"),
        col("r.ellipsis_ok").as("ellipsis_ok"),
        col("r.alpha_ok").as("alpha_ok"),
        col("r.stop_ok").as("stop_ok"),
        (col("r.words_ok") && col("r.mwl_ok") && col("r.symbol_ok") &&
          col("r.bullet_ok") && col("r.ellipsis_ok") && col("r.alpha_ok") &&
          col("r.stop_ok")).as("keep"))
  }

  val t12Sql: String =
    """WITH aug AS (
      |  SELECT doc_id, text ||
      |    CASE WHEN doc_id % 5 = 0
      |         THEN CHR(10) || '- planted bullet item' || CHR(10) || '- second bullet'
      |         ELSE '' END ||
      |    CASE WHEN doc_id % 7 = 0
      |         THEN CHR(10) || 'to be continued...' ELSE '' END ||
      |    CASE WHEN doc_id % 11 = 0 THEN ' ## ### #' ELSE '' END AS t
      |  FROM documents),
      |w AS (
      |  SELECT doc_id, t,
      |    CASE WHEN LENGTH(TRIM(t)) = 0 THEN 0
      |         ELSE LEN(STRING_SPLIT_REGEX(TRIM(t), '\s+')) END AS n_words,
      |    STRING_SPLIT_REGEX(LOWER(TRIM(t)), '\s+') AS ws,
      |    LEN(REGEXP_EXTRACT_ALL(t, '#'))
      |      + LEN(REGEXP_EXTRACT_ALL(t, '\.\.\.')) AS nsym
      |  FROM aug),
      |m AS (
      |  SELECT doc_id, n_words,
      |    CASE WHEN n_words = 0 THEN 0.0
      |         ELSE LENGTH(REGEXP_REPLACE(LOWER(TRIM(t)), '\s+', '', 'g'))::DOUBLE
      |              / n_words END AS mwl,
      |    nsym,
      |    GREATEST(LEN(REGEXP_EXTRACT_ALL(CHR(10) || t, '\n *[^ \n]')), 1) AS nlines,
      |    LEN(REGEXP_EXTRACT_ALL(CHR(10) || t, '\n *[-*•]')) AS nbullet,
      |    LEN(REGEXP_EXTRACT_ALL(t || CHR(10), '\.\.\. *\n')) AS nellipsis,
      |    LEN(REGEXP_EXTRACT_ALL(LOWER(TRIM(t)), '\S*[a-z]\S*')) AS nalpha,
      |    LEN(LIST_FILTER(['the','be','to','of','and','that','have','with'],
      |      s -> LIST_CONTAINS(ws, s))) AS nstop
      |  FROM w),
      |v AS (
      |  SELECT doc_id, n_words,
      |    n_words >= 50 AND n_words <= 100000 AS words_ok,
      |    mwl >= 3.0 AND mwl <= 10.0 AS mwl_ok,
      |    n_words = 0 OR nsym::DOUBLE / n_words <= 0.1 AS symbol_ok,
      |    nbullet::DOUBLE / nlines <= 0.9 AS bullet_ok,
      |    nellipsis::DOUBLE / nlines <= 0.3 AS ellipsis_ok,
      |    n_words > 0 AND nalpha::DOUBLE / n_words >= 0.8 AS alpha_ok,
      |    nstop >= 2 AS stop_ok
      |  FROM m)
      |SELECT doc_id, n_words, words_ok, mwl_ok, symbol_ok, bullet_ok,
      |  ellipsis_ok, alpha_ok, stop_ok,
      |  words_ok AND mwl_ok AND symbol_ok AND bullet_ok AND ellipsis_ok
      |    AND alpha_ok AND stop_ok AS keep
      |FROM v ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t13
  /** fastText-style hashed linear quality classifier (see
    * [[graft.operators.QualityClassifier]]): unigram+bigram hashing trick
    * into 4096 buckets, broadcast weight-table join, integer logit. The
    * oracle rebuilds buckets with the t06 FNV-1a HUGEINT fold (dim is a
    * power of two, so the unsigned residue equals Spark's signed pmod)
    * and the same Knuth-hash weight table — logits compare exactly. */
  def t13QualityClassifier(spark: SparkSession, dir: String): DataFrame =
    classifierScores(spark, dir).orderBy("doc_id")

  /** The t13 hashed-classifier score table (doc_id, n_features, logit,
    * keep) — SIX gates consume it verbatim (t13 emits it; t24/t31/t32
    * evaluate the logit, t33/t35 the keep verdict), so the
    * unigram+bigram hash + weight join runs once per (session, corpus)
    * as a shared checkpoint instead of once per gate (the
    * tradeGraph/bpeMerges discipline: score the corpus once, every
    * evaluation reads the scored table). */
  private def classifierScores(spark: SparkSession, dir: String): DataFrame =
    graft.SharedPrep.cached(spark, s"qcScores:$dir", dir) {
      graft.SharedPrep.checkpointShared(
        graft.operators.QualityClassifier
          .score(docs(spark, dir), "doc_id", "text", dim = 4096))
    }

  val t13Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS t
      |  FROM documents WHERE TRIM(text) <> ''),
      |grams AS (
      |  SELECT doc_id, UNNEST(
      |    CASE WHEN LEN(t) >= 2 THEN
      |      t || LIST_TRANSFORM(RANGE(1, LEN(t)), i -> t[i] || ' ' || t[i+1])
      |    ELSE t END) AS g
      |  FROM toks),
      |feats AS (
      |  SELECT doc_id,
      |    CAST(list_reduce(
      |      list_prepend(14695981039346656037::HUGEINT,
      |        [unicode(c)::HUGEINT for c in string_split(g, '')]),
      |      (h, b) -> (xor(h, b) * 1099511628211::HUGEINT)
      |                  % 18446744073709551616::HUGEINT) % 4096 AS BIGINT)
      |      AS bucket,
      |    COUNT(*) AS cnt
      |  FROM grams GROUP BY 1, 2),
      |w AS (
      |  SELECT bucket, bucket * 2654435761 % 4294967296 % 17 - 8 AS weight
      |  FROM (SELECT UNNEST(RANGE(0, 4096)) AS bucket))
      |SELECT doc_id,
      |  COUNT(*) AS n_features,
      |  CAST(SUM(cnt * weight) AS BIGINT) AS logit,
      |  SUM(cnt * weight) > 0 AS keep
      |FROM feats JOIN w USING (bucket)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t14
  /** Tokenizer-prep vocabulary over word BIGRAMS (the corpus has only 31
    * distinct unigrams, so bigrams — ~916 at every SF — are the regime
    * where the `minCount` floor and top-V truncation both genuinely
    * bite): count, floor at 5, keep top 600 by (count desc, bigram asc),
    * assign contiguous token ids. */
  def t14Vocabulary(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabulary(docs(spark, dir), "text",
      minCount = 5L, maxSize = 600, ngram = 2)
      .orderBy("token_id")

  private val bigramCountsSql: String =
    """toks AS (
      |  SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS t
      |  FROM documents WHERE TRIM(text) <> ''),
      |grams AS (
      |  SELECT doc_id, UNNEST(
      |    CASE WHEN LEN(t) >= 2 THEN
      |      LIST_TRANSFORM(RANGE(1, LEN(t)), i -> t[i] || ' ' || t[i+1])
      |    ELSE [] END) AS word
      |  FROM toks),
      |vocab AS (
      |  SELECT word, cnt,
      |    ROW_NUMBER() OVER (ORDER BY cnt DESC, word ASC) AS token_id
      |  FROM (SELECT word, COUNT(*) AS cnt FROM grams
      |        GROUP BY 1 HAVING COUNT(*) >= 5)
      |  QUALIFY token_id <= 600)""".stripMargin

  val t14Sql: String =
    s"""WITH $bigramCountsSql
      |SELECT token_id, word, cnt FROM vocab ORDER BY token_id""".stripMargin

  // ---------------------------------------------------------------- t15
  /** Per-document OOV rate against the t14 bigram vocabulary — the
    * truncated tail IS the out-of-vocabulary mass, so rates are nonzero
    * by construction. The vocab side of the probe join is broadcast
    * (bounded at 600 rows); the corpus never shuffles for it. */
  def t15OovRate(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    TextAnalysis.oovStats(d, "doc_id", "text",
      TextAnalysis.vocabulary(d, "text", minCount = 5L, maxSize = 600,
        ngram = 2),
      ngram = 2)
      .orderBy("doc_id")
  }

  val t15Sql: String =
    s"""WITH $bigramCountsSql
      |SELECT doc_id, COUNT(*) AS n_tokens,
      |  COUNT(*) FILTER (WHERE v.token_id IS NULL) AS n_oov,
      |  ROUND(COUNT(*) FILTER (WHERE v.token_id IS NULL)::DOUBLE
      |        / COUNT(*)::DOUBLE, 6) AS oov_rate
      |FROM grams g LEFT JOIN vocab v ON g.word = v.word
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t16
  /** BM25 top-10 retrieval ([[graft.operators.Retrieval.bm25TopK]]) for
    * three fixed queries (one contains the rare term 'dup', df≈6%, so
    * idf genuinely discriminates). Scores are engine-mirrorable because
    * the per-(query, doc) sum is a SORTED fold, not a float SUM — the
    * only cross-engine noise left is ln's ±1 ulp, absorbed by ranking on
    * ROUND(score, 4) with doc_id tie-break. */
  def t16Bm25(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val queries = Seq(("q1", "spark join dup"), ("q2", "window agg sort"),
      ("q3", "customer table")).toDF("query_id", "qtext")
    graft.operators.Retrieval.bm25TopK(
      docs(spark, dir), "doc_id", "text", queries, "query_id", "qtext",
      k1 = 1.2, b = 0.75, topK = 10)
      .orderBy("query_id", "rank")
  }

  val t16Sql: String =
    """WITH q(query_id, qtext) AS (
      |  VALUES ('q1', 'spark join dup'), ('q2', 'window agg sort'),
      |         ('q3', 'customer table')),
      |qt AS (SELECT DISTINCT query_id,
      |         UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(qtext)), '\s+')) AS term
      |       FROM q),
      |toks AS (
      |  SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS t
      |  FROM documents WHERE TRIM(text) <> ''),
      |post AS (SELECT doc_id, LEN(t) AS dl, UNNEST(t) AS term FROM toks),
      |corpus AS (SELECT COUNT(*) AS n_docs,
      |                  CAST(SUM(LEN(t)) AS BIGINT) AS sum_dl FROM toks),
      |matched AS (
      |  SELECT doc_id, term, dl, COUNT(*) AS tf FROM post
      |  WHERE term IN (SELECT DISTINCT term FROM qt)
      |  GROUP BY 1, 2, 3),
      |dfreq AS (SELECT term, COUNT(*) AS df FROM matched GROUP BY 1),
      |ts AS (
      |  SELECT qt.query_id, m.doc_id, m.term,
      |    LN(1.0::DOUBLE +
      |       (c.n_docs::DOUBLE - d.df::DOUBLE + 0.5::DOUBLE)
      |       / (d.df::DOUBLE + 0.5::DOUBLE))
      |    * (m.tf::DOUBLE * 2.2::DOUBLE)
      |    / (m.tf::DOUBLE + 1.2::DOUBLE *
      |       (0.25::DOUBLE + 0.75::DOUBLE *
      |        (m.dl::DOUBLE / (c.sum_dl::DOUBLE / c.n_docs::DOUBLE))))
      |      AS term_score
      |  FROM matched m JOIN dfreq d USING (term)
      |       JOIN qt ON m.term = qt.term CROSS JOIN corpus c),
      |scored AS (
      |  SELECT query_id, doc_id,
      |    ROUND(list_reduce(
      |      list_prepend(0.0::DOUBLE, LIST(term_score ORDER BY term)),
      |      (a, x) -> a + x), 4) AS score
      |  FROM ts GROUP BY 1, 2)
      |SELECT query_id,
      |  ROW_NUMBER() OVER (PARTITION BY query_id
      |                     ORDER BY score DESC, doc_id) AS rank,
      |  doc_id, score
      |FROM scored
      |QUALIFY rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------- t17
  /** Unigram-LM surprise scoring ([[TextAnalysis.unigramSurprise]]):
    * per-document information content in integer bits against the
    * corpus's own unigram stats — the cheap perplexity proxy for
    * gibberish/boilerplate filtering. Integer log2 via bit length keeps
    * the score engine-exact, so the oracle mirrors it fully. */
  def t17UnigramSurprise(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.unigramSurprise(docs(spark, dir), "doc_id", "text")
      .orderBy("doc_id")

  val t17Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')) AS word
      |  FROM documents WHERE TRIM(text) <> ''),
      |tok2 AS (SELECT doc_id, word FROM toks WHERE word <> ''),
      |counts AS (SELECT word, COUNT(*) AS cnt FROM tok2 GROUP BY 1),
      |n AS (SELECT SUM(cnt)::BIGINT AS n_total FROM counts),
      |scored AS (
      |  SELECT doc_id,
      |    (LENGTH(BIN(CAST(n_total // cnt AS BIGINT))) - 1)::BIGINT AS bits
      |  FROM tok2 JOIN counts USING (word) CROSS JOIN n)
      |SELECT doc_id, COUNT(*) AS n_tokens, SUM(bits)::BIGINT AS surprise_bits,
      |  ((SUM(bits) * 1000) // COUNT(*))::BIGINT AS mean_millibits
      |FROM scored GROUP BY 1 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t18
  /** Source-pair divergence matrix ([[TextAnalysis.domainDivergence]]):
    * average bits of surprise of source A's tokens under source B's
    * unigram stats, integer-exact (OOV mass in closed form, only the
    * vocab intersection joins). The curation signal for mixture design:
    * read each row against its diagonal. */
  def t18DomainDivergence(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.domainDivergence(docs(spark, dir), "source", "text")
      .orderBy("src_a", "src_b")

  val t18Sql: String =
    """WITH toks AS (
      |  SELECT source AS src,
      |    UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')) AS word
      |  FROM documents WHERE TRIM(text) <> ''),
      |counts AS (
      |  SELECT src, word, COUNT(*) AS cnt FROM toks
      |  WHERE word <> '' GROUP BY 1, 2),
      |totals AS (
      |  SELECT src, SUM(cnt)::BIGINT AS n_total,
      |    (LENGTH(BIN(SUM(cnt)::BIGINT)) - 1)::BIGINT AS maxbits
      |  FROM counts GROUP BY 1),
      |bcounts AS (
      |  SELECT c.src AS src_b, c.word,
      |    ((LENGTH(BIN(CAST(t.n_total // c.cnt AS BIGINT))) - 1)
      |     - t.maxbits)::BIGINT AS delta_bits
      |  FROM counts c JOIN totals t ON t.src = c.src),
      |inner_ AS (
      |  SELECT a.src AS src_a, b.src_b,
      |    SUM(a.cnt * b.delta_bits)::BIGINT AS inner_bits
      |  FROM counts a JOIN bcounts b ON b.word = a.word
      |  GROUP BY 1, 2)
      |SELECT ta.src AS src_a, tb.src AS src_b,
      |  ta.n_total AS n_tokens_a,
      |  (ta.n_total * tb.maxbits + COALESCE(i.inner_bits, 0))::BIGINT
      |    AS cross_bits,
      |  ((ta.n_total * tb.maxbits + COALESCE(i.inner_bits, 0)) * 1000
      |    // ta.n_total)::BIGINT AS mean_millibits
      |FROM totals ta CROSS JOIN totals tb
      |LEFT JOIN inner_ i ON i.src_a = ta.src AND i.src_b = tb.src
      |ORDER BY src_a, src_b""".stripMargin

  // ---------------------------------------------------------------- t20
  /** Hybrid retrieval by reciprocal-rank fusion: document 0's own text
    * queries the BM25 index (t16's scorer, top-20) while its embedding
    * queries the vector index (s01's exact cosine scorer, top-20), and
    * the two rankings fuse by integer RRF — the related-document search
    * a RAG stack runs, with both legs and the fusion fully mirrorable.
    * Document 0 itself winning rank 1 on both legs is the built-in
    * sanity signal (self-retrieval). */
  def t20HybridRetrieval(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val queries = docs(spark, dir).filter(col("doc_id") === 0)
      .select(lit("q0").as("query_id"), col("text").as("qtext"))
    val lex = graft.operators.Retrieval.bm25TopK(
      docs(spark, dir), "doc_id", "text", queries, "query_id", "qtext",
      k1 = 1.2, b = 0.75, topK = 20)
      .select(col("query_id"), col("doc_id").as("id"), col("rank"))
    val q = graft.operators.Similarity.vectorOf(spark, dir, 0L)
    val vec = graft.operators.Similarity.bruteForceTopK(
      spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
      q, 20)
      // GLOBAL-WINDOW: bounded — 20 rows post-limit
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cos").desc, col("vec_id").asc)).cast("bigint"))
      .select(lit("q0").as("query_id"), col("vec_id").as("id"), col("rank"))
    graft.operators.Retrieval.rrfFuse(lex, vec, "query_id", "id", "rank",
      kRrf = 60, topK = 10)
      .orderBy("rank")
  }

  val t20Sql: String =
    """WITH lex AS MATERIALIZED (
      |  WITH q(query_id, qtext) AS (
      |    SELECT 'q0', text FROM documents WHERE doc_id = 0),
      |  qt AS (SELECT DISTINCT query_id,
      |           UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(qtext)), '\s+')) AS term
      |         FROM q),
      |  toks AS (
      |    SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS t
      |    FROM documents WHERE TRIM(text) <> ''),
      |  post AS (SELECT doc_id, LEN(t) AS dl, UNNEST(t) AS term FROM toks),
      |  corpus AS (SELECT COUNT(*) AS n_docs,
      |                    CAST(SUM(LEN(t)) AS BIGINT) AS sum_dl FROM toks),
      |  matched AS (
      |    SELECT doc_id, term, dl, COUNT(*) AS tf FROM post
      |    WHERE term IN (SELECT DISTINCT term FROM qt)
      |    GROUP BY 1, 2, 3),
      |  dfreq AS (SELECT term, COUNT(*) AS df FROM matched GROUP BY 1),
      |  ts AS (
      |    SELECT qt.query_id, m.doc_id, m.term,
      |      LN(1.0::DOUBLE +
      |         (c.n_docs::DOUBLE - d.df::DOUBLE + 0.5::DOUBLE)
      |         / (d.df::DOUBLE + 0.5::DOUBLE))
      |      * (m.tf::DOUBLE * 2.2::DOUBLE)
      |      / (m.tf::DOUBLE + 1.2::DOUBLE *
      |         (0.25::DOUBLE + 0.75::DOUBLE *
      |          (m.dl::DOUBLE / (c.sum_dl::DOUBLE / c.n_docs::DOUBLE))))
      |        AS term_score
      |    FROM matched m JOIN dfreq d USING (term)
      |         JOIN qt ON m.term = qt.term CROSS JOIN corpus c),
      |  scored AS (
      |    SELECT query_id, doc_id,
      |      ROUND(list_reduce(
      |        list_prepend(0.0::DOUBLE, LIST(term_score ORDER BY term)),
      |        (a, x) -> a + x), 4) AS score
      |    FROM ts GROUP BY 1, 2)
      |  SELECT query_id, doc_id AS id,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |                       ORDER BY score DESC, doc_id) AS rank
      |  FROM scored
      |  QUALIFY rank <= 20),
      |vec AS MATERIALIZED (
      |  WITH qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      |  ranked AS (
      |    SELECT vec_id,
      |      ROUND(
      |        LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(embedding) + 1),
      |          i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))
      |        / SQRT(LIST_SUM(LIST_TRANSFORM(embedding,
      |            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |        / SQRT(LIST_SUM(LIST_TRANSFORM(qv,
      |            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
      |        6) AS cos
      |    FROM embeddings, qv
      |    ORDER BY cos DESC, vec_id ASC LIMIT 20)
      |  SELECT 'q0' AS query_id, vec_id AS id,
      |    ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS rank
      |  FROM ranked),
      |fused AS (
      |  SELECT COALESCE(a.query_id, b.query_id) AS query_id,
      |    COALESCE(a.id, b.id) AS id,
      |    (COALESCE(1000000 // (60 + a.rank), 0)
      |     + COALESCE(1000000 // (60 + b.rank), 0))::BIGINT AS rrf_micro,
      |    a.rank AS rank_a, b.rank AS rank_b
      |  FROM lex a FULL OUTER JOIN vec b
      |    ON a.query_id = b.query_id AND a.id = b.id)
      |SELECT query_id,
      |  ROW_NUMBER() OVER (PARTITION BY query_id
      |                     ORDER BY rrf_micro DESC, id) AS rank,
      |  id, rrf_micro, rank_a, rank_b
      |FROM fused
      |QUALIFY rank <= 10
      |ORDER BY rank""".stripMargin

  // ---------------------------------------------------------------- t19
  /** Fixed-window chunking with overlap (500-char windows every 400
    * chars): the RAG-index / long-context splitter. Chunk boundaries and
    * bytes are deterministic functions of the text, so the oracle
    * reproduces every chunk fingerprint; the dump carries md5 + length
    * instead of the chunk text to stay narrow. */
  def t19Chunking(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunkDocuments(docs(spark, dir), "doc_id", "text",
      size = 500, overlap = 100)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_start"),
        length(col("chunk")).cast("long").as("n_chars"),
        md5(col("chunk")).as("chunk_fp"))
      .orderBy("doc_id", "chunk_idx")

  val t19Sql: String =
    """WITH idx AS (
      |  SELECT doc_id, text,
      |    UNNEST(generate_series(0, (LENGTH(text) - 1) // 400)) AS i
      |  FROM documents
      |  WHERE LENGTH(text) > 0)
      |SELECT doc_id, i AS chunk_idx, (i * 400)::BIGINT AS chunk_start,
      |  LENGTH(SUBSTRING(text, (i * 400 + 1)::INT, 500))::BIGINT AS n_chars,
      |  MD5(SUBSTRING(text, (i * 400 + 1)::INT, 500)) AS chunk_fp
      |FROM idx ORDER BY doc_id, chunk_idx""".stripMargin

  // lazy: t21/t22's defs/Sqls are declared below this map (the file reads
  // in gate order); forcing happens at SparkEntry access, after object init
  // ---------------------------------------------------------------- t23
  /** BPE merge-candidate counting ([[TextAnalysis.bpePairCounts]]) — the
    * inner loop of tokenizer training: weighted adjacent-character-pair
    * counts over the word-frequency table (pair stats from DISTINCT words
    * × freq, the vocab-bounded trick every real BPE trainer uses — the
    * corpus is tokenized once, iterations touch only the vocabulary).
    * Top-20 pairs by (cnt DESC, pair ASC); the head row is the first
    * merge a trainer would apply. Pure integer counts over ASCII words ⇒
    * full mirror. */
  def t23BpePairs(spark: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.bpePairCounts(docs(spark, dir), "text",
      topK = 20)

  val t23Sql: String =
    """WITH w AS (
      |  SELECT UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')) AS word
      |  FROM documents WHERE TRIM(text) <> ''),
      |wf AS (
      |  SELECT word, COUNT(*) AS freq FROM w WHERE word <> '' GROUP BY 1),
      |p AS (
      |  SELECT word, freq,
      |    UNNEST(LIST_TRANSFORM(RANGE(1, LEN(word)),
      |      i -> SUBSTRING(word, i, 1) || ' ' || SUBSTRING(word, i + 1, 1)))
      |      AS pair
      |  FROM wf WHERE LEN(word) >= 2)
      |SELECT pair, SUM(freq)::BIGINT AS cnt,
      |  COUNT(DISTINCT word)::BIGINT AS n_words
      |FROM p GROUP BY 1
      |ORDER BY cnt DESC, pair ASC
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- t25
  /** ITERATED BPE training ([[graft.operators.TextAnalysis.bpeTrain]]) —
    * 10 rounds of t23's inner loop, i.e. the real tokenizer-training
    * algorithm: each round merges the top (cnt DESC, pair ASC) adjacent
    * symbol pair greedily left-to-right across the DISTINCT-word
    * (symbols, freq) state, so every round is corpus-size-independent.
    * The winning pair re-enters the plan by broadcast cross-join (never
    * through the driver) and the delimiter-wrapped symbol encoding makes
    * `replace` application EXACTLY greedy merge order in both engines.
    *
    * FULL oracle: the 10 rounds unrolled as chained CTEs — per round a
    * pair-count aggregate, a 1-row LIMIT winner, and the same
    * double-delimiter REPLACE on the state — then the winners unioned in
    * merge order. All integer counts over ASCII words ⇒ bit-exact. */
  def t25BpeMerges(spark: SparkSession, dir: String): DataFrame =
    trainedMerges(spark, dir).orderBy("merge_idx")

  /** The 10-merge trained tokenizer artifact t25 EMITS and t30 APPLIES —
    * one iterated training run (10 corpus passes of pair-count → winner →
    * replace) feeding both gates, memoized per (session, corpus) as a
    * shared checkpoint (the tradeGraph/neardupPairs discipline: a
    * production session trains once and every consumer reads the
    * artifact; re-training per query is pure waste). The cached value is
    * the materialized 10-row merge table. */
  private def trainedMerges(spark: SparkSession, dir: String): DataFrame =
    graft.SharedPrep.cached(spark, s"bpeMerges:$dir", dir) {
      graft.SharedPrep.checkpointShared(
        graft.operators.TextAnalysis.bpeTrain(docs(spark, dir), "text",
          merges = 10))
    }

  /** The shared BPE-training CTE chain (w → wf → st0 → 10 rounds of
    * sy/pc/m/st): t25 reads the merge tables m0..m9, t30 additionally
    * replays them over per-document states. */
  private val bpeTrainCtes: String = {
    val rounds = (0 until 10).map { r =>
      s"""sy$r AS (SELECT string_split(TRIM(st), '  ') AS s, freq FROM st$r),
         |pc$r AS (
         |  SELECT pair, SUM(freq)::BIGINT AS cnt FROM (
         |    SELECT freq, UNNEST(LIST_TRANSFORM(RANGE(1, LEN(s)),
         |      i -> s[i] || ' ' || s[i+1])) AS pair
         |    FROM sy$r) q
         |  GROUP BY 1),
         |m$r AS (
         |  SELECT $r::BIGINT AS merge_idx, pair, cnt FROM pc$r
         |  ORDER BY cnt DESC, pair ASC LIMIT 1),
         |st${r + 1} AS (
         |  SELECT REPLACE(st, ' ' || REPLACE(m.pair, ' ', '  ') || ' ',
         |                     ' ' || REPLACE(m.pair, ' ', '') || ' ') AS st,
         |         freq
         |  FROM st$r, m$r m)""".stripMargin
    }.mkString(",\n")
    s"""w AS (
       |  SELECT UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+')) AS word
       |  FROM documents WHERE TRIM(text) <> ''),
       |wf AS (
       |  SELECT word, COUNT(*) AS freq FROM w WHERE word <> '' GROUP BY 1),
       |st0 AS (
       |  SELECT ' ' || ARRAY_TO_STRING(string_split(word, ''), '  ') || ' '
       |           AS st, freq
       |  FROM wf),
       |$rounds""".stripMargin
  }

  val t25Sql: String = {
    val union = (0 until 10).map(r => s"SELECT * FROM m$r")
      .mkString(" UNION ALL ")
    s"""WITH $bpeTrainCtes
       |SELECT merge_idx, pair, REPLACE(pair, ' ', '') AS new_token, cnt
       |FROM ($union) allm
       |ORDER BY merge_idx""".stripMargin
  }

  // ---------------------------------------------------------------- t24
  /** Exact tie-aware ROC-AUC ([[graft.operators.EvalMetrics.rocAuc]]) of
    * the t13 hashed-classifier logit against a document-length label
    * (n_chars ≥ 300) — the eval primitive every filter in the pipeline
    * needs before its threshold goes to production. The sweep runs over
    * the DISTINCT-logit summary (never a data sort), 2U stays integer,
    * and AUC lands as one integer division — so the whole statistic,
    * ties included, mirrors bit-for-bit. The hash-random weights carry
    * no real length signal (AUC ≈ 0.5 here); the metric machinery, not
    * classifier quality, is what the gate pins — `EvalMetricsSpec`
    * hand-computes AUC on separable and tied corpora. */
  def t24ClassifierAuc(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val scores = classifierScores(spark, dir)
      .select(col("doc_id"), col("logit"))
    val labeled = scores.join(
      d.select(col("doc_id"), (col("n_chars") >= 300).as("label")), "doc_id")
    graft.operators.EvalMetrics.rocAuc(labeled, col("logit"), col("label"))
  }

  /** t13's logit mirror feeding the integer Mann-Whitney sweep. */
  val t24Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS t
      |  FROM documents WHERE TRIM(text) <> ''),
      |grams AS (
      |  SELECT doc_id, UNNEST(
      |    CASE WHEN LEN(t) >= 2 THEN
      |      t || LIST_TRANSFORM(RANGE(1, LEN(t)), i -> t[i] || ' ' || t[i+1])
      |    ELSE t END) AS g
      |  FROM toks),
      |feats AS (
      |  SELECT doc_id,
      |    CAST(list_reduce(
      |      list_prepend(14695981039346656037::HUGEINT,
      |        [unicode(c)::HUGEINT for c in string_split(g, '')]),
      |      (h, b) -> (xor(h, b) * 1099511628211::HUGEINT)
      |                  % 18446744073709551616::HUGEINT) % 4096 AS BIGINT)
      |      AS bucket,
      |    COUNT(*) AS cnt
      |  FROM grams GROUP BY 1, 2),
      |w AS (
      |  SELECT bucket, bucket * 2654435761 % 4294967296 % 17 - 8 AS weight
      |  FROM (SELECT UNNEST(RANGE(0, 4096)) AS bucket)),
      |scored AS (
      |  SELECT f.doc_id, CAST(SUM(cnt * weight) AS BIGINT) AS score
      |  FROM feats f JOIN w USING (bucket) GROUP BY 1),
      |lab AS (
      |  SELECT s.score, d.n_chars >= 300 AS label
      |  FROM scored s JOIN documents d USING (doc_id)),
      |bys AS (
      |  SELECT score, SUM(CASE WHEN label THEN 1 ELSE 0 END) AS pos,
      |         SUM(CASE WHEN label THEN 0 ELSE 1 END) AS neg
      |  FROM lab GROUP BY 1),
      |cum AS (
      |  SELECT score, pos, neg,
      |    COALESCE(SUM(neg) OVER (ORDER BY score
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnb
      |  FROM bys)
      |SELECT SUM(pos)::BIGINT AS n_pos, SUM(neg)::BIGINT AS n_neg,
      |  COUNT(*)::BIGINT AS n_scores,
      |  SUM(pos * (2 * cnb + neg))::BIGINT AS u2,
      |  (SUM(pos * (2 * cnb + neg))::HUGEINT * 500000
      |     // NULLIF(SUM(pos)::HUGEINT * SUM(neg), 0))::BIGINT AS auc_micro
      |FROM cum""".stripMargin

  // ---------------------------------------------------------------- t31
  /** Classifier RELIABILITY table ([[graft.operators.EvalMetrics
    * .reliabilityBins]]): the t13 hashed-feature logits, binned into 10
    * equal-width score bins over the observed range, each reporting its
    * observed positive rate (t24's `n_chars >= 300` label) and lift vs
    * the corpus base rate — the calibration diagram every deployed
    * quality filter needs before its threshold means anything. The
    * binning is deliberately equal-WIDTH (two broadcast-scalar passes,
    * no global ntile window — see the operator doc for the scale trap).
    * Logits, bin edges, counts, and ×10⁶ rates are all integers, so
    * the oracle replays the t13/t24 logit mirror plus the same integer
    * binning. */
  def t31Reliability(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val scores = classifierScores(spark, dir)
      .select(col("doc_id"), col("logit"))
    val labeled = scores.join(
      d.select(col("doc_id"), (col("n_chars") >= 300).as("label")), "doc_id")
    graft.operators.EvalMetrics.reliabilityBins(labeled, col("logit"),
      col("label"), bins = 10)
  }

  /** t13's logit mirror + the same integer equal-width binning. */
  val t31Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS t
      |  FROM documents WHERE TRIM(text) <> ''),
      |grams AS (
      |  SELECT doc_id, UNNEST(
      |    CASE WHEN LEN(t) >= 2 THEN
      |      t || LIST_TRANSFORM(RANGE(1, LEN(t)), i -> t[i] || ' ' || t[i+1])
      |    ELSE t END) AS g
      |  FROM toks),
      |feats AS (
      |  SELECT doc_id,
      |    CAST(list_reduce(
      |      list_prepend(14695981039346656037::HUGEINT,
      |        [unicode(c)::HUGEINT for c in string_split(g, '')]),
      |      (h, b) -> (xor(h, b) * 1099511628211::HUGEINT)
      |                  % 18446744073709551616::HUGEINT) % 4096 AS BIGINT)
      |      AS bucket,
      |    COUNT(*) AS cnt
      |  FROM grams GROUP BY 1, 2),
      |w AS (
      |  SELECT bucket, bucket * 2654435761 % 4294967296 % 17 - 8 AS weight
      |  FROM (SELECT UNNEST(RANGE(0, 4096)) AS bucket)),
      |scored AS (
      |  SELECT f.doc_id, CAST(SUM(cnt * weight) AS BIGINT) AS s
      |  FROM feats f JOIN w USING (bucket) GROUP BY 1),
      |lab AS (
      |  SELECT sc.s, CASE WHEN d.n_chars >= 300 THEN 1 ELSE 0 END AS y
      |  FROM scored sc JOIN documents d USING (doc_id)),
      |rng AS (
      |  SELECT MIN(s) AS glo, MAX(s) AS ghi,
      |    SUM(y) AS tot_pos, COUNT(*) AS tot FROM lab),
      |agg AS (
      |  SELECT CAST((s - glo)::HUGEINT * 10
      |              // ((ghi::HUGEINT - glo) + 1) AS BIGINT) AS bin,
      |    tot_pos, tot,
      |    COUNT(*) AS n, SUM(y) AS n_pos,
      |    MIN(s) AS lo_score, MAX(s) AS hi_score
      |  FROM lab, rng GROUP BY 1, 2, 3)
      |SELECT bin, n::BIGINT AS n, n_pos::BIGINT AS n_pos,
      |  lo_score::BIGINT AS lo_score, hi_score::BIGINT AS hi_score,
      |  (n_pos::HUGEINT * 1000000 // n)::BIGINT AS pos_rate_micro,
      |  (n_pos::HUGEINT * 1000000 // n
      |   - tot_pos::HUGEINT * 1000000 // tot)::BIGINT AS lift_micro
      |FROM agg ORDER BY bin""".stripMargin

  // ---------------------------------------------------------------- t32
  /** Threshold-selection table ([[graft.operators.EvalMetrics
    * .prThresholds]]): precision / recall / F1 of the t13 quality
    * classifier across 16 integer thresholds spanning its logit range —
    * the sweep that picks a deployed filter's cutoff (t24 says HOW WELL
    * the scores rank overall; this says WHERE to cut and what each cut
    * costs). One broadcast (min, max, total-positives) scalar pass, then
    * one map-side pass with a 16-row broadcast grid — never a
    * per-distinct-score window at corpus scale. All integer: thresholds
    * from integral divisions of the range, rates as ×10⁶ truncations,
    * F1 as the micro-space harmonic mean. */
  def t32PrCurve(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val scores = classifierScores(spark, dir)
      .select(col("doc_id"), col("logit"))
    val labeled = scores.join(
      d.select(col("doc_id"), (col("n_chars") >= 300).as("label")), "doc_id")
    graft.operators.EvalMetrics.prThresholds(labeled, col("logit"),
      col("label"), cuts = 16)
  }

  /** t13's logit mirror + the identical integer threshold grid. */
  val t32Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS t
      |  FROM documents WHERE TRIM(text) <> ''),
      |grams AS (
      |  SELECT doc_id, UNNEST(
      |    CASE WHEN LEN(t) >= 2 THEN
      |      t || LIST_TRANSFORM(RANGE(1, LEN(t)), i -> t[i] || ' ' || t[i+1])
      |    ELSE t END) AS g
      |  FROM toks),
      |feats AS (
      |  SELECT doc_id,
      |    CAST(list_reduce(
      |      list_prepend(14695981039346656037::HUGEINT,
      |        [unicode(c)::HUGEINT for c in string_split(g, '')]),
      |      (h, b) -> (xor(h, b) * 1099511628211::HUGEINT)
      |                  % 18446744073709551616::HUGEINT) % 4096 AS BIGINT)
      |      AS bucket,
      |    COUNT(*) AS cnt
      |  FROM grams GROUP BY 1, 2),
      |w AS (
      |  SELECT bucket, bucket * 2654435761 % 4294967296 % 17 - 8 AS weight
      |  FROM (SELECT UNNEST(RANGE(0, 4096)) AS bucket)),
      |scored AS (
      |  SELECT f.doc_id, CAST(SUM(cnt * weight) AS BIGINT) AS s
      |  FROM feats f JOIN w USING (bucket) GROUP BY 1),
      |lab AS (
      |  SELECT sc.s, CASE WHEN d.n_chars >= 300 THEN 1 ELSE 0 END AS y
      |  FROM scored sc JOIN documents d USING (doc_id)),
      |rng AS (
      |  SELECT MIN(s) AS glo, MAX(s) AS ghi, SUM(y) AS tot_pos FROM lab),
      |grid AS (
      |  SELECT cut,
      |    glo + CAST(cut * (ghi::HUGEINT - glo + 1) // 16 AS BIGINT)
      |      AS threshold,
      |    tot_pos
      |  FROM (SELECT UNNEST(RANGE(0, 16)) AS cut), rng),
      |agg AS (
      |  SELECT g.cut, g.threshold, g.tot_pos,
      |    COUNT(*) AS n_pred_pos, SUM(l.y) AS tp
      |  FROM lab l JOIN grid g ON l.s >= g.threshold
      |  GROUP BY 1, 2, 3),
      |rates AS (
      |  SELECT cut, threshold, n_pred_pos::BIGINT AS n_pred_pos,
      |    tp::BIGINT AS tp,
      |    (tp::HUGEINT * 1000000 // NULLIF(n_pred_pos, 0))::BIGINT
      |      AS precision_micro,
      |    (tp::HUGEINT * 1000000 // NULLIF(tot_pos, 0))::BIGINT
      |      AS recall_micro
      |  FROM agg)
      |SELECT cut, threshold, n_pred_pos, tp, precision_micro, recall_micro,
      |  (2 * precision_micro::HUGEINT * recall_micro
      |   // NULLIF(precision_micro + recall_micro, 0))::BIGINT AS f1_micro
      |FROM rates ORDER BY cut""".stripMargin

  // ---------------------------------------------------------------- t33
  /** Cohen's-kappa AGREEMENT audit ([[graft.operators.EvalMetrics
    * .agreementKappa]]): the t13 classifier's own keep verdict
    * (logit > 0) against the t24 length label — the chance-corrected
    * check run before swapping a cheap filter in for a trusted one
    * (raw agreement flatters whenever both lean the same way by base
    * rate; kappa subtracts that). One partial-agg pass to the 2×2
    * table; every output an exact integer or ×10⁶ integral division. */
  def t33Kappa(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val scores = classifierScores(spark, dir)
      .select(col("doc_id"), col("keep"))
    val labeled = scores.join(
      d.select(col("doc_id"), (col("n_chars") >= 300).as("label")), "doc_id")
    graft.operators.EvalMetrics.agreementKappa(labeled, col("keep"),
      col("label"))
  }

  /** Shared oracle CTE chain for the 2×2 classifier-vs-label gates
    * (t33 kappa, t35 balanced accuracy): t13's logit mirror, keep =
    * logit > 0, label = n_chars ≥ 300, folded to the one-row
    * contingency cells. One string so the two oracles cannot drift. */
  private def classifierCellsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS t
      |  FROM documents WHERE TRIM(text) <> ''),
      |grams AS (
      |  SELECT doc_id, UNNEST(
      |    CASE WHEN LEN(t) >= 2 THEN
      |      t || LIST_TRANSFORM(RANGE(1, LEN(t)), i -> t[i] || ' ' || t[i+1])
      |    ELSE t END) AS g
      |  FROM toks),
      |feats AS (
      |  SELECT doc_id,
      |    CAST(list_reduce(
      |      list_prepend(14695981039346656037::HUGEINT,
      |        [unicode(c)::HUGEINT for c in string_split(g, '')]),
      |      (h, b) -> (xor(h, b) * 1099511628211::HUGEINT)
      |                  % 18446744073709551616::HUGEINT) % 4096 AS BIGINT)
      |      AS bucket,
      |    COUNT(*) AS cnt
      |  FROM grams GROUP BY 1, 2),
      |w AS (
      |  SELECT bucket, bucket * 2654435761 % 4294967296 % 17 - 8 AS weight
      |  FROM (SELECT UNNEST(RANGE(0, 4096)) AS bucket)),
      |scored AS (
      |  SELECT f.doc_id, CAST(SUM(cnt * weight) AS BIGINT) > 0 AS ra
      |  FROM feats f JOIN w USING (bucket) GROUP BY f.doc_id),
      |lab AS (
      |  SELECT CASE WHEN sc.ra THEN 1 ELSE 0 END AS ra,
      |    CASE WHEN d.n_chars >= 300 THEN 1 ELSE 0 END AS rb
      |  FROM scored sc JOIN documents d USING (doc_id)),
      |cells AS (
      |  SELECT COUNT(*) AS n,
      |    SUM(CASE WHEN ra = 0 AND rb = 0 THEN 1 ELSE 0 END) AS n00,
      |    SUM(CASE WHEN ra = 0 AND rb = 1 THEN 1 ELSE 0 END) AS n01,
      |    SUM(CASE WHEN ra = 1 AND rb = 0 THEN 1 ELSE 0 END) AS n10,
      |    SUM(CASE WHEN ra = 1 AND rb = 1 THEN 1 ELSE 0 END) AS n11
      |  FROM lab)""".stripMargin

  /** The kappa arithmetic over [[classifierCellsSql]]. */
  val t33Sql: String =
    s"""$classifierCellsSql
      |SELECT n::BIGINT AS n, n00::BIGINT AS n00, n01::BIGINT AS n01,
      |  n10::BIGINT AS n10, n11::BIGINT AS n11,
      |  ((n00 + n11)::HUGEINT * 1000000 // NULLIF(n, 0))::BIGINT
      |    AS po_micro,
      |  (((n10 + n11)::HUGEINT * (n01 + n11)
      |    + (n00 + n01)::HUGEINT * (n00 + n10)) * 1000000
      |   // NULLIF(n::HUGEINT * n, 0))::BIGINT AS pe_micro,
      |  ((n::HUGEINT * (n00 + n11)
      |    - ((n10 + n11)::HUGEINT * (n01 + n11)
      |       + (n00 + n01)::HUGEINT * (n00 + n10))) * 1000000
      |   // NULLIF(n::HUGEINT * n
      |    - ((n10 + n11)::HUGEINT * (n01 + n11)
      |       + (n00 + n01)::HUGEINT * (n00 + n10)), 0))::BIGINT
      |    AS kappa_micro
      |FROM cells""".stripMargin

  // ---------------------------------------------------------------- t35
  /** Balanced accuracy + Youden's J of the hashed-feature quality filter
    * against the length label — the class-imbalance-proof companion to
    * t33's kappa, from the same one-pass 2×2 cells: raw accuracy would
    * reward always-keep on a skewed corpus; bacc/J weigh both classes
    * equally. Same corpus pass, same oracle CTE chain as t33. */
  def t35BalancedAccuracy(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val scores = classifierScores(spark, dir)
      .select(col("doc_id"), col("keep"))
    val labeled = scores.join(
      d.select(col("doc_id"), (col("n_chars") >= 300).as("label")), "doc_id")
    graft.operators.EvalMetrics.balancedAccuracy(labeled, col("keep"),
      col("label"))
  }

  /** The TPR/TNR arithmetic over [[classifierCellsSql]]; bacc and J are
    * two-stage truncations of the already-truncated micro rates,
    * mirroring the operator verbatim. */
  val t35Sql: String =
    s"""$classifierCellsSql,
      |rates AS (
      |  SELECT n, n00, n01, n10, n11,
      |    CAST(n11::HUGEINT * 1000000 // NULLIF(n11 + n01, 0) AS BIGINT)
      |      AS tpr_micro,
      |    CAST(n00::HUGEINT * 1000000 // NULLIF(n00 + n10, 0) AS BIGINT)
      |      AS tnr_micro
      |  FROM cells)
      |SELECT n::BIGINT AS n, n00::BIGINT AS n00, n01::BIGINT AS n01,
      |  n10::BIGINT AS n10, n11::BIGINT AS n11, tpr_micro, tnr_micro,
      |  CAST((tpr_micro + tnr_micro) // 2 AS BIGINT) AS bacc_micro,
      |  CAST(tpr_micro + tnr_micro - 1000000 AS BIGINT) AS youden_micro
      |FROM rates""".stripMargin

  // ---------------------------------------------------------------- t34
  /** Lexical-diversity report: per-doc type-token ratio folded into an
    * integer decile histogram (min(9, ⌊10·distinct/total⌋)). Low deciles
    * flag template/boilerplate spam, high deciles natural prose — the
    * standard corpus-composition report a filtering pipeline thresholds
    * on. Row-local tokenize + ONE ≤10-bucket partial agg; every count and
    * the division are integers, so the oracle mirrors bit-exactly. */
  def t34TtrDeciles(spark: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.ttrDeciles(docs(spark, dir), "text")
      .orderBy("ttr_decile")

  val t34Sql: String =
    """WITH tok AS (
      |  SELECT
      |    LEN(LIST_DISTINCT(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')))
      |      AS n_dist,
      |    LEN(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')) AS n_tot
      |  FROM documents WHERE LENGTH(TRIM(text)) > 0)
      |SELECT LEAST(9, (10 * n_dist) // n_tot)::BIGINT AS ttr_decile,
      |  COUNT(*)::BIGINT AS n_docs,
      |  SUM(n_dist)::BIGINT AS sum_distinct,
      |  SUM(n_tot)::BIGINT AS sum_tokens
      |FROM tok GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- t36
  /** Heaps-law vocabulary-growth curve over word BIGRAMS (same regime
    * choice as t14: the corpus has only 31 distinct unigrams, so bigrams
    * — ~916 types — are where growth is actually visible): 10 doc_id-range
    * prefixes, cumulative tokens and cumulative distinct vocabulary per
    * prefix. The report a tokenizer-budget decision reads: cum_vocab
    * still climbing in bucket 9 means the corpus has not saturated its
    * type inventory. All counts integral → bit-exact oracle. */
  def t36VocabGrowth(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabGrowth(docs(spark, dir), "doc_id", "text",
      buckets = 10, ngram = 2)

  val t36Sql: String =
    """WITH b AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi
      |           FROM documents),
      |d AS (
      |  SELECT text, LEAST(9, ((doc_id - lo) * 10) // (hi - lo + 1))
      |    AS bucket
      |  FROM documents, b),
      |toks AS (
      |  SELECT bucket, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS t
      |  FROM d WHERE TRIM(text) <> ''),
      |grams AS (
      |  SELECT bucket, UNNEST(
      |    CASE WHEN LEN(t) >= 2 THEN
      |      LIST_TRANSFORM(RANGE(1, LEN(t)), i -> t[i] || ' ' || t[i+1])
      |    ELSE [] END) AS word
      |  FROM toks),
      |tc AS (SELECT bucket, COUNT(*) AS toks FROM grams GROUP BY 1),
      |fw AS (SELECT MIN(bucket) AS bucket FROM grams GROUP BY word),
      |nw AS (SELECT bucket, COUNT(*) AS new_words FROM fw GROUP BY 1),
      |dc AS (SELECT bucket, COUNT(*) AS docs FROM d GROUP BY 1)
      |SELECT dc.bucket::BIGINT AS bucket, docs::BIGINT AS docs,
      |  COALESCE(new_words, 0)::BIGINT AS new_words,
      |  CAST(SUM(COALESCE(toks, 0)) OVER (ORDER BY dc.bucket) AS BIGINT)
      |    AS cum_tokens,
      |  CAST(SUM(COALESCE(new_words, 0)) OVER (ORDER BY dc.bucket)
      |    AS BIGINT) AS cum_vocab
      |FROM dc LEFT JOIN tc USING (bucket) LEFT JOIN nw USING (bucket)
      |ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- t37
  /** Zipf rank-frequency probe over word BIGRAMS (t14's regime choice —
    * the 916-type bigram inventory gives 10 populated octaves where the
    * 31 unigrams would give 5): frequency at ranks 1,2,4,…,512 and the
    * per-octave decay ratio. A flat decay_micro column is a power-law
    * corpus; spikes flag template/boilerplate mass. All-integer, so the
    * DuckDB mirror is bit-exact. */
  def t37ZipfProbe(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.zipfProbe(docs(spark, dir), "text",
      maxRank = 512, ngram = 2)

  val t37Sql: String =
    s"""WITH $bigramCountsSql,
      |probes AS (
      |  SELECT token_id AS rank, word, cnt FROM (
      |    SELECT word, cnt,
      |      ROW_NUMBER() OVER (ORDER BY cnt DESC, word ASC) AS token_id
      |    FROM (SELECT word, COUNT(*) AS cnt FROM grams GROUP BY 1))
      |  WHERE token_id <= 512 AND (token_id & (token_id - 1)) = 0)
      |SELECT rank::BIGINT AS rank, word, cnt::BIGINT AS cnt,
      |  CAST(cnt * 1000000 // LAG(cnt) OVER (ORDER BY rank) AS BIGINT)
      |    AS decay_micro
      |FROM probes ORDER BY rank""".stripMargin

  // ---------------------------------------------------------------- t38
  /** Per-source lexical DIVERSITY via the Gini–Simpson index over word
    * bigrams: D = 1 − Σ(c/N)² = (N² − Σc²)/N² — the entropy-style
    * corpus-composition number that is EXACTLY computable in integers
    * (Shannon entropy needs logs; Simpson doesn't), so the oracle is
    * bit-for-bit. Low D = template/boilerplate source, high D = diverse
    * prose. One (source, bigram) partial agg collapses the corpus, one
    * source-keyed agg computes the moments; Σc² runs in DECIMAL(38,0)
    * so a head bigram can't wrap at corpus scale. */
  def t38SimpsonDiversity(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.simpsonDiversity(docs(spark, dir), "source", "text",
      ngram = 2)
      .orderBy("source")

  val t38Sql: String =
    """WITH toks AS (
      |  SELECT source, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS t
      |  FROM documents WHERE TRIM(text) <> ''),
      |grams AS (
      |  SELECT source, UNNEST(
      |    CASE WHEN LEN(t) >= 2 THEN
      |      LIST_TRANSFORM(RANGE(1, LEN(t)), i -> t[i] || ' ' || t[i+1])
      |    ELSE [] END) AS word
      |  FROM toks),
      |cnt AS (
      |  SELECT source, word, COUNT(*)::BIGINT AS c
      |  FROM grams GROUP BY 1, 2),
      |m AS (
      |  SELECT source, COUNT(*)::BIGINT AS n_types,
      |    SUM(c)::BIGINT AS n_tokens,
      |    SUM(c::HUGEINT * c) AS sum_c2
      |  FROM cnt GROUP BY 1)
      |SELECT source, n_types, n_tokens,
      |  CAST((n_tokens::HUGEINT * n_tokens - sum_c2) * 1000000
      |    // (n_tokens::HUGEINT * n_tokens) AS BIGINT) AS simpson_micro
      |FROM m ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- t39
  /** Per-source READABILITY profile — the Flesch-style feature pair
    * (words/sentence, syllables/word) every quality classifier consumes,
    * kept integral: sentences = terminal-punctuation runs (min 1 for
    * non-empty text), syllables ≈ vowel GROUPS (the standard cheap
    * estimator), both plain regexp_count projections inside codegen, and
    * the two ratios emitted as micro-scaled integral divisions. One
    * row-local pass + one source-keyed partial agg. */
  def t39Readability(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).filter(trim(col("text")) =!= "")
    val words = TextAnalysis.tokenCount(col("text"))
    val sents = greatest(lit(1L),
      expr("regexp_count(text, '[.!?]+')").cast("bigint"))
    val vgroups = expr("regexp_count(lower(text), '[aeiouy]+')")
      .cast("bigint")
    d.select(col("source"), words.as("w"), sents.as("s"),
        vgroups.as("v"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("words"),
        sum(col("s")).as("sentences"), sum(col("v")).as("vowel_groups"))
      .select(col("source"), col("n_docs"), col("words"),
        col("sentences"), col("vowel_groups"),
        expr("""cast((cast(words as decimal(38,0)) * 1000000)
                 div sentences as bigint)""").as("wps_micro"),
        expr("""cast((cast(vowel_groups as decimal(38,0)) * 1000000)
                 div words as bigint)""").as("spw_micro"))
      .orderBy("source")
  }

  val t39Sql: String =
    """WITH d AS (
      |  SELECT source,
      |    LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+'))::BIGINT AS w,
      |    GREATEST(1, LEN(REGEXP_EXTRACT_ALL(text, '[.!?]+')))::BIGINT
      |      AS s,
      |    LEN(REGEXP_EXTRACT_ALL(LOWER(text), '[aeiouy]+'))::BIGINT AS v
      |  FROM documents WHERE TRIM(text) <> ''),
      |m AS (
      |  SELECT source, COUNT(*)::BIGINT AS n_docs,
      |    SUM(w)::BIGINT AS words, SUM(s)::BIGINT AS sentences,
      |    SUM(v)::BIGINT AS vowel_groups
      |  FROM d GROUP BY 1)
      |SELECT source, n_docs, words, sentences, vowel_groups,
      |  CAST(words::HUGEINT * 1000000 // sentences AS BIGINT)
      |    AS wps_micro,
      |  CAST(vowel_groups::HUGEINT * 1000000 // words AS BIGINT)
      |    AS spw_micro
      |FROM m ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- t40
  /** BOILERPLATE-PREFIX census — template headers are the dedup mode
    * near-dup pairs miss (the body differs, only the opening is
    * stamped): group documents by their first-8-token prefix and report
    * every prefix shared by ≥ 2 docs with its doc count, token mass,
    * and source spread. One row-local prefix projection + one
    * prefix-keyed partial agg; the report is bounded by the number of
    * repeated templates, not the corpus. */
  def t40BoilerplatePrefixes(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).filter(trim(col("text")) =!= "")
    val toks = split(lower(trim(col("text"))), "\\s+")
    d.select(col("source"),
        TextAnalysis.tokenCount(col("text")).as("toks"),
        concat_ws(" ", slice(toks, 1, 8)).as("prefix"))
      .groupBy("prefix")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("token_mass"),
        countDistinct(col("source")).as("n_sources"))
      .filter(col("n_docs") >= 2)
      .orderBy("prefix")
  }

  val t40Sql: String =
    """WITH d AS (
      |  SELECT source,
      |    LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+'))::BIGINT AS toks,
      |    ARRAY_TO_STRING(
      |      STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')[1:8], ' ')
      |      AS prefix
      |  FROM documents WHERE TRIM(text) <> '')
      |SELECT prefix, COUNT(*)::BIGINT AS n_docs,
      |  SUM(toks)::BIGINT AS token_mass,
      |  COUNT(DISTINCT source)::BIGINT AS n_sources
      |FROM d GROUP BY 1 HAVING COUNT(*) >= 2
      |ORDER BY prefix""".stripMargin

  // ---------------------------------------------------------------- t41
  /** LANG-ID EVALUATION — the confusion matrix of the stopword
    * heuristic (t02) against the corpus's own `lang` labels, the
    * measurement that decides whether the cheap labeler is good enough
    * to route documents at ingest. Each cell carries its label-row
    * share (recall on the diagonal) and prediction-column share
    * (precision on the diagonal) in micro units. One corpus pass
    * collapses to ≤ (|langs|+1)² cells; the share windows run over that
    * tiny table, never the corpus. */
  def t41LangIdEval(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cm = docs(spark, dir)
      .select(col("lang").as("lang_label"),
        TextAnalysis.langId(col("text")).as("lang_pred"))
      .groupBy("lang_label", "lang_pred")
      .agg(count(lit(1)).as("n"))
    cm.withColumn("label_total",
        sum(col("n")).over(Window.partitionBy("lang_label")))
      .withColumn("pred_total",
        sum(col("n")).over(Window.partitionBy("lang_pred")))
      .select(col("lang_label"), col("lang_pred"), col("n"),
        expr("""cast((cast(n as decimal(38,0)) * 1000000)
                 div label_total as bigint)""").as("label_share_micro"),
        expr("""cast((cast(n as decimal(38,0)) * 1000000)
                 div pred_total as bigint)""").as("pred_share_micro"))
      .orderBy("lang_label", "lang_pred")
  }

  val t41Sql: String =
    s"""WITH $langIdPredCte,
       |cm AS (
       |  SELECT lang_label, lang_pred, COUNT(*)::BIGINT AS n
       |  FROM pred GROUP BY 1, 2)
       |SELECT lang_label, lang_pred, n,
       |  CAST(n::HUGEINT * 1000000
       |       // SUM(n) OVER (PARTITION BY lang_label) AS BIGINT)
       |    AS label_share_micro,
       |  CAST(n::HUGEINT * 1000000
       |       // SUM(n) OVER (PARTITION BY lang_pred) AS BIGINT)
       |    AS pred_share_micro
       |FROM cm ORDER BY lang_label, lang_pred""".stripMargin

  // ---------------------------------------------------------------- t42
  /** SCRIPT / CHARACTER-CLASS census per source — the corpus
    * composition profile (ASCII letters vs digits vs whitespace vs
    * everything else, which at web scale means markup, symbols, and
    * non-Latin scripts) that catches an ingest regression — a crawler
    * suddenly shipping markup or mojibake shifts these shares before
    * any quality score moves. Counts come from length deltas of
    * class-stripped text (row-local, codegen'd); one source-keyed
    * partial agg collapses the corpus; shares are integral micro with
    * DECIMAL(38,0) headroom so a 100-TB source can't overflow. */
  def t42ScriptCensus(spark: SparkSession, dir: String): DataFrame = {
    def stripped(re: String) =
      (length(col("text")) - length(regexp_replace(col("text"), re, "")))
        .cast("bigint")
    docs(spark, dir)
      .select(col("source"),
        length(col("text")).cast("bigint").as("chars"),
        stripped("[A-Za-z]").as("letters"),
        stripped("[0-9]").as("digits"),
        // explicit class, NOT \s: Java \s and DuckDB's RE2 \s disagree on
        // U+000B (vertical tab), which would flip a doc's ws/other split
        // between the two engines and break the gate hash
        stripped("[\\t\\n\\x0B\\f\\r ]").as("ws"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("chars")).as("chars"),
        sum(col("letters")).as("letters"),
        sum(col("digits")).as("digits"),
        sum(col("ws")).as("ws"))
      .select(col("source"), col("n_docs"), col("chars"), col("letters"),
        col("digits"), col("ws"),
        (col("chars") - col("letters") - col("digits") - col("ws"))
          .as("other"),
        micro("letters"), micro("digits"), micro("ws"),
        expr("""cast((cast(chars - letters - digits - ws as decimal(38,0))
                      * 1000000) div chars as bigint)""").as("other_micro"))
      .orderBy("source")
  }

  private def micro(c: String): Column =
    expr(s"cast((cast($c as decimal(38,0)) * 1000000) div chars as bigint)")
      .as(s"${c}_micro")

  val t42Sql: String =
    """WITH d AS (
      |  SELECT source, LENGTH(text)::BIGINT AS chars,
      |    (LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[A-Za-z]', '', 'g')))::BIGINT AS letters,
      |    (LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[0-9]', '', 'g')))::BIGINT AS digits,
      |    (LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[\t\n\x0B\f\r ]', '', 'g')))::BIGINT AS ws
      |  FROM documents),
      |m AS (
      |  SELECT source, COUNT(*)::BIGINT AS n_docs,
      |    SUM(chars)::BIGINT AS chars, SUM(letters)::BIGINT AS letters,
      |    SUM(digits)::BIGINT AS digits, SUM(ws)::BIGINT AS ws
      |  FROM d GROUP BY 1)
      |SELECT source, n_docs, chars, letters, digits, ws,
      |  (chars - letters - digits - ws)::BIGINT AS other,
      |  CAST(letters::HUGEINT * 1000000 // chars AS BIGINT) AS letters_micro,
      |  CAST(digits::HUGEINT * 1000000 // chars AS BIGINT) AS digits_micro,
      |  CAST(ws::HUGEINT * 1000000 // chars AS BIGINT) AS ws_micro,
      |  CAST((chars - letters - digits - ws)::HUGEINT * 1000000 // chars
      |       AS BIGINT) AS other_micro
      |FROM m ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- t43
  /** TOKENIZER FERTILITY by language — subwords per whitespace word and
    * chars per subword, the pair every multilingual-tokenizer evaluation
    * reports (a language whose fertility spikes is being shredded into
    * per-character pieces and will train badly at a fixed context
    * length). Per-doc counts are the SAME codegen'd expressions t05
    * gates per-doc (the oracle shares the t05 CTE verbatim); one
    * lang-keyed map-side partial agg collapses the corpus, micro ratios
    * are integral divisions over the ≤|langs| summary. */
  def t43Fertility(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(col("lang"),
      length(col("text")).cast("bigint").as("n_chars"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"),
      TextAnalysis.subwordCount(col("text")).as("n_subwords"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_subwords")).as("n_subwords"),
        sum(col("n_chars")).as("n_chars"))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        col("n_subwords"), col("n_chars"),
        expr("""cast((cast(n_subwords as decimal(38,0)) * 1000000)
                 div nullif(n_tokens, 0) as bigint)""")
          .as("subwords_per_token_micro"),
        expr("""cast((cast(n_chars as decimal(38,0)) * 1000000)
                 div nullif(n_subwords, 0) as bigint)""")
          .as("chars_per_subword_micro"))
      .orderBy("lang")

  val t43Sql: String =
    s"""WITH $subwordTokCte,
       |agg AS (
       |  SELECT lang, COUNT(*)::BIGINT AS n_docs,
       |    SUM(n_tokens)::BIGINT AS n_tokens,
       |    SUM(n_subwords)::BIGINT AS n_subwords,
       |    SUM(n_chars)::BIGINT AS n_chars
       |  FROM tok GROUP BY 1)
       |SELECT lang, n_docs, n_tokens, n_subwords, n_chars,
       |  CAST(n_subwords::HUGEINT * 1000000
       |       // NULLIF(n_tokens, 0) AS BIGINT) AS subwords_per_token_micro,
       |  CAST(n_chars::HUGEINT * 1000000
       |       // NULLIF(n_subwords, 0) AS BIGINT) AS chars_per_subword_micro
       |FROM agg ORDER BY lang""".stripMargin

  lazy val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "t43_fertility" -> (t43Fertility _, t43Sql),
    "t42_script_census" -> (t42ScriptCensus _, t42Sql),
    "t41_langid_eval" -> (t41LangIdEval _, t41Sql),
    "t40_boilerplate_prefixes" -> (t40BoilerplatePrefixes _, t40Sql),
    "t39_readability" -> (t39Readability _, t39Sql),
    "t38_simpson_diversity" -> (t38SimpsonDiversity _, t38Sql),
    "t37_zipf_probe" -> (t37ZipfProbe _, t37Sql),
    "t36_vocab_growth" -> (t36VocabGrowth _, t36Sql),
    "t35_balanced_accuracy" -> (t35BalancedAccuracy _, t35Sql),
    "t34_ttr_deciles" -> (t34TtrDeciles _, t34Sql),
    "t33_kappa" -> (t33Kappa _, t33Sql),
    "t32_pr_curve" -> (t32PrCurve _, t32Sql),
    "t31_reliability" -> (t31Reliability _, t31Sql),
    "t24_classifier_auc" -> (t24ClassifierAuc _, t24Sql),
    "t25_bpe_merges" -> (t25BpeMerges _, t25Sql),
    "t23_bpe_pairs" -> (t23BpePairs _, t23Sql),
    "t01_token_stats" -> (t01TokenStats _, t01Sql),
    "t09_keywords" -> (t09Keywords _, t09Sql),
    "t10_domain_stats" -> (t10DomainStats _, t10Sql),
    "t02_lang_id" -> (t02LangId _, t02Sql),
    "t03_quality" -> (t03Quality _, t03Sql),
    "t04_fingerprint" -> (t04Fingerprint _, t04Sql),
    "t05_subword_stats" -> (t05SubwordStats _, t05Sql),
    "t06_fnv_fingerprint" -> (t06FnvFingerprint _, t06Sql),
    "t07_repetition" -> (t07Repetition _, t07Sql),
    "t08_pii_scrub" -> (t08PiiScrub _, t08Sql),
    "t11_url_canon" -> (t11UrlCanon _, t11Sql),
    "t12_gopher_filter" -> (t12GopherFilter _, t12Sql),
    "t13_quality_classifier" -> (t13QualityClassifier _, t13Sql),
    "t14_vocabulary" -> (t14Vocabulary _, t14Sql),
    "t15_oov_rate" -> (t15OovRate _, t15Sql),
    "t16_bm25" -> (t16Bm25 _, t16Sql),
    "t17_unigram_surprise" -> (t17UnigramSurprise _, t17Sql),
    "t18_domain_divergence" -> (t18DomainDivergence _, t18Sql),
    "t19_chunking" -> (t19Chunking _, t19Sql),
    "t20_hybrid_retrieval" -> (t20HybridRetrieval _, t20Sql),
    "t21_bigram_surprise" -> (t21BigramSurprise _, t21Sql),
    "t22_dsir_weights" -> (t22DsirWeights _, t22Sql),
    "t26_kneser_ney" -> (t26KneserNey _, t26Sql),
    "t27_burstiness" -> (t27Burstiness _, t27Sql),
    "t28_vocab_coverage" -> (t28VocabCoverage _, t28Sql),
    "t29_effective_tokens" -> (t29EffectiveTokens _, t29Sql),
    "t30_bpe_encode" -> (t30BpeEncode _, t30Sql),
  )

  // ---------------------------------------------------------------- t21
  /** Bigram LM perplexity-bucket scoring
    * ([[TextAnalysis.bigramSurprise]]): the reference LM trains on the
    * ¾ of the corpus with doc_id % 4 ≠ 0 and every document is charged
    * integer bits per bigram, with 4-bit-penalty unigram backoff for
    * bigrams the LM never saw — held-out docs genuinely exercise the
    * backoff and OOV-floor paths. Every charge is integral, so the
    * oracle replays them all bit-for-bit. */
  def t21BigramSurprise(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    TextAnalysis.bigramSurprise(
      d.filter(pmod(col("doc_id"), lit(4)) =!= 0), d, "doc_id", "text")
      .orderBy("doc_id")
  }

  val t21Sql: String =
    """WITH lm AS (
      |  SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS t
      |  FROM documents WHERE doc_id % 4 <> 0 AND TRIM(text) <> ''),
      |sc AS (
      |  SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS t
      |  FROM documents WHERE TRIM(text) <> ''),
      |c1 AS (
      |  SELECT w, COUNT(*) AS c1
      |  FROM (SELECT UNNEST(t) AS w FROM lm) WHERE w <> '' GROUP BY 1),
      |n AS (SELECT SUM(c1)::BIGINT AS n_total FROM c1),
      |c2 AS (
      |  SELECT w1, w2, COUNT(*) AS c2
      |  FROM (SELECT UNNEST(t[1:LEN(t)-1]) AS w1, UNNEST(t[2:LEN(t)]) AS w2
      |        FROM lm)
      |  WHERE w1 <> '' AND w2 <> '' GROUP BY 1, 2),
      |bgb AS (
      |  SELECT w1, w2,
      |    (LENGTH(BIN(CAST(c1.c1 // c2.c2 AS BIGINT))) - 1)::BIGINT AS bg_bits
      |  FROM c2 JOIN c1 ON c1.w = c2.w1),
      |ugb AS (
      |  SELECT w,
      |    (LENGTH(BIN(CAST(n_total // c1 AS BIGINT))) - 1)::BIGINT AS ug_bits
      |  FROM c1 CROSS JOIN n),
      |mx AS (SELECT (LENGTH(BIN(CAST(n_total AS BIGINT))) - 1)::BIGINT
      |         AS max_bits FROM n),
      |doc_bg AS (
      |  SELECT doc_id, UNNEST(t[1:LEN(t)-1]) AS w1, UNNEST(t[2:LEN(t)]) AS w2
      |  FROM sc),
      |scored AS (
      |  SELECT d.doc_id,
      |    CASE WHEN bgb.bg_bits IS NOT NULL THEN bgb.bg_bits
      |         ELSE 4 + COALESCE(ugb.ug_bits, mx.max_bits) END AS bits,
      |    CASE WHEN bgb.bg_bits IS NULL THEN 1 ELSE 0 END AS oov
      |  FROM doc_bg d
      |  LEFT JOIN bgb ON bgb.w1 = d.w1 AND bgb.w2 = d.w2
      |  LEFT JOIN ugb ON ugb.w = d.w2
      |  CROSS JOIN mx
      |  WHERE d.w1 <> '' AND d.w2 <> '')
      |SELECT doc_id, COUNT(*) AS n_bigrams, SUM(oov)::BIGINT AS oov_bigrams,
      |  SUM(bits)::BIGINT AS surprise_bits,
      |  ((SUM(bits) * 1000) // COUNT(*))::BIGINT AS mean_millibits
      |FROM scored GROUP BY 1 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t22
  /** DSIR importance weights ([[TextAnalysis.dsirWeights]]): every doc
    * scored by log p_target − log p_raw over hashed-unigram LMs, target =
    * the English slice — the importance-resampling signal for steering a
    * raw crawl toward a target domain. All charges are integer bit
    * lengths over FNV-hashed buckets (t13's verified fold), so the
    * oracle replays the full computation; non-English docs genuinely
    * exercise the target-LM backoff floor. */
  def t22DsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    TextAnalysis.dsirWeights(d, d.filter(col("lang") === "en"),
      "doc_id", "text")
      .orderBy("doc_id")
  }

  val t22Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang,
      |    UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')) AS w
      |  FROM documents WHERE TRIM(text) <> ''),
      |b AS (
      |  SELECT doc_id, lang,
      |    CAST(list_reduce(
      |      list_prepend(14695981039346656037::HUGEINT,
      |        [unicode(c)::HUGEINT for c in string_split(w, '')]),
      |      (h, x) -> (xor(h, x) * 1099511628211::HUGEINT)
      |                  % 18446744073709551616::HUGEINT) % 4096 AS BIGINT)
      |      AS bucket
      |  FROM toks),
      |raw_lm AS (SELECT bucket, COUNT(*) AS cnt FROM b GROUP BY 1),
      |raw_n AS (SELECT SUM(cnt)::BIGINT AS n FROM raw_lm),
      |tgt_lm AS (SELECT bucket, COUNT(*) AS cnt FROM b WHERE lang = 'en'
      |           GROUP BY 1),
      |tgt_n AS (SELECT SUM(cnt)::BIGINT AS n FROM tgt_lm),
      |feats AS (SELECT doc_id, bucket, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
      |scored AS (
      |  SELECT f.doc_id, f.cnt,
      |    (LENGTH(BIN(CAST(rn.n // r.cnt AS BIGINT))) - 1)::BIGINT AS rb,
      |    COALESCE(LENGTH(BIN(CAST(tn.n // t.cnt AS BIGINT))) - 1,
      |             LENGTH(BIN(tn.n)) - 1 + 4)::BIGINT AS tb
      |  FROM feats f
      |  JOIN raw_lm r USING (bucket) CROSS JOIN raw_n rn
      |  LEFT JOIN tgt_lm t USING (bucket) CROSS JOIN tgt_n tn)
      |SELECT doc_id, SUM(cnt)::BIGINT AS n_tokens,
      |  SUM(cnt * rb)::BIGINT AS raw_bits,
      |  SUM(cnt * tb)::BIGINT AS target_bits,
      |  (SUM(cnt * rb) - SUM(cnt * tb))::BIGINT AS logw_bits,
      |  ((SUM(cnt * rb) - SUM(cnt * tb)) * 1000 // SUM(cnt))::BIGINT
      |    AS mean_millibits,
      |  SUM(cnt * rb) - SUM(cnt * tb) > 0 AS keep
      |FROM scored GROUP BY 1 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t26
  /** Kneser–Ney smoothed bigram LM scoring
    * ([[TextAnalysis.knBigramScore]]): the LM trains on the t21 split
    * (doc_id % 4 ≠ 0) and every document is scored by its average KN
    * bigram probability — the genuinely smoothed upgrade of t21's
    * bucketed backoff, with continuation counts doing the work Kneser–
    * Ney is famous for. Held-out docs (doc_id % 4 = 0) exercise the
    * unseen-bigram discount path, the unseen-context backoff, and the
    * unseen-continuation pseudo-type. Every per-bigram probability is a
    * fixed IEEE formula over integer counts and accumulates as
    * ROUND(p·10¹²) BIGINT — the oracle replays every charge exactly. */
  def t26KneserNey(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    TextAnalysis.knBigramScore(
      d.filter(pmod(col("doc_id"), lit(4)) =!= 0), d, "doc_id", "text")
      .orderBy("doc_id")
  }

  val t26Sql: String =
    """WITH lm AS (
      |  SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS t
      |  FROM documents WHERE doc_id % 4 <> 0 AND TRIM(text) <> ''),
      |sc AS (
      |  SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS t
      |  FROM documents WHERE TRIM(text) <> ''),
      |c2 AS (
      |  SELECT w1, w2, COUNT(*) AS c2
      |  FROM (SELECT UNNEST(t[1:LEN(t)-1]) AS w1, UNNEST(t[2:LEN(t)]) AS w2
      |        FROM lm)
      |  WHERE w1 <> '' AND w2 <> '' GROUP BY 1, 2),
      |ctx AS (SELECT w1, SUM(c2)::BIGINT AS cw, COUNT(*)::BIGINT AS n1fwd
      |        FROM c2 GROUP BY 1),
      |cont AS (SELECT w2, COUNT(*)::BIGINT AS ncont FROM c2 GROUP BY 1),
      |nt AS (SELECT COUNT(*)::BIGINT AS ntypes FROM c2),
      |doc_bg AS (
      |  SELECT doc_id, UNNEST(t[1:LEN(t)-1]) AS w1, UNNEST(t[2:LEN(t)]) AS w2
      |  FROM sc),
      |scored AS (
      |  SELECT d.doc_id,
      |    CASE WHEN ctx.cw IS NULL THEN 1 ELSE 0 END AS unseen,
      |    ROUND((CASE WHEN ctx.cw IS NULL
      |      THEN COALESCE(cont.ncont::DOUBLE, 0.5) / nt.ntypes::DOUBLE
      |      ELSE GREATEST(COALESCE(c2.c2, 0)::DOUBLE * 4.0 - 3.0, 0.0)
      |             / (ctx.cw::DOUBLE * 4.0)
      |           + ((3.0 * ctx.n1fwd::DOUBLE) / (ctx.cw::DOUBLE * 4.0))
      |             * (COALESCE(cont.ncont::DOUBLE, 0.5) / nt.ntypes::DOUBLE)
      |      END) * 1e12)::BIGINT AS p_fix
      |  FROM doc_bg d
      |  LEFT JOIN c2 ON c2.w1 = d.w1 AND c2.w2 = d.w2
      |  LEFT JOIN ctx ON ctx.w1 = d.w1
      |  LEFT JOIN cont ON cont.w2 = d.w2
      |  CROSS JOIN nt
      |  WHERE d.w1 <> '' AND d.w2 <> '')
      |SELECT doc_id, COUNT(*) AS n_bigrams, SUM(unseen)::BIGINT AS unseen_ctx,
      |  SUM(p_fix)::BIGINT AS kn_sum_fix,
      |  (SUM(p_fix) // COUNT(*))::BIGINT AS kn_avg_fix
      |FROM scored GROUP BY 1 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t27
  /** Term burstiness profile ([[TextAnalysis.burstiness]]): the Fano
    * factor of per-document term counts (zeros included) over the whole
    * corpus — the Church–Gale statistic that separates topical content
    * words (which clump, variance ≫ mean) from evenly-spread glue. The
    * division is an exact ×10⁶-scaled DECIMAL integer division, so the
    * oracle replays it in HUGEINT with the same truncate-toward-zero
    * `//` semantics; the numerator is non-negative by Cauchy–Schwarz, so
    * truncation and floor agree. */
  def t27Burstiness(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.burstiness(docs(spark, dir), "text",
      minDf = 20L, topK = 50)

  val t27Sql: String =
    """WITH base AS (
      |  SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS t
      |  FROM documents WHERE TRIM(text) <> ''),
      |tok AS (
      |  SELECT doc_id, UNNEST(t) AS word FROM base),
      |perdoc AS (
      |  SELECT word, doc_id, COUNT(*) AS c FROM tok
      |  WHERE word <> '' GROUP BY 1, 2),
      |perterm AS (
      |  SELECT word, COUNT(*) AS df, SUM(c)::BIGINT AS tf,
      |    SUM(c * c)::BIGINT AS sumsq
      |  FROM perdoc GROUP BY 1 HAVING COUNT(*) >= 20),
      |tot AS (SELECT COUNT(*)::BIGINT AS n_docs FROM base)
      |SELECT word, df, tf,
      |  CAST(((n_docs::HUGEINT * sumsq - tf::HUGEINT * tf) * 1000000)
      |       // (n_docs::HUGEINT * tf) AS BIGINT) AS burst_micro
      |FROM perterm, tot
      |ORDER BY burst_micro DESC, word ASC LIMIT 50""".stripMargin

  // ---------------------------------------------------------------- t28
  /** Vocabulary coverage curve ([[TextAnalysis.vocabCoverage]]): word
    * types needed to reach 50/90/99% of corpus token mass — the exact
    * Zipf-health numbers a tokenizer-sizing decision reads. Every value
    * is an integer (counts, ranks) or an exact scaled division, so the
    * oracle replays the ranked cumulative sum and the argmin prefix
    * bit-for-bit. */
  def t28VocabCoverage(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabCoverage(docs(spark, dir), "text")
      .orderBy("target_pct")

  val t28Sql: String =
    """WITH toks AS (
      |  SELECT STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS t
      |  FROM documents WHERE TRIM(text) <> ''),
      |counts AS (
      |  SELECT word, COUNT(*)::BIGINT AS cnt
      |  FROM (SELECT UNNEST(t) AS word FROM toks)
      |  WHERE word <> '' GROUP BY 1),
      |ranked AS (
      |  SELECT word, cnt,
      |    ROW_NUMBER() OVER (ORDER BY cnt DESC, word ASC) AS rank,
      |    SUM(cnt) OVER (ORDER BY cnt DESC, word ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM counts),
      |tot AS (SELECT SUM(cnt)::BIGINT AS total_tokens,
      |               COUNT(*)::BIGINT AS vocab_size FROM counts),
      |tgt AS (SELECT UNNEST([50, 90, 99]) AS target_pct)
      |SELECT target_pct::BIGINT AS target_pct,
      |  MIN(vocab_size) AS vocab_size,
      |  MIN(total_tokens) AS total_tokens,
      |  MIN(rank)::BIGINT AS types_needed,
      |  CAST((MIN(cum)::HUGEINT * 1000000) // MIN(total_tokens)
      |       AS BIGINT) AS mass_micro
      |FROM ranked, tot, tgt
      |WHERE cum * 100 >= target_pct * total_tokens
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- t29
  /** EFFECTIVE dataset size per source — raw token counts discounted by
    * d21's soft-dedup weights (1/cluster_size over the near-dup closure):
    * the "how many tokens do we REALLY have" number an LLM data team
    * tracks, where 50 copies of a boilerplate page count once. Exact
    * integers end to end: per-doc effective mass is the truncated
    * (tokens·10⁶) div cluster_size, summed per source, and
    * `retained_micro` is the integral effective/raw ratio (NULL for a
    * token-free source, both engines).
    *
    * Scale shape: the cluster sizing rides the d12 closure (banded
    * candidate generation, never all-pairs); the rollup is one partial
    * agg keyed by source. */
  def t29EffectiveTokens(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val labels = DedupQueries.neardupClusters(spark, dir)
    val sized = labels.join(
      labels.groupBy("cluster_id").agg(count(lit(1)).as("cs")),
      "cluster_id")
      .select(col("doc_id"), col("cs"))
    d.select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).as("toks"))
      .join(sized, Seq("doc_id"), "left")
      .withColumn("cs", coalesce(col("cs"), lit(1L)))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("raw_tokens"),
        expr("""cast(sum((cast(toks as decimal(38,0)) * 1000000) div cs)
                 as bigint)""").as("eff_tokens_micro"))
      .withColumn("retained_micro",
        expr("eff_tokens_micro div nullif(raw_tokens, 0)"))
      .orderBy("source")
  }

  val t29Sql: String =
    s"""WITH labels AS (
       |${DedupQueries.all("d12_dedup_clusters")._2.linesIterator
            .map("  " + _).mkString("\n")}
       |),
       |sz AS (SELECT cluster_id, COUNT(*) AS n FROM labels
       |       GROUP BY cluster_id),
       |base AS (
       |  SELECT d.doc_id, d.source,
       |    (CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
       |          ELSE LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+'))
       |     END)::BIGINT AS toks,
       |    COALESCE(sz.n, 1)::BIGINT AS cs
       |  FROM documents d
       |  LEFT JOIN labels l ON d.doc_id = l.doc_id
       |  LEFT JOIN sz ON l.cluster_id = sz.cluster_id)
       |SELECT source, COUNT(*) AS n_docs, SUM(toks)::BIGINT AS raw_tokens,
       |  CAST(SUM((toks::HUGEINT * 1000000) // cs) AS BIGINT)
       |    AS eff_tokens_micro,
       |  CAST(SUM((toks::HUGEINT * 1000000) // cs)
       |       // NULLIF(SUM(toks), 0) AS BIGINT) AS retained_micro
       |FROM base GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- t30
  /** BPE ENCODE at corpus scale ([[TextAnalysis.bpeEncodeCounts]]): the
    * 10 merges t25 trains, applied to every document — per-doc word,
    * character, and BPE-token counts plus the exact compression ratio.
    * Train → apply is the full tokenizer lifecycle; the oracle reuses
    * t25's m0..m9 merge CTEs verbatim and replays the same 10
    * left-to-right replaces over per-document word states, so every
    * count mirrors bit-for-bit. */
  def t30BpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    TextAnalysis.bpeEncodeCounts(d, "doc_id", "text",
      trainedMerges(spark, dir), 10)
      .orderBy("doc_id")
  }

  val t30Sql: String = {
    val applyRounds = (0 until 10).map { r =>
      s"""e${r + 1} AS (
         |  SELECT doc_id, REPLACE(st, ' ' || REPLACE(m.pair, ' ', '  ') || ' ',
         |                             ' ' || REPLACE(m.pair, ' ', '') || ' ')
         |           AS st
         |  FROM e$r, m$r m)""".stripMargin
    }.mkString(",\n")
    s"""WITH $bpeTrainCtes,
       |dw AS (
       |  SELECT doc_id,
       |    UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+')) AS word
       |  FROM documents WHERE TRIM(text) <> ''),
       |e0 AS (
       |  SELECT doc_id,
       |    ' ' || ARRAY_TO_STRING(string_split(word, ''), '  ') || ' ' AS st
       |  FROM dw WHERE word <> ''),
       |$applyRounds
       |SELECT doc_id, COUNT(*) AS n_words,
       |  SUM(LENGTH(REPLACE(st, ' ', '')))::BIGINT AS n_chars,
       |  SUM((LENGTH(TRIM(st)) - LENGTH(REPLACE(TRIM(st), '  ', '')))
       |      // 2 + 1)::BIGINT AS n_tokens_bpe,
       |  CAST((SUM((LENGTH(TRIM(st)) - LENGTH(REPLACE(TRIM(st), '  ', '')))
       |            // 2 + 1)::HUGEINT * 1000000)
       |       // SUM(LENGTH(REPLACE(st, ' ', ''))) AS BIGINT)
       |    AS compression_micro
       |FROM e10 GROUP BY 1 ORDER BY 1""".stripMargin
  }
}

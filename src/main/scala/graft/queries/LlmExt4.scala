package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Dedup, TextAnalysis}

/** Round-4 (late) web-corpus ingestion coverage: incremental dedup
  * against an existing corpus, HTML/markup stripping, and URL/domain
  * extraction — the steps between a crawl and the cleaning pipeline. */
object LlmExt4 {

  /** q84 — E2: INCREMENTAL near-dup detection — a new batch (fresh
    * docs + planted mutations of corpus docs) checked against the
    * existing corpus without ever re-pairing corpus×corpus. The oracle
    * computes the exact thresholded cross-side Jaccard ground truth
    * (q45's recall argument: 16 bands × 1 row makes LSH recall
    * structural at threshold 0.8). */
  val q84 = Declared(
    "q84_incremental_dedup", "E2",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val corpus = docs.filter(col("doc_id") < 200).select(col("doc_id"), col("text"))
      val fresh = docs.filter(col("doc_id") >= 200 && col("doc_id") < 300)
        .select(col("doc_id"), col("text"))
      val mutated = docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 500000).as("doc_id"),
          concat(col("text"), lit(" freshcrawltoken")).as("text"))
      Dedup.minhashNearDuplicatesAgainst(corpus, fresh.unionByName(mutated),
        "text", "doc_id", shingleSize = 3, numHashes = 16, bands = 16, threshold = 0.8)
        .select(col("id_corpus"), col("id_new"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("id_corpus"), col("id_new"))
    },
    Some("""WITH corpus AS (
           |  SELECT doc_id, text FROM documents WHERE doc_id < 200),
           |newb AS (
           |  SELECT doc_id, text FROM documents WHERE doc_id >= 200 AND doc_id < 300
           |  UNION ALL
           |  SELECT doc_id + 500000, text || ' freshcrawltoken'
           |  FROM documents WHERE doc_id < 50),
           |tc AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks FROM corpus),
           |tn AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks FROM newb),
           |sc AS (SELECT DISTINCT doc_id, array_to_string(list_slice(toks, i, i + 2), ' ') AS sh
           |       FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
           |             FROM tc WHERE len(toks) >= 3)),
           |sn AS (SELECT DISTINCT doc_id, array_to_string(list_slice(toks, i, i + 2), ' ') AS sh
           |       FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
           |             FROM tn WHERE len(toks) >= 3)),
           |cc AS (SELECT doc_id, count(*) AS n FROM sc GROUP BY doc_id),
           |cn AS (SELECT doc_id, count(*) AS n FROM sn GROUP BY doc_id),
           |i AS (SELECT sc.doc_id AS id_corpus, sn.doc_id AS id_new, count(*) AS inter
           |      FROM sc JOIN sn ON sc.sh = sn.sh
           |      GROUP BY 1, 2)
           |SELECT id_corpus, id_new,
           |  round(CAST(inter AS DOUBLE) / (cc.n + cn.n - inter), 6) AS jaccard
           |FROM i JOIN cc ON i.id_corpus = cc.doc_id JOIN cn ON i.id_new = cn.doc_id
           |WHERE CAST(inter AS DOUBLE) / (cc.n + cn.n - inter) >= 0.8
           |ORDER BY id_corpus, id_new""".stripMargin),
    "The corpus side's signatures are computed ONCE (production stores them); each new " +
      "batch costs only its own sketching + a band equi-join against the stored index — " +
      "the economics that make daily-crawl dedup feasible at 100TB (never re-pair the corpus).")

  /** q85 — E4: HTML/markup stripping. The corpus is wrapped in
    * deterministic markup (tags, a script block, entities) with
    * identical string construction on both engines; the stripped TEXT
    * is hash-compared. Patterns are negated-class-only, so Java regex
    * and RE2 agree span-for-span. */
  val q85 = Declared(
    "q85_strip_html", "E4",
    (s, dir) => {
      val wrapped = Tables.documents(s, dir).filter(col("doc_id") < 200)
        .select(col("doc_id"), concat(
          lit("<html><body><h1 class=\"t\">Doc "), col("doc_id").cast("string"),
          lit("</h1><p>"), col("text"),
          lit("</p><script type=\"text/javascript\">var x = 1;</script>"),
          lit("<div id=\"f\">&amp; fine &lt;tag&gt; &quot;quoted&quot; &#39;s</div></body></html>"))
          .as("t"))
      wrapped.select(col("doc_id"), TextAnalysis.stripMarkup(col("t")).as("cleaned"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH w AS (
           |  SELECT doc_id,
           |    '<html><body><h1 class="t">Doc ' || CAST(doc_id AS VARCHAR) ||
           |    '</h1><p>' || text ||
           |    '</p><script type="text/javascript">var x = 1;</script>' ||
           |    '<div id="f">&amp; fine &lt;tag&gt; &quot;quoted&quot; &#39;s</div></body></html>' AS t
           |  FROM documents WHERE doc_id < 200)
           |SELECT doc_id,
           |  trim(regexp_replace(
           |    replace(replace(replace(replace(replace(
           |      regexp_replace(
           |        regexp_replace(t, '<script[^>]*>[^<]*</script>', ' ', 'g'),
           |        '<[^>]*>', ' ', 'g'),
           |      '&amp;', '&'), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
           |    '\s+', ' ', 'g')) AS cleaned
           |FROM w
           |ORDER BY doc_id""".stripMargin),
    "Scan-side regexp chain, no shuffle — HTML-to-text is the entry cost of every web " +
      "corpus and it runs at scan bandwidth here.")

  /** q86 — E4/E7: URL host + registrable-domain extraction feeding a
    * per-domain profile (what domain caps and URL dedup key on).
    * Deterministic URLs are planted per doc; extraction is a portable
    * capture-group regex. */
  val q86 = Declared(
    "q86_url_domain", "E4,E7",
    (s, dir) => {
      val urls = Tables.documents(s, dir)
        .select(col("doc_id"), concat(
          lit("https://sub"), (col("doc_id") % 5).cast("string"),
          lit(".site"), (col("doc_id") % 7).cast("string"),
          lit(".example/path/"), col("doc_id").cast("string"),
          lit("?ref=x")).as("url"))
      urls.select(TextAnalysis.urlHost(col("url")).as("host"),
          TextAnalysis.urlDomain(col("url")).as("domain"))
        .groupBy(col("domain"), col("host"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("domain"), col("host"))
    },
    Some("""WITH u AS (
           |  SELECT 'https://sub' || CAST(doc_id % 5 AS VARCHAR) || '.site' ||
           |         CAST(doc_id % 7 AS VARCHAR) || '.example/path/' ||
           |         CAST(doc_id AS VARCHAR) || '?ref=x' AS url
           |  FROM documents),
           |h AS (
           |  SELECT regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host
           |  FROM u),
           |d AS (
           |  SELECT host, regexp_extract(host, '([a-z0-9-]+\.[a-z]+)$', 1) AS domain
           |  FROM h)
           |SELECT domain, host, count(*) AS n_docs
           |FROM d GROUP BY domain, host
           |ORDER BY domain, host""".stripMargin),
    "Pure scan-side extraction; the domain becomes the mixing/cap/dedup key downstream " +
      "(q64's cap, q80's budgets) — bounded-output profile agg.")

  val all: Seq[Declared] = Seq(q84, q85, q86)
}

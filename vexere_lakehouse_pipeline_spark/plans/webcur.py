"""Web-corpus curation: PII scrubbing, HTML-to-text extraction,
Gopher-style quality rules, and domain-level curation.

Third north-star layer over the ``documents`` table (no reference
analog — BASELINE.json extension surface, like plans/corpus.py): the
passes a web-scale pre-training pipeline runs between "raw crawl" and
"quality filtering" — strip markup, scrub personally-identifiable
strings, apply the published Gopher repetition/shape rules, and
aggregate per-domain statistics against a curation blocklist.

Scale notes (100 TB): every operator here is a single narrow
projection or one hash aggregation — no joins except the broadcast
blocklist join in domain curation, no shuffles except the per-domain
groupBy (domain cardinality ~ millions, far below doc cardinality, so
partial aggregation collapses the map side).  All string work is
JVM-native Column expressions inside WholeStageCodegen — zero Python.

Portability rules (oracle gate): the synthesized PII/markup inputs are
built from doc_id arithmetic with explicit CASTs so Spark and DuckDB
construct byte-identical strings; all regexes use the RE2-and-Java
common subset (no \\b, no backrefs, no lookaround); entity decoding
uses literal replace(), not regex, so replacement-string metacharacter
rules ('$' in Java, '\\0' in RE2) never apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.catalog import load_table
from vexere_lakehouse_pipeline_spark.functions.text import (
    LANG_STOPWORDS,
    normalize_unicode,
    normalize_unicode_sql,
    stopword_hits,
    stopword_hits_sql,
    tokenize,
)
from vexere_lakehouse_pipeline_spark.operators import dedup
from vexere_lakehouse_pipeline_spark.plans.star import QueryFn
from vexere_lakehouse_pipeline_spark.plans.star_ml import (
    _DUCK_COS,
    _DUCK_EMB,
    _DUCK_TOKENS,
    _duck_sub_split,
)

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# PII scrub report — email / phone / IPv4 redaction with per-doc counts.
#
# The documents table is synthetic word salad with no real PII, so the
# query synthesizes a deterministic PII tail per doc (same doc_id
# arithmetic on both engines — the silver_conform_chain pattern) and
# then runs the production scrub: sequential redaction email -> IPv4 ->
# phone, counting each pattern on the text as it exists at that stage
# (counting all three on the raw text would double-count the digits
# inside an email's host or an IP inside a URL).
#
# Plan shape: one projection, zero shuffles; the regex chain is
# codegen'd.  At 100 TB this is the canonical embarrassingly-parallel
# scan — cost is pure CPU, no exchange.
# ---------------------------------------------------------------------------

# RE2-and-Java common subset (no \b / lookaround).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
PHONE_RE = r"0[0-9]{8,10}"


def scrub_pii_report(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Sequential PII redaction with stage-accurate counts.

    Returns the input plus ``n_emails/n_ips/n_phones`` (matches counted
    on the text at the stage each rule runs) and ``scrubbed`` (the
    fully-redacted text).  Pure Column expressions — safe in any plan.
    """
    t0 = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t0, F.lit(EMAIL_RE), 0)).cast("long")
    t1 = F.regexp_replace(t0, EMAIL_RE, "<EMAIL>")
    n_ips = F.size(F.regexp_extract_all(t1, F.lit(IPV4_RE), 0)).cast("long")
    t2 = F.regexp_replace(t1, IPV4_RE, "<IP>")
    n_phones = F.size(F.regexp_extract_all(t2, F.lit(PHONE_RE), 0)).cast("long")
    t3 = F.regexp_replace(t2, PHONE_RE, "<PHONE>")
    return df.withColumns(
        {
            "n_emails": n_emails,
            "n_ips": n_ips,
            "n_phones": n_phones,
            "scrubbed": t3,
        }
    )


# Deterministic PII tail appended to each doc's text (both engines
# build the identical string from doc_id arithmetic).
def _pii_text_spark() -> F.Column:
    d = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.lit(" user"),
        d.cast("string"),
        F.lit("@mail"),
        (d % 7).cast("string"),
        F.lit(".example.com tel 09"),
        F.lpad((d % 10000000).cast("string"), 7, "0"),
        F.lit(" ip "),
        (d % 256).cast("string"),
        F.lit("."),
        ((d * 7) % 256).cast("string"),
        F.lit(".0.1"),
        # every third doc carries a second address so the per-pattern
        # counts VARY (a uniform count couldn't catch a count-once bug)
        F.when(
            d % 3 == 0,
            F.concat(F.lit(" cc admin"), d.cast("string"), F.lit("@ex.org")),
        ).otherwise(F.lit("")),
    )


_PII_TEXT_SQL = (
    "text || ' user' || CAST(doc_id AS VARCHAR)"
    " || '@mail' || CAST(doc_id % 7 AS VARCHAR)"
    " || '.example.com tel 09' || lpad(CAST(doc_id % 10000000 AS VARCHAR), 7, '0')"
    " || ' ip ' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) || '.0.1'"
    " || CASE WHEN doc_id % 3 = 0"
    " THEN ' cc admin' || CAST(doc_id AS VARCHAR) || '@ex.org'"
    " ELSE '' END"
)


@_register(
    "text_pii_scrub_report",
    f"""
    WITH raw AS (
        SELECT doc_id, {_PII_TEXT_SQL} AS text FROM documents
    ),
    s1 AS (
        SELECT doc_id, text,
               CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
               regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g') AS t1
        FROM raw
    ),
    s2 AS (
        SELECT doc_id, n_emails,
               CAST(len(regexp_extract_all(t1, '{IPV4_RE}')) AS BIGINT) AS n_ips,
               regexp_replace(t1, '{IPV4_RE}', '<IP>', 'g') AS t2
        FROM s1
    )
    SELECT doc_id, n_emails, n_ips,
           CAST(len(regexp_extract_all(t2, '{PHONE_RE}')) AS BIGINT) AS n_phones,
           regexp_replace(t2, '{PHONE_RE}', '<PHONE>', 'g') AS scrubbed
    FROM s2 ORDER BY doc_id
    """,
)
def text_pii_scrub_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.select("doc_id", _pii_text_spark().alias("text"))
    return scrub_pii_report(seeded).select(
        "doc_id", "n_emails", "n_ips", "n_phones", "scrubbed"
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# HTML-to-text extraction — the markup-strip pass between "crawl WARC"
# and every text operator in this engine.  Tag strip (regex, RE2-safe)
# -> literal entity decode (replace(), so no replacement-metacharacter
# divergence) -> whitespace squeeze.  One projection, zero shuffles.
# ---------------------------------------------------------------------------

TAG_RE = r"<[^>]*>"
# '&amp;' must decode LAST: decoding it first turns nested escapes like
# '&amp;lt;' into '&lt;' which a later pass wrongly decodes to '<'
# (correct HTML entity decoding yields the literal text '&lt;').
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&amp;", "&")]


def html_to_text(col: F.Column) -> F.Column:
    """Strip tags, decode the common entities, squeeze whitespace."""
    out = F.regexp_replace(col, TAG_RE, " ")
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def _html_to_text_sql(expr: str) -> str:
    out = f"regexp_replace({expr}, '{TAG_RE}', ' ', 'g')"
    for ent, ch in _ENTITIES:
        lit = ch.replace("'", "''")
        out = f"replace({out}, '{ent}', '{lit}')"
    return f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"


def _html_raw_spark() -> F.Column:
    d = F.col("doc_id").cast("string")
    return F.concat(
        F.lit('<div id="d'),
        d,
        F.lit('"><p class="t">'),
        F.col("text"),
        F.lit('</p><br/>&amp; <a href="https://ex.com/'),
        d,
        F.lit('">link&lt;tail&gt;</a></div>'),
    )


_HTML_RAW_SQL = (
    "'<div id=\"d' || CAST(doc_id AS VARCHAR) || '\"><p class=\"t\">' || text"
    " || '</p><br/>&amp; <a href=\"https://ex.com/' || CAST(doc_id AS VARCHAR)"
    " || '\">link&lt;tail&gt;</a></div>'"
)


@_register(
    "text_html_strip",
    f"""
    WITH raw AS (SELECT doc_id, {_HTML_RAW_SQL} AS html FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(html, '{TAG_RE}')) AS BIGINT) AS n_tags,
           {_html_to_text_sql('html')} AS clean_text
    FROM raw ORDER BY doc_id
    """,
)
def text_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select("doc_id", _html_raw_spark().alias("html"))
    return raw.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("html"), F.lit(TAG_RE), 0))
        .cast("long")
        .alias("n_tags"),
        html_to_text(F.col("html")).alias("clean_text"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Gopher-style quality rules (Rae et al. 2021, table A1 — the shape
# subset that applies to single-line synthetic docs; thresholds on word
# count adapted to this corpus' 10-99-word range so the gate actually
# splits it).  All flags from one projection; `pass` is the AND.  The
# repetition-based Gopher rules live in corpus_repetition_scores.
# ---------------------------------------------------------------------------

_G_MIN_WORDS, _G_MAX_WORDS = 50, 100_000
_G_MIN_WLEN, _G_MAX_WLEN = 3.0, 10.0
_G_MIN_ALPHA = 0.8
_G_MIN_STOP = 2


@_register(
    "corpus_gopher_quality_flags",
    f"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                    x -> x <> '')) AS BIGINT) AS wc,
               CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT)
                   AS chars_no_ws,
               CAST(len(list_filter(string_split_regex(text, '\\s+'),
                        x -> x <> '' AND regexp_matches(x, '\\p{{L}}')))
                    AS BIGINT) AS alpha_words,
               CAST({stopword_hits_sql('text', LANG_STOPWORDS['en'])} AS BIGINT)
                   AS stop_hits
        FROM documents
    )
    SELECT doc_id, wc,
           ROUND(chars_no_ws * 1.0 / wc, 4) AS mean_wlen,
           ROUND(alpha_words * 1.0 / wc, 4) AS alpha_frac,
           stop_hits,
           wc BETWEEN {_G_MIN_WORDS} AND {_G_MAX_WORDS} AS flag_word_count,
           chars_no_ws * 1.0 / wc BETWEEN {_G_MIN_WLEN} AND {_G_MAX_WLEN}
               AS flag_word_len,
           alpha_words * 1.0 / wc >= {_G_MIN_ALPHA} AS flag_alpha,
           stop_hits >= {_G_MIN_STOP} AS flag_stop,
           (wc BETWEEN {_G_MIN_WORDS} AND {_G_MAX_WORDS})
               AND (chars_no_ws * 1.0 / wc BETWEEN {_G_MIN_WLEN} AND {_G_MAX_WLEN})
               AND (alpha_words * 1.0 / wc >= {_G_MIN_ALPHA})
               AND (stop_hits >= {_G_MIN_STOP}) AS pass
    FROM t ORDER BY doc_id
    """,
)
def corpus_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ws_tokens = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    wc = F.size(ws_tokens).cast("long")
    chars_no_ws = F.length(F.regexp_replace(F.col("text"), r"\s+", "")).cast(
        "long"
    )
    alpha_words = F.size(
        F.filter(ws_tokens, lambda t: t.rlike(r"\p{L}"))
    ).cast("long")
    stop_hits = stopword_hits(F.lower("text"), LANG_STOPWORDS["en"]).cast(
        "long"
    )
    mean_wlen = chars_no_ws * F.lit(1.0) / wc
    alpha_frac = alpha_words * F.lit(1.0) / wc
    f_wc = wc.between(_G_MIN_WORDS, _G_MAX_WORDS)
    f_wlen = mean_wlen.between(_G_MIN_WLEN, _G_MAX_WLEN)
    f_alpha = alpha_frac >= _G_MIN_ALPHA
    f_stop = stop_hits >= _G_MIN_STOP
    return docs.select(
        "doc_id",
        wc.alias("wc"),
        F.round(mean_wlen, 4).alias("mean_wlen"),
        F.round(alpha_frac, 4).alias("alpha_frac"),
        stop_hits.alias("stop_hits"),
        f_wc.alias("flag_word_count"),
        f_wlen.alias("flag_word_len"),
        f_alpha.alias("flag_alpha"),
        f_stop.alias("flag_stop"),
        (f_wc & f_wlen & f_alpha & f_stop).alias("pass"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Domain-level curation — per-domain stats + blocklist flag.  URL is
# synthesized from (source, doc_id) arithmetic (the documents table has
# no url column); domain extraction is a regex capture group, stats are
# ONE hash aggregation on domain (cardinality << docs, partial agg
# collapses the map side), and the blocklist is an explicitly
# broadcast left join — at 100 TB the blocklist is a curated list of
# maybe 10^5 domains, always broadcastable.
# ---------------------------------------------------------------------------

DOMAIN_RE = r"https?://([^/]+)/"
_BLOCKLIST = (
    "www.src0-3.example.com",
    "www.src7-3.example.com",
    "www.src19-9.example.com",
)

_URL_SQL = (
    "'https://www.' || source || '-' || CAST(doc_id % 13 AS VARCHAR)"
    " || '.example.com/p/' || CAST(doc_id AS VARCHAR)"
)


def _url_spark() -> F.Column:
    return F.concat(
        F.lit("https://www."),
        F.col("source"),
        F.lit("-"),
        (F.col("doc_id") % 13).cast("string"),
        F.lit(".example.com/p/"),
        F.col("doc_id").cast("string"),
    )


@_register(
    "corpus_domain_curation",
    f"""
    WITH u AS (
        SELECT doc_id, lang, n_chars, {_URL_SQL} AS url FROM documents
    ),
    d AS (
        SELECT regexp_extract(url, '{DOMAIN_RE}', 1) AS domain,
               lang, n_chars
        FROM u
    ),
    agg AS (
        SELECT domain,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               ROUND(AVG(n_chars), 2) AS avg_chars,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        FROM d GROUP BY domain
    )
    SELECT agg.domain, n_docs, avg_chars, n_langs,
           b.domain IS NOT NULL AS blocked
    FROM agg LEFT JOIN (VALUES {', '.join(f"('{b}')" for b in _BLOCKLIST)})
        AS b(domain) ON agg.domain = b.domain
    ORDER BY agg.domain
    """,
)
def corpus_domain_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    block = F.broadcast(
        docs.sparkSession.createDataFrame(
            [(b,) for b in _BLOCKLIST], "blocked_domain string"
        )
    )
    agg = (
        docs.select(
            F.regexp_extract(_url_spark(), DOMAIN_RE, 1).alias("domain"),
            "lang",
            "n_chars",
        )
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.count_distinct("lang").alias("n_langs"),
        )
    )
    return (
        agg.join(block, agg["domain"] == block["blocked_domain"], "left")
        .select(
            "domain",
            "n_docs",
            "avg_chars",
            "n_langs",
            F.col("blocked_domain").isNotNull().alias("blocked"),
        )
        .orderBy("domain")
    )


# ---------------------------------------------------------------------------
# SemDeDup — semantic dedup survivors (operators/dedup.py:
# semantic_dedup_survivors).  The oracle blocks on the deterministic
# `label` column (at scale the block is a trained k-means cluster id;
# that path's recall/shape is pinned in tests) and replays the whole
# pairs -> connected-components -> min-id-survivor pipeline as a
# recursive CTE — any bug in the blocked join, the threshold, label
# propagation, or survivor selection breaks the hash.
# ---------------------------------------------------------------------------

_SEMDEDUP_TAU = 0.3


@_register(
    "dedup_semdedup_survivors",
    f"""
    WITH RECURSIVE e AS ({_DUCK_EMB}),
    bc AS (SELECT label, COUNT(*) AS bn FROM e GROUP BY label),
    ek AS (SELECT e.*, {_duck_sub_split("e.vec_id", "bc.bn",
                                        dedup.MAX_EMB_BLOCK_SIZE)} AS sub
           FROM e JOIN bc USING (label)),
    pairs AS (
        SELECT a.vec_id AS u, b.vec_id AS v
        FROM ek a JOIN ek b ON a.label = b.label AND a.sub = b.sub
                            AND a.vec_id < b.vec_id
        WHERE {_DUCK_COS.format(a="a.v", b="b.v")} >= {_SEMDEDUP_TAU}
    ),
    undirected AS (
        SELECT u, v FROM pairs UNION SELECT v, u FROM pairs
    ),
    reach(u, v) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM undirected)
        UNION
        SELECT r.u, e2.v FROM reach r JOIN undirected e2 ON e2.u = r.v
    ),
    comp AS (SELECT u AS vec_id, MIN(v) AS component_id FROM reach GROUP BY u)
    SELECT emb.vec_id,
           COALESCE(c.component_id, emb.vec_id) AS component_id,
           emb.vec_id = COALESCE(c.component_id, emb.vec_id) AS is_survivor
    FROM embeddings emb LEFT JOIN comp c ON c.vec_id = emb.vec_id
    ORDER BY emb.vec_id
    """,
)
def dedup_semdedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return dedup.semantic_dedup_survivors(
        emb, threshold=_SEMDEDUP_TAU
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# Sentence-level dedup (C4 / CCNet style): split each doc into
# fixed-width token "sentences", count each sentence's corpus-wide
# frequency, drop the boilerplate ones (frequency > threshold), and
# reassemble the surviving text in order.
#
# Plan shape at 100 TB (the industrial shape C4 used): explode to the
# sentence table [no shuffle], frequency = ONE hash aggregation on the
# sentence hash (partial agg collapses the map side), join sentences
# to their frequency [shuffle on hash — both sides already hash-
# partitioned from the agg], reassemble = ONE aggregation on doc_id.
# Per-doc sentence totals come from arithmetic on the token count, not
# a second scan or count.
# ---------------------------------------------------------------------------

_SENT_W = 4          # tokens per sentence
_SENT_MAX_FREQ = 2   # sentences seen more often than this are dropped


@_register(
    "corpus_sentence_dedup",
    f"""
    WITH t AS (SELECT doc_id,
                      list_filter(string_split_regex(lower(text),
                                  '[^\\p{{L}}\\p{{N}}]+'), x -> x <> '') AS w
               FROM documents),
    nc AS (SELECT doc_id, w,
                  CAST(ceil(len(w) * 1.0 / {_SENT_W}) AS BIGINT) AS n_sents
           FROM t WHERE len(w) > 0),
    ex AS (SELECT doc_id, n_sents,
                  CAST(unnest(range(0, n_sents)) AS BIGINT) AS sent_idx,
                  array_to_string(
                      w[CAST(unnest(range(0, n_sents)) AS BIGINT) * {_SENT_W} + 1
                        : CAST(unnest(range(0, n_sents)) AS BIGINT) * {_SENT_W} + {_SENT_W}],
                      ' ') AS sent
           FROM nc),
    freq AS (SELECT md5(sent) AS h, COUNT(*) AS c FROM ex GROUP BY md5(sent)),
    kept AS (SELECT ex.doc_id, ex.n_sents, ex.sent_idx, ex.sent
             FROM ex JOIN freq ON md5(ex.sent) = freq.h
             WHERE freq.c <= {_SENT_MAX_FREQ})
    SELECT nc.doc_id,
           nc.n_sents,
           nc.n_sents - COALESCE(k.n_kept, 0) AS n_dropped,
           COALESCE(k.clean_text, '') AS clean_text
    FROM nc LEFT JOIN (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
               string_agg(sent, ' ' ORDER BY sent_idx) AS clean_text
        FROM kept GROUP BY doc_id
    ) k ON k.doc_id = nc.doc_id
    ORDER BY nc.doc_id
    """,
)
def corpus_sentence_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = (
        docs.select("doc_id", tokenize("text").alias("w"))
        .withColumn("n", F.size("w").cast("long"))
        .filter(F.col("n") > 0)
    )
    nc = t.withColumn(
        "n_sents", F.ceil(F.col("n") * 1.0 / _SENT_W).cast("long")
    )
    ex = nc.select(
        "doc_id",
        "n_sents",
        F.explode(F.expr("sequence(0, n_sents - 1)")).alias("sent_idx"),
        F.col("w"),
    ).select(
        "doc_id",
        "n_sents",
        F.col("sent_idx").cast("long").alias("sent_idx"),
        F.array_join(
            F.slice(F.col("w"), F.col("sent_idx") * _SENT_W + 1, _SENT_W), " "
        ).alias("sent"),
    )
    freq = ex.groupBy(F.md5("sent").alias("h")).agg(F.count("*").alias("c"))
    kept = (
        ex.join(freq, F.md5(ex.sent) == freq.h)
        .filter(F.col("c") <= _SENT_MAX_FREQ)
        .select("doc_id", "sent_idx", "sent")
    )
    re = kept.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sent_idx", "sent"))),
                lambda s: s.sent,
            ),
            " ",
        ).alias("clean_text"),
    )
    return (
        nc.select("doc_id", "n_sents")
        .join(re, on="doc_id", how="left")
        .select(
            "doc_id",
            "n_sents",
            (F.col("n_sents") - F.coalesce(F.col("n_kept"), F.lit(0))).alias(
                "n_dropped"
            ),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Multimodal audio plumbing through the oracle gate: a deterministic
# 8-bit PCM WAV payload is synthesized per doc (Arrow-batched Python —
# this IS the binary-column path), decoded by the zero-dependency
# wav_decode through extract_audio_stats (mapInPandas), and the oracle
# recomputes every integer stat closed-form from the same doc_id
# arithmetic — so a bug anywhere in encode, chunk walking, or the
# Arrow batch shape breaks the hash.  The image twin is
# multimodal_payload_stats (BMP, plans/star_ml.py).
# ---------------------------------------------------------------------------

_WAV_RATE = 8000


@_register(
    "multimodal_wav_stats",
    f"""
    WITH t AS (
        SELECT doc_id AS media_id,
               64 + doc_id % 64 AS n,
               list_transform(range(0, 64 + doc_id % 64),
                              i -> (doc_id * 31 + i * 7) % 256) AS s
        FROM documents
    )
    SELECT media_id,
           {_WAV_RATE} AS sample_rate,
           1 AS n_channels,
           8 AS bits,
           CAST(n AS BIGINT) AS n_samples,
           CAST(n * 1000 // {_WAV_RATE} AS BIGINT) AS duration_ms,
           CAST(list_aggregate(s, 'sum') AS BIGINT) AS sum_samples,
           CAST(list_aggregate(s, 'max') AS INTEGER) AS peak
    FROM t ORDER BY media_id
    """,
)
def multimodal_wav_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from vexere_lakehouse_pipeline_spark.operators.multimodal import (
        encode_wav,
        extract_audio_stats,
    )

    docs = load_table(spark, sf_dir, "documents")

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["doc_id"]
            payloads = [
                encode_wav(
                    _WAV_RATE,
                    [(int(d) * 31 + i * 7) % 256
                     for i in range(64 + int(d) % 64)],
                )
                for d in ids
            ]
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.select("doc_id").repartition(
        spark.sparkContext.defaultParallelism).mapInPandas(
        synth, schema="media_id long, payload binary"
    )
    return extract_audio_stats(media).orderBy("media_id")


# ---------------------------------------------------------------------------
# Repetition scores — the remaining Gopher repetition signals (Rae et
# al. 2021, arXiv 2112.11446 Table A1) beyond the dup-3gram ratio
# plans/corpus.py:corpus_repetition_scores already covers: top-n-gram
# CONCENTRATION (one bigram dominating the doc) and the duplicate-
# line/paragraph analogs — boilerplate/SEO-spam shapes that both the
# length/stopword screens and a plain dup-n-gram ratio pass.  Three
# per-doc signals, all integer permille so both engines agree
# bit-for-bit:
#   dup_2gram_permille  — repeated share of word-bigram OCCURRENCES
#                         (1 - distinct/total),
#   top_2gram_permille  — share held by the single most frequent
#                         bigram,
#   dup_sent_permille   — repeated share of fixed 10-token "sentences"
#                         (the line/paragraph-dup analog for text with
#                         no newline structure).
# Plan shape: one explode per signal family feeding map-side-partial
# aggs keyed by doc — linear, no joins beyond the final per-doc
# broadcast-sized reassembly.
# ---------------------------------------------------------------------------

_REP_SENT_W = 10  # tokens per pseudo-sentence window


@_register(
    "text_repetition_scores",
    f"""
    WITH tok AS (SELECT doc_id,
                        COALESCE({_DUCK_TOKENS}, CAST([] AS VARCHAR[]))
                            AS toks
                 FROM documents),
    base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, toks
             FROM tok),
    grams AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                      i -> toks[CAST(i AS INTEGER)] || ' '
                           || toks[CAST(i AS INTEGER) + 1])) AS g
        FROM base WHERE len(toks) >= 2
    ),
    gc AS (SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g),
    ga AS (SELECT doc_id, SUM(c) AS n2, COUNT(*) AS nd2, MAX(c) AS topc
           FROM gc GROUP BY doc_id),
    sents AS (
        SELECT doc_id,
               unnest(list_transform(range(0, CAST(len(toks) // {_REP_SENT_W}
                                                   AS INTEGER)),
                      i -> array_to_string(
                          toks[CAST(i * {_REP_SENT_W} + 1 AS INTEGER)
                               : CAST(i * {_REP_SENT_W} + {_REP_SENT_W} AS INTEGER)],
                          ' '))) AS s
        FROM base WHERE len(toks) >= {_REP_SENT_W}
    ),
    sa AS (SELECT doc_id, COUNT(*) AS ns, COUNT(DISTINCT s) AS nds
           FROM sents GROUP BY doc_id)
    SELECT b.doc_id, b.n_tokens,
           CAST(COALESCE(ga.n2, 0) AS BIGINT) AS n_2grams,
           CAST(CASE WHEN COALESCE(ga.n2, 0) = 0 THEN 0
                ELSE 1000 * (ga.n2 - ga.nd2) // ga.n2 END AS BIGINT)
               AS dup_2gram_permille,
           CAST(CASE WHEN COALESCE(ga.n2, 0) = 0 THEN 0
                ELSE 1000 * ga.topc // ga.n2 END AS BIGINT)
               AS top_2gram_permille,
           CAST(COALESCE(sa.ns, 0) AS BIGINT) AS n_sents,
           CAST(CASE WHEN COALESCE(sa.ns, 0) = 0 THEN 0
                ELSE 1000 * (sa.ns - sa.nds) // sa.ns END AS BIGINT)
               AS dup_sent_permille
    FROM base b
    LEFT JOIN ga ON ga.doc_id = b.doc_id
    LEFT JOIN sa ON sa.doc_id = b.doc_id
    ORDER BY b.doc_id
    """,
)
def text_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        # NULL text -> empty token array on BOTH engines: a bare
        # size(NULL) is -1 under ansi-off Spark while DuckDB len(NULL)
        # is NULL — either would hash-diverge on a NULL-text doc (the
        # hard-negative class the script-mix query guards too)
        "doc_id",
        F.coalesce(
            tokenize("text"), F.array().cast("array<string>")
        ).alias("toks"),
    ).select("doc_id", F.size("toks").cast("long").alias("n_tokens"), "toks")
    grams = base.filter(F.size("toks") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> concat(element_at(toks, i), ' ',"
                " element_at(toks, i + 1)))"
            )
        ).alias("g"),
    )
    ga = (
        grams.groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n2"),
            F.count("*").alias("nd2"),
            F.max("c").alias("topc"),
        )
    )
    sents = base.filter(F.size("toks") >= _REP_SENT_W).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(toks) DIV {_REP_SENT_W} - 1),"
                f" i -> array_join(slice(toks, i * {_REP_SENT_W} + 1,"
                f" {_REP_SENT_W}), ' '))"
            )
        ).alias("s"),
    )
    sa = sents.groupBy("doc_id").agg(
        F.count("*").alias("ns"), F.countDistinct("s").alias("nds")
    )
    n2 = F.coalesce(F.col("n2"), F.lit(0))
    ns = F.coalesce(F.col("ns"), F.lit(0))
    return (
        base.select("doc_id", "n_tokens")
        .join(ga, on="doc_id", how="left")
        .join(sa, on="doc_id", how="left")
        .select(
            "doc_id",
            "n_tokens",
            n2.cast("long").alias("n_2grams"),
            F.when(n2 == 0, F.lit(0))
            .otherwise(
                F.expr("1000 * (n2 - nd2) DIV n2")
            )
            .cast("long")
            .alias("dup_2gram_permille"),
            F.when(n2 == 0, F.lit(0))
            .otherwise(F.expr("1000 * topc DIV n2"))
            .cast("long")
            .alias("top_2gram_permille"),
            ns.cast("long").alias("n_sents"),
            F.when(ns == 0, F.lit(0))
            .otherwise(F.expr("1000 * (ns - nds) DIV ns"))
            .cast("long")
            .alias("dup_sent_permille"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Multimodal IMAGE twin of multimodal_wav_stats — real BMP decode
# (operators/multimodal.py:bmp_stats — pure-stdlib uncompressed 24-bit
# parse) through the same mapInPandas plumbing, oracle-checked on
# integer-exact statistics: channel sums and BT.601 milli-luma
# (299r+587g+114b) instead of float means, so DuckDB recomputes the
# decode's ground truth bit-for-bit from the same synthesized pixels.
# Each doc gets a deterministic (4+id%5)x(3+id%4) image whose pixel
# channels are (id*7 + row*5 + col*3 + {0,11,22}) % 256.
# ---------------------------------------------------------------------------


@_register(
    "multimodal_bmp_stats",
    """
    WITH t AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
               FROM documents),
    px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) AS k FROM t),
    v AS (SELECT doc_id, w, h,
                 (doc_id * 7 + (k // w) * 5 + (k % w) * 3) % 256 AS vr,
                 (doc_id * 7 + (k // w) * 5 + (k % w) * 3 + 11) % 256 AS vg,
                 (doc_id * 7 + (k // w) * 5 + (k % w) * 3 + 22) % 256 AS vb
          FROM px)
    SELECT doc_id AS media_id,
           CAST(MIN(w) AS INTEGER) AS width,
           CAST(MIN(h) AS INTEGER) AS height,
           CAST(MIN(w) * MIN(h) AS BIGINT) AS n_pixels,
           CAST(SUM(vr) AS BIGINT) AS sum_r,
           CAST(SUM(vg) AS BIGINT) AS sum_g,
           CAST(SUM(vb) AS BIGINT) AS sum_b,
           CAST(MIN(299 * vr + 587 * vg + 114 * vb) AS BIGINT)
               AS min_luma_milli,
           CAST(MAX(299 * vr + 587 * vg + 114 * vb) AS BIGINT)
               AS max_luma_milli
    FROM v GROUP BY doc_id ORDER BY media_id
    """,
)
def multimodal_bmp_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from vexere_lakehouse_pipeline_spark.operators.multimodal import (
        encode_bmp,
        extract_image_stats,
    )

    docs = load_table(spark, sf_dir, "documents")

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["doc_id"]
            payloads = []
            for d in ids:
                d = int(d)
                w, h = 4 + d % 5, 3 + d % 4
                pixels = [
                    (
                        (d * 7 + r * 5 + c * 3) % 256,
                        (d * 7 + r * 5 + c * 3 + 11) % 256,
                        (d * 7 + r * 5 + c * 3 + 22) % 256,
                    )
                    for r in range(h)
                    for c in range(w)
                ]
                payloads.append(encode_bmp(w, h, pixels))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.select("doc_id").repartition(
        spark.sparkContext.defaultParallelism).mapInPandas(
        synth, schema="media_id long, payload binary"
    )
    return extract_image_stats(media).orderBy("media_id")


# ---------------------------------------------------------------------------
# COMPRESSED-format sibling of multimodal_bmp_stats: the same
# deterministic pixels, but PNG-encoded (zlib IDAT, per-row filters
# cycling None/Sub/Up/Average/Paeth) and run through the genuine
# inflate + filter-reconstruction decoder
# (operators/multimodal.py:png_stats).  The oracle is the SAME
# closed-form pixel formula — so a hash match proves the compressed
# decode path reconstructs every byte the raw BMP path reads, across
# all five PNG filter types.
# ---------------------------------------------------------------------------


@_register(
    "multimodal_png_stats",
    """
    WITH t AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
               FROM documents),
    px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) AS k FROM t),
    v AS (SELECT doc_id, w, h,
                 (doc_id * 7 + (k // w) * 5 + (k % w) * 3) % 256 AS vr,
                 (doc_id * 7 + (k // w) * 5 + (k % w) * 3 + 11) % 256 AS vg,
                 (doc_id * 7 + (k // w) * 5 + (k % w) * 3 + 22) % 256 AS vb
          FROM px)
    SELECT doc_id AS media_id,
           CAST(MIN(w) AS INTEGER) AS width,
           CAST(MIN(h) AS INTEGER) AS height,
           CAST(MIN(w) * MIN(h) AS BIGINT) AS n_pixels,
           CAST(SUM(vr) AS BIGINT) AS sum_r,
           CAST(SUM(vg) AS BIGINT) AS sum_g,
           CAST(SUM(vb) AS BIGINT) AS sum_b,
           CAST(MIN(299 * vr + 587 * vg + 114 * vb) AS BIGINT)
               AS min_luma_milli,
           CAST(MAX(299 * vr + 587 * vg + 114 * vb) AS BIGINT)
               AS max_luma_milli
    FROM v GROUP BY doc_id ORDER BY media_id
    """,
)
def multimodal_png_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from vexere_lakehouse_pipeline_spark.operators.multimodal import (
        encode_png,
        extract_image_stats,
        png_stats,
    )

    docs = load_table(spark, sf_dir, "documents")

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["doc_id"]
            payloads = []
            for d in ids:
                d = int(d)
                w, h = 4 + d % 5, 3 + d % 4
                pixels = [
                    (
                        (d * 7 + r * 5 + c * 3) % 256,
                        (d * 7 + r * 5 + c * 3 + 11) % 256,
                        (d * 7 + r * 5 + c * 3 + 22) % 256,
                    )
                    for r in range(h)
                    for c in range(w)
                ]
                # row filters cycle offset by id so every doc mixes
                # several of the five reconstruction paths
                filters = [(d + r) % 5 for r in range(h)]
                payloads.append(encode_png(w, h, pixels, filters=filters))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.select("doc_id").repartition(
        spark.sparkContext.defaultParallelism).mapInPandas(
        synth, schema="media_id long, payload binary"
    )
    return extract_image_stats(media, decoder=png_stats).orderBy("media_id")


# ---------------------------------------------------------------------------
# LOSSY-codec sibling of multimodal_png_stats: baseline JPEG (ITU-T
# T.81) — real JFIF/DQT/DHT/SOF0/SOS structure, Huffman entropy
# decode with byte unstuffing, DC differential prediction, AC
# run-length/ZRL/EOB, dequantization, and the pinned 13-bit integer
# IDCT (operators/multimodal.py:jpeg_decode_gray).  Lossy codecs are
# normally oracle-hostile, so the fixture drives the encoder from
# QUANTIZED COEFFICIENTS (what a JPEG file actually stores): per doc,
# two horizontally adjacent 8x8 blocks (16x8 grayscale — two blocks so
# DC prediction crosses a block boundary) carrying a deterministic DC
# plus four ACs at zigzag 1/2/20/40 (the 2->20 gap is 17 zeros, so the
# ZRL escape is exercised on every row where that AC is nonzero).  The
# oracle regenerates the same coefficients, dequantizes with the same
# q[zz] = 1 + zz%4 table, and evaluates the SAME integer IDCT —
# W[u][x] constants injected as literals, floor((sum + 2^25)/2^26)
# + 128 done in provably-nonnegative integer arithmetic — so a hash
# match proves the ENTIRE decode chain: marker walk, DHT table build,
# bitstream decode, EXTEND, zigzag, dequant, IDCT, level shift, clamp.
# ---------------------------------------------------------------------------

from vexere_lakehouse_pipeline_spark.operators.multimodal import (  # noqa: E402
    JPEG_IDCT_W,
    JPEG_ZIGZAG,
)

_JW = "[" + ",".join(str(v) for v in JPEG_IDCT_W) + "]"
_JZZ = "[" + ",".join(str(v) for v in JPEG_ZIGZAG) + "]"


@_register(
    "multimodal_jpeg_stats",
    f"""
    WITH blocks AS (SELECT doc_id, unnest([0, 1]) AS k FROM documents),
    coef AS (
        SELECT doc_id, k, 0 AS zz,
               (doc_id*5 + k*17) % 200 - 100 AS v FROM blocks
        UNION ALL SELECT doc_id, k, 1,  (doc_id*3 + k*7)   % 21 - 10 FROM blocks
        UNION ALL SELECT doc_id, k, 2,  (doc_id*11 + k*13) % 19 - 9  FROM blocks
        UNION ALL SELECT doc_id, k, 20, (doc_id*7 + k*3)   % 15 - 7  FROM blocks
        UNION ALL SELECT doc_id, k, 40, (doc_id*13 + k*5)  % 11 - 5  FROM blocks
    ),
    deq AS (
        SELECT doc_id, k,
               v * (1 + zz % 4) AS c,
               {_JZZ}[zz + 1] // 8 AS fu,
               {_JZZ}[zz + 1] % 8 AS fv
        FROM coef
    ),
    px AS (
        -- pinned integer IDCT; bias 1024*2^26 keeps the dividend
        -- non-negative so // floors identically on both engines
        SELECT doc_id, k, r, cc,
               LEAST(255, GREATEST(0,
                   (SUM({_JW}[fu*8 + r + 1] * {_JW}[fv*8 + cc + 1] * c)
                    + 33554432 + 68719476736) // 67108864 - 1024 + 128))
                   AS pv
        FROM deq, unnest(range(8)) AS tr(r), unnest(range(8)) AS tc(cc)
        GROUP BY doc_id, k, r, cc
    )
    SELECT doc_id AS media_id,
           CAST(16 AS INTEGER) AS width,
           CAST(8 AS INTEGER) AS height,
           CAST(128 AS BIGINT) AS n_pixels,
           CAST(SUM(pv) AS BIGINT) AS sum_r,
           CAST(SUM(pv) AS BIGINT) AS sum_g,
           CAST(SUM(pv) AS BIGINT) AS sum_b,
           CAST(MIN(1000 * pv) AS BIGINT) AS min_luma_milli,
           CAST(MAX(1000 * pv) AS BIGINT) AS max_luma_milli
    FROM px GROUP BY doc_id ORDER BY media_id
    """,
)
def multimodal_jpeg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from vexere_lakehouse_pipeline_spark.operators.multimodal import (
        encode_jpeg_coeffs,
        extract_image_stats,
        jpeg_stats,
    )

    docs = load_table(spark, sf_dir, "documents")

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["doc_id"]
            payloads = []
            for d in ids:
                d = int(d)
                blks = []
                for k in range(2):
                    zz = [0] * 64
                    zz[0] = (d * 5 + k * 17) % 200 - 100
                    zz[1] = (d * 3 + k * 7) % 21 - 10
                    zz[2] = (d * 11 + k * 13) % 19 - 9
                    zz[20] = (d * 7 + k * 3) % 15 - 7
                    zz[40] = (d * 13 + k * 5) % 11 - 5
                    blks.append(zz)
                payloads.append(encode_jpeg_coeffs(16, 8, blks))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.select("doc_id").repartition(
        spark.sparkContext.defaultParallelism).mapInPandas(
        synth, schema="media_id long, payload binary"
    )
    return extract_image_stats(media, decoder=jpeg_stats).orderBy("media_id")


# ---------------------------------------------------------------------------
# G.711 mu-law sibling of multimodal_wav_stats: the fixture stores the
# mu-law CODE BYTES a companded file actually carries (same doc_id
# arithmetic as the PCM fixture), the Spark side runs the real
# fmt-tag-7 RIFF parse + per-sample mu-law expansion
# (operators/multimodal.py:wav_mulaw_stats), and the oracle evaluates
# the G.711 transfer function closed-form — the codec is integer BY
# SPEC, so ((mant*8+132) << seg) - 132 with the complement/sign
# unpacked in plain arithmetic reproduces the decode bit-for-bit.
# ---------------------------------------------------------------------------


@_register(
    "multimodal_mulaw_stats",
    f"""
    WITH t AS (
        SELECT doc_id AS media_id,
               list_transform(range(0, 64 + doc_id % 64),
                              i -> (doc_id * 31 + i * 7) % 256) AS cs
        FROM documents
    ),
    s AS (
        SELECT media_id,
               unnest(list_transform(cs, b -> 255 - b)) AS u
        FROM t
    ),
    pcm AS (
        SELECT media_id,
               CASE WHEN u >= 128 THEN -v ELSE v END AS p
        FROM (SELECT media_id,
                     ((u % 16) * 8 + 132)
                       * ([1,2,4,8,16,32,64,128])[((u // 16) % 8) + 1]
                       - 132 AS v,
                     u
              FROM s)
    )
    SELECT media_id,
           {_WAV_RATE} AS sample_rate,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM(p) AS BIGINT) AS sum_pcm,
           CAST(MIN(p) AS INTEGER) AS min_pcm,
           CAST(MAX(p) AS INTEGER) AS max_pcm
    FROM pcm GROUP BY media_id ORDER BY media_id
    """,
)
def multimodal_mulaw_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from vexere_lakehouse_pipeline_spark.operators.multimodal import (
        encode_wav_mulaw,
        extract_mulaw_stats,
    )

    docs = load_table(spark, sf_dir, "documents")

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["doc_id"]
            payloads = [
                encode_wav_mulaw(
                    _WAV_RATE,
                    [(int(d) * 31 + i * 7) % 256
                     for i in range(64 + int(d) % 64)],
                )
                for d in ids
            ]
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.select("doc_id").repartition(
        spark.sparkContext.defaultParallelism).mapInPandas(
        synth, schema="media_id long, payload binary"
    )
    return extract_mulaw_stats(media).orderBy("media_id")


# ---------------------------------------------------------------------------
# Gzip payload round-trip: every web corpus arrives compressed (WARC
# members, .jsonl.gz shards), so the decompress stage IS a production
# operator.  The fixture gzips each doc's own text (Arrow-batched
# Python — the binary-column path), the decode stage decompresses with
# CRC32+ISIZE verification, and the oracle recomputes the emitted
# stats (byte length + md5 of the DECOMPRESSED bytes) directly from
# the text column — so a hash match proves the round-trip recovered
# every byte without the oracle ever touching gzip.
# ---------------------------------------------------------------------------


@_register(
    "multimodal_gzip_text",
    """
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(COALESCE(text, ''))) AS BIGINT)
               AS n_raw_bytes,
           md5(COALESCE(text, '')) AS raw_md5
    FROM documents ORDER BY media_id
    """,
)
def multimodal_gzip_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from vexere_lakehouse_pipeline_spark.operators.multimodal import (
        gzip_text_stats,
    )

    docs = load_table(spark, sf_dir, "documents")

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gzip

        for pdf in it:
            payloads = [
                gzip.compress((t if t is not None else "").encode("utf-8"))
                for t in pdf["text"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = docs.select("doc_id", "text").repartition(
        spark.sparkContext.defaultParallelism).mapInPandas(
        synth, schema="media_id long, payload binary"
    )
    return gzip_text_stats(media).orderBy("media_id")


# ---------------------------------------------------------------------------
# MJPEG-in-AVI: compressed video — '00dc' chunks each holding a
# complete baseline JPEG, frame-sampled at stride 2 and decoded
# through the FULL JPEG chain (operators/multimodal.py:
# framesample_mjpeg).  Per doc: 3 independent 8x8 frames driven by
# per-frame quantized coefficients; kept frames are f in {0, 2}.  The
# oracle evaluates the same pinned integer IDCT over exactly those
# frames — a hash match proves the RIFF container walk, the per-frame
# JPEG decode (fresh DC predictor per frame), and the stride
# arithmetic all compose.
# ---------------------------------------------------------------------------


@_register(
    "multimodal_mjpeg_framesample",
    f"""
    WITH frames AS (SELECT doc_id, unnest([0, 2]) AS f FROM documents),
    coef AS (
        SELECT doc_id, f, 0 AS zz,
               (doc_id*5 + f*29) % 200 - 100 AS v FROM frames
        UNION ALL SELECT doc_id, f, 1,  (doc_id*3 + f*11)  % 21 - 10 FROM frames
        UNION ALL SELECT doc_id, f, 2,  (doc_id*11 + f*17) % 19 - 9  FROM frames
        UNION ALL SELECT doc_id, f, 20, (doc_id*7 + f*13)  % 15 - 7  FROM frames
        UNION ALL SELECT doc_id, f, 40, (doc_id*13 + f*7)  % 11 - 5  FROM frames
    ),
    deq AS (
        SELECT doc_id, f,
               v * (1 + zz % 4) AS c,
               {_JZZ}[zz + 1] // 8 AS fu,
               {_JZZ}[zz + 1] % 8 AS fv
        FROM coef
    ),
    px AS (
        SELECT doc_id, f, r, cc,
               LEAST(255, GREATEST(0,
                   (SUM({_JW}[fu*8 + r + 1] * {_JW}[fv*8 + cc + 1] * c)
                    + 33554432 + 68719476736) // 67108864 - 1024 + 128))
                   AS pv
        FROM deq, unnest(range(8)) AS tr(r), unnest(range(8)) AS tc(cc)
        GROUP BY doc_id, f, r, cc
    )
    SELECT doc_id AS media_id,
           CAST(3 AS INTEGER) AS n_frames_in,
           CAST(2 AS INTEGER) AS n_frames_out,
           CAST(8 AS INTEGER) AS width,
           CAST(8 AS INTEGER) AS height,
           CAST(SUM(pv) AS BIGINT) AS sum_y,
           CAST(MIN(pv) AS INTEGER) AS min_y,
           CAST(MAX(pv) AS INTEGER) AS max_y
    FROM px GROUP BY doc_id ORDER BY media_id
    """,
)
def multimodal_mjpeg_framesample(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from vexere_lakehouse_pipeline_spark.operators.multimodal import (
        encode_avi_mjpeg,
        encode_jpeg_coeffs,
        framesample_mjpeg,
    )

    docs = load_table(spark, sf_dir, "documents")

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["doc_id"]
            payloads = []
            for d in ids:
                d = int(d)
                frames = []
                for f in range(3):
                    zz = [0] * 64
                    zz[0] = (d * 5 + f * 29) % 200 - 100
                    zz[1] = (d * 3 + f * 11) % 21 - 10
                    zz[2] = (d * 11 + f * 17) % 19 - 9
                    zz[20] = (d * 7 + f * 13) % 15 - 7
                    zz[40] = (d * 13 + f * 7) % 11 - 5
                    frames.append(encode_jpeg_coeffs(8, 8, [zz]))
                payloads.append(encode_avi_mjpeg(8, 8, frames))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.select("doc_id").repartition(
        spark.sparkContext.defaultParallelism).mapInPandas(
        synth, schema="media_id long, payload binary"
    )
    return framesample_mjpeg(media, step=2).orderBy("media_id")


# ---------------------------------------------------------------------------
# GIF sibling of the PNG/JPEG rows — the third compression FAMILY in
# the codec tier (dictionary LZW after PNG's LZ77/zlib and JPEG's
# transform coding).  Per doc: a (24+d%5) x (18+d%3) image whose
# palette indices walk k*11 % 256 (11 is coprime to 256, so the full
# table is exercised and LZW sees recurring phrases across rows) over
# a per-doc palette; the decode chain is header walk -> global color
# table -> LZW decompression (growing code widths, clear/EOI,
# deferred entries) -> palette indirection
# (operators/multimodal.py:gif_stats).  The oracle recomputes pixel
# colors closed-form from the same index/palette arithmetic — a hash
# match proves every LZW phrase came back byte-exact.
# ---------------------------------------------------------------------------


@_register(
    "multimodal_gif_stats",
    """
    WITH t AS (SELECT doc_id, 24 + doc_id % 5 AS w, 18 + doc_id % 3 AS h
               FROM documents),
    px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) AS k FROM t),
    v AS (SELECT doc_id, w, h,
                 ((doc_id * 7 + k * 11) % 256 * 3 + doc_id) % 256 AS vr,
                 ((doc_id * 7 + k * 11) % 256 * 5 + doc_id * 2 + 1) % 256
                     AS vg,
                 ((doc_id * 7 + k * 11) % 256 * 7 + doc_id * 3 + 2) % 256
                     AS vb
          FROM px)
    SELECT doc_id AS media_id,
           CAST(MIN(w) AS INTEGER) AS width,
           CAST(MIN(h) AS INTEGER) AS height,
           CAST(MIN(w) * MIN(h) AS BIGINT) AS n_pixels,
           CAST(SUM(vr) AS BIGINT) AS sum_r,
           CAST(SUM(vg) AS BIGINT) AS sum_g,
           CAST(SUM(vb) AS BIGINT) AS sum_b,
           CAST(MIN(299 * vr + 587 * vg + 114 * vb) AS BIGINT)
               AS min_luma_milli,
           CAST(MAX(299 * vr + 587 * vg + 114 * vb) AS BIGINT)
               AS max_luma_milli
    FROM v GROUP BY doc_id ORDER BY media_id
    """,
)
def multimodal_gif_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from vexere_lakehouse_pipeline_spark.operators.multimodal import (
        encode_gif,
        extract_image_stats,
        gif_stats,
    )

    docs = load_table(spark, sf_dir, "documents")

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["doc_id"]
            payloads = []
            for d in ids:
                d = int(d)
                w, h = 24 + d % 5, 18 + d % 3
                idx = [(d * 7 + k * 11) % 256 for k in range(w * h)]
                pal = [
                    (
                        (i * 3 + d) % 256,
                        (i * 5 + d * 2 + 1) % 256,
                        (i * 7 + d * 3 + 2) % 256,
                    )
                    for i in range(256)
                ]
                payloads.append(encode_gif(w, h, idx, pal))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.select("doc_id").repartition(
        spark.sparkContext.defaultParallelism).mapInPandas(
        synth, schema="media_id long, payload binary"
    )
    return extract_image_stats(media, decoder=gif_stats).orderBy("media_id")


# ---------------------------------------------------------------------------
# Unicode scrub — zero-width characters, typographic quotes/dashes,
# NBSP: the invisible noise a web crawl carries that silently breaks
# tokenization and dedup hashing.  A deterministic noisy wrapper is
# synthesized per doc (three variants by doc_id % 3, so the scrub's
# effect VARIES per row) and normalized by the ordered literal-replace
# chain in functions/text.py (one projection, zero shuffles, zero
# Python).
# ---------------------------------------------------------------------------

_NOISY_SPARK_PARTS = {
    0: ("﻿“q” – ", "…​"),
    1: ("‘x’ ", "‌‍"),
    2: ("", ""),
}


def _noisy_spark() -> F.Column:
    d = F.col("doc_id") % 3
    out = F.when(
        d == 0,
        F.concat(
            F.lit(_NOISY_SPARK_PARTS[0][0]),
            F.col("text"),
            F.lit(_NOISY_SPARK_PARTS[0][1]),
        ),
    ).when(
        d == 1,
        F.concat(
            F.lit(_NOISY_SPARK_PARTS[1][0]),
            F.col("text"),
            F.lit(_NOISY_SPARK_PARTS[1][1]),
        ),
    ).otherwise(F.col("text"))
    return out


_NOISY_SQL = (
    "CASE doc_id % 3 "
    f"WHEN 0 THEN '{_NOISY_SPARK_PARTS[0][0]}' || text || '{_NOISY_SPARK_PARTS[0][1]}' "
    f"WHEN 1 THEN '{_NOISY_SPARK_PARTS[1][0]}' || text || '{_NOISY_SPARK_PARTS[1][1]}' "
    "ELSE text END"
)


@_register(
    "text_unicode_scrub",
    f"""
    WITH raw AS (SELECT doc_id, {_NOISY_SQL} AS noisy FROM documents)
    SELECT doc_id,
           CAST(length(noisy) AS BIGINT) AS len_before,
           CAST(length({normalize_unicode_sql('noisy')}) AS BIGINT)
               AS len_after,
           {normalize_unicode_sql('noisy')} AS clean_text
    FROM raw ORDER BY doc_id
    """,
)
def text_unicode_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select("doc_id", _noisy_spark().alias("noisy"))
    return raw.select(
        "doc_id",
        F.length("noisy").cast("long").alias("len_before"),
        F.length(normalize_unicode(F.col("noisy"))).cast("long").alias(
            "len_after"
        ),
        normalize_unicode(F.col("noisy")).alias("clean_text"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Script-mix detection — per-doc counts of Latin / Han / Cyrillic
# characters and the dominant script: the multilingual-curation screen
# that routes documents to per-script pipelines (and catches
# mixed-script spam).  The corpus is ASCII word salad, so deterministic
# Han/Cyrillic runs are appended per doc_id (literal char arrays — the
# same codepoints on both engines; Spark's char() is ASCII-only so the
# chars are Python-generated literals).  Counting uses each engine's
# own Unicode-script syntax (Java \p{IsHan} ≡ RE2 \p{Han}) over BMP
# codepoints stable across Unicode versions.  One projection, zero
# shuffles, zero Python.
# ---------------------------------------------------------------------------

_HAN_CHARS = [chr(0x4E00 + i) for i in range(50)]
_CYR_CHARS = [chr(0x0410 + i) for i in range(32)]


def _script_mix_spark() -> F.Column:
    d = F.col("doc_id")
    han = F.element_at(
        F.array(*[F.lit(c) for c in _HAN_CHARS]), (d % 50 + 1).cast("int")
    )
    cyr = F.element_at(
        F.array(*[F.lit(c) for c in _CYR_CHARS]), (d % 32 + 1).cast("int")
    )
    return F.concat(
        F.col("text"),
        F.lit(" "),
        F.repeat(han, (d % 4 + 1).cast("int")),
        F.when(d % 2 == 0, F.concat(F.lit(" "), cyr)).otherwise(F.lit("")),
    )


_SCRIPT_MIX_SQL = (
    "text || ' ' || repeat(["
    + ", ".join("'" + c + "'" for c in _HAN_CHARS)
    + "][CAST(doc_id % 50 + 1 AS INTEGER)], CAST(doc_id % 4 + 1 AS INTEGER))"
    " || CASE WHEN doc_id % 2 = 0 THEN ' ' || ["
    + ", ".join("'" + c + "'" for c in _CYR_CHARS)
    + "][CAST(doc_id % 32 + 1 AS INTEGER)] ELSE '' END"
)

# NULL text -> NULL counts -> the label must be NULL, not a fall-through
# to the ELSE branch (a per-script router must never get a concrete
# wrong script for an empty doc).
_DOMINANT_SQL = (
    "CASE WHEN n_latin IS NULL THEN NULL "
    "WHEN n_latin >= n_han AND n_latin >= n_cyrillic THEN 'latin' "
    "WHEN n_han >= n_cyrillic THEN 'han' ELSE 'cyrillic' END"
)


@_register(
    "text_script_mix",
    f"""
    WITH raw AS (SELECT doc_id, {_SCRIPT_MIX_SQL} AS mixed FROM documents),
    counted AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(mixed, '\\p{{Latin}}')) AS BIGINT)
                   AS n_latin,
               CAST(len(regexp_extract_all(mixed, '\\p{{Han}}')) AS BIGINT)
                   AS n_han,
               CAST(len(regexp_extract_all(mixed, '\\p{{Cyrillic}}')) AS BIGINT)
                   AS n_cyrillic
        FROM raw
    )
    SELECT doc_id, n_latin, n_han, n_cyrillic,
           {_DOMINANT_SQL} AS dominant_script
    FROM counted ORDER BY doc_id
    """,
)
def text_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select("doc_id", _script_mix_spark().alias("mixed"))
    n_latin = F.size(
        F.regexp_extract_all("mixed", F.lit(r"\p{IsLatin}"), 0)
    ).cast("long")
    n_han = F.size(
        F.regexp_extract_all("mixed", F.lit(r"\p{IsHan}"), 0)
    ).cast("long")
    n_cyr = F.size(
        F.regexp_extract_all("mixed", F.lit(r"\p{IsCyrillic}"), 0)
    ).cast("long")
    counted = raw.select(
        "doc_id",
        n_latin.alias("n_latin"),
        n_han.alias("n_han"),
        n_cyr.alias("n_cyrillic"),
    )
    dominant = (
        F.when(F.col("n_latin").isNull(), F.lit(None).cast("string"))
        .when(
            (F.col("n_latin") >= F.col("n_han"))
            & (F.col("n_latin") >= F.col("n_cyrillic")),
            "latin",
        )
        .when(F.col("n_han") >= F.col("n_cyrillic"), "han")
        .otherwise("cyrillic")
    )
    return counted.select(
        "doc_id",
        "n_latin",
        "n_han",
        "n_cyrillic",
        dominant.alias("dominant_script"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# INTRA-doc sentence dedup — keep the FIRST occurrence of each
# distinct pseudo-sentence within a document and rebuild the text in
# original order.  The self-repetition scrubber (boilerplate chorus
# removal) complementing corpus_sentence_dedup, which drops sentences
# that are over-frequent ACROSS the corpus: that one needs a global
# frequency table, this one is per-doc — groupBy (doc, sentence) ->
# min index, no cross-doc state at all, so at 100 TB it is perfectly
# data-parallel with one doc-local shuffle.  Same fixed-width
# _SENT_W-token pseudo-sentences; docs with zero tokens are excluded
# (same contract as corpus_sentence_dedup).
# ---------------------------------------------------------------------------
@_register(
    "corpus_intradoc_sentence_dedup",
    f"""
    WITH t AS (SELECT doc_id,
                      list_filter(string_split_regex(lower(text),
                                  '[^\\p{{L}}\\p{{N}}]+'), x -> x <> '') AS w
               FROM documents),
    nc AS (SELECT doc_id, w,
                  CAST(ceil(len(w) * 1.0 / {_SENT_W}) AS BIGINT) AS n_sents
           FROM t WHERE len(w) > 0),
    ex AS (SELECT doc_id, n_sents,
                  CAST(unnest(range(0, n_sents)) AS BIGINT) AS sent_idx,
                  array_to_string(
                      w[CAST(unnest(range(0, n_sents)) AS BIGINT) * {_SENT_W} + 1
                        : CAST(unnest(range(0, n_sents)) AS BIGINT) * {_SENT_W} + {_SENT_W}],
                      ' ') AS sent
           FROM nc),
    kept AS (SELECT doc_id, sent, MIN(sent_idx) AS sent_idx
             FROM ex GROUP BY doc_id, sent),
    re AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
                  string_agg(sent, ' ' ORDER BY sent_idx) AS clean_text
           FROM kept GROUP BY doc_id)
    SELECT nc.doc_id, nc.n_sents, re.n_kept,
           nc.n_sents - re.n_kept AS n_dropped, re.clean_text
    FROM nc JOIN re ON re.doc_id = nc.doc_id
    ORDER BY nc.doc_id
    """,
)
def corpus_intradoc_sentence_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = (
        docs.select("doc_id", tokenize("text").alias("w"))
        .withColumn("n", F.size("w").cast("long"))
        .filter(F.col("n") > 0)
    )
    nc = t.withColumn(
        "n_sents", F.ceil(F.col("n") * 1.0 / _SENT_W).cast("long")
    )
    ex = nc.select(
        "doc_id",
        "n_sents",
        F.explode(F.expr("sequence(0, n_sents - 1)")).alias("sent_idx"),
        F.col("w"),
    ).select(
        "doc_id",
        "n_sents",
        F.col("sent_idx").cast("long").alias("sent_idx"),
        F.array_join(
            F.slice(F.col("w"), F.col("sent_idx") * _SENT_W + 1, _SENT_W), " "
        ).alias("sent"),
    )
    kept = ex.groupBy("doc_id", "sent").agg(
        F.min("sent_idx").alias("sent_idx")
    )
    re = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sent_idx", "sent"))),
                lambda s: s.sent,
            ),
            " ",
        ).alias("clean_text"),
    )
    return (
        nc.select("doc_id", "n_sents")
        .join(re, on="doc_id")
        .select(
            "doc_id",
            "n_sents",
            "n_kept",
            (F.col("n_sents") - F.col("n_kept")).alias("n_dropped"),
            "clean_text",
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Audio decimation (frame-sample) stage through the oracle gate — the
# synthesized 8-bit PCM payloads of multimodal_wav_stats run through
# encode_wav -> _wav_parse -> keep-every-2nd-sample
# (operators/multimodal.downsample_audio, a mapInPandas stage), and
# the oracle regenerates the KEPT samples directly with a stride-2
# range — so a green row proves the real RIFF round-trip plus the
# decimation arithmetic end-to-end in exact integers.  This is the
# "resample / frame-sample" slot of the multimodal contract: a real
# resampler (ffmpeg/torchaudio) swaps into the same stage signature.
# ---------------------------------------------------------------------------
_DS_FACTOR = 2

@_register(
    "multimodal_wav_downsample",
    f"""
    WITH t AS (
        SELECT doc_id AS media_id,
               64 + doc_id % 64 AS n,
               list_transform(range(0, 64 + doc_id % 64, {_DS_FACTOR}),
                              i -> (doc_id * 31 + i * 7) % 256) AS kept
        FROM documents
    )
    SELECT media_id,
           CAST(n AS BIGINT) AS n_in,
           CAST(len(kept) AS BIGINT) AS n_out,
           CAST(list_aggregate(kept, 'sum') AS BIGINT) AS sum_out,
           CAST(list_aggregate(kept, 'max') AS INTEGER) AS peak_out,
           {_WAV_RATE // _DS_FACTOR} AS out_rate
    FROM t ORDER BY media_id
    """,
)
def multimodal_wav_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from vexere_lakehouse_pipeline_spark.operators.multimodal import (
        downsample_audio,
        encode_wav,
    )

    docs = load_table(spark, sf_dir, "documents")

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["doc_id"]
            payloads = [
                encode_wav(
                    _WAV_RATE,
                    [(int(d) * 31 + i * 7) % 256
                     for i in range(64 + int(d) % 64)],
                )
                for d in ids
            ]
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.select("doc_id").repartition(
        spark.sparkContext.defaultParallelism).mapInPandas(
        synth, schema="media_id long, payload binary"
    )
    return downsample_audio(media, factor=_DS_FACTOR).orderBy("media_id")


# ---------------------------------------------------------------------------
# Image resize (nearest-neighbor 2x downscale) through the oracle gate
# — completes the multimodal contract's decode / frame-sample / RESIZE
# triple: the synthesized BMPs of multimodal_bmp_stats run through
# encode_bmp -> header parse -> keep-every-2nd-pixel-in-both-axes
# (operators/multimodal.downsample_image), and the oracle regenerates
# the KEPT pixels directly by filtering even (row, col) — a green row
# proves the real BMP round-trip (bottom-up storage, 4-byte row
# padding) plus the stride arithmetic end-to-end in exact integers.
# ---------------------------------------------------------------------------
_RS_FACTOR = 2

@_register(
    "multimodal_bmp_resize",
    f"""
    WITH t AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
               FROM documents),
    px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) AS k FROM t),
    kept AS (SELECT doc_id, w, h,
                    (doc_id * 7 + (k // w) * 5 + (k % w) * 3) % 256 AS vr,
                    (doc_id * 7 + (k // w) * 5 + (k % w) * 3 + 11) % 256 AS vg,
                    (doc_id * 7 + (k // w) * 5 + (k % w) * 3 + 22) % 256 AS vb
             FROM px
             WHERE (k // w) % {_RS_FACTOR} = 0 AND (k % w) % {_RS_FACTOR} = 0)
    SELECT doc_id AS media_id,
           CAST(MIN(w) AS INTEGER) AS width_in,
           CAST(MIN(h) AS INTEGER) AS height_in,
           CAST((MIN(w) + {_RS_FACTOR - 1}) // {_RS_FACTOR} AS INTEGER)
               AS width_out,
           CAST((MIN(h) + {_RS_FACTOR - 1}) // {_RS_FACTOR} AS INTEGER)
               AS height_out,
           CAST(SUM(vr) AS BIGINT) AS sum_r,
           CAST(SUM(vg) AS BIGINT) AS sum_g,
           CAST(SUM(vb) AS BIGINT) AS sum_b,
           CAST(MAX(299 * vr + 587 * vg + 114 * vb) AS BIGINT)
               AS peak_luma_milli
    FROM kept GROUP BY doc_id ORDER BY media_id
    """,
)
def multimodal_bmp_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from vexere_lakehouse_pipeline_spark.operators.multimodal import (
        downsample_image,
        encode_bmp,
    )

    docs = load_table(spark, sf_dir, "documents")

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["doc_id"]
            payloads = []
            for d in ids:
                d = int(d)
                w, h = 4 + d % 5, 3 + d % 4
                pixels = [
                    (
                        (d * 7 + r * 5 + c * 3) % 256,
                        (d * 7 + r * 5 + c * 3 + 11) % 256,
                        (d * 7 + r * 5 + c * 3 + 22) % 256,
                    )
                    for r in range(h)
                    for c in range(w)
                ]
                payloads.append(encode_bmp(w, h, pixels))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.select("doc_id").repartition(
        spark.sparkContext.defaultParallelism).mapInPandas(
        synth, schema="media_id long, payload binary"
    )
    return downsample_image(media, factor=_RS_FACTOR).orderBy("media_id")


# ---------------------------------------------------------------------------
# Video frame-sampling through the oracle gate — the third multimodal
# modality: per doc a synthesized AVI-style RIFF container ((2+id%5)
# frames of (3+id%3)x(2+id%2) DIB pixels, channels (id*7 + f*13 + r*5
# + c*3 + {0,11,22}) % 256) runs through encode_avi -> _avi_parse ->
# keep-every-2nd-frame (operators/multimodal.framesample_video), and
# the oracle regenerates the KEPT frames' pixels directly — a green
# row proves the real container walk (LIST hdrl/movi, chunk padding,
# bottom-up DIB stride) plus the stride sampling in exact integers.
# ---------------------------------------------------------------------------
_VFS_STEP = 2

@_register(
    "multimodal_avi_framesample",
    f"""
    WITH t AS (SELECT doc_id, 2 + doc_id % 5 AS nf,
                      3 + doc_id % 3 AS w, 2 + doc_id % 2 AS h
               FROM documents),
    fr AS (SELECT doc_id, nf, w, h, unnest(range(0, nf)) AS f FROM t
           ),
    kept AS (SELECT doc_id, nf, w, h, f FROM fr WHERE f % {_VFS_STEP} = 0),
    px AS (SELECT doc_id, nf, w, h, f, unnest(range(0, w * h)) AS k
           FROM kept),
    v AS (SELECT doc_id, nf, w, h,
                 (doc_id * 7 + f * 13 + (k // w) * 5 + (k % w) * 3) % 256 AS vr,
                 (doc_id * 7 + f * 13 + (k // w) * 5 + (k % w) * 3 + 11) % 256 AS vg,
                 (doc_id * 7 + f * 13 + (k // w) * 5 + (k % w) * 3 + 22) % 256 AS vb
          FROM px)
    SELECT doc_id AS media_id,
           CAST(MIN(nf) AS INTEGER) AS n_frames_in,
           CAST((MIN(nf) + {_VFS_STEP - 1}) // {_VFS_STEP} AS INTEGER)
               AS n_frames_out,
           CAST(MIN(w) AS INTEGER) AS width,
           CAST(MIN(h) AS INTEGER) AS height,
           CAST(SUM(vr) AS BIGINT) AS sum_r,
           CAST(SUM(vg) AS BIGINT) AS sum_g,
           CAST(SUM(vb) AS BIGINT) AS sum_b,
           CAST(MAX(299 * vr + 587 * vg + 114 * vb) AS BIGINT)
               AS peak_luma_milli
    FROM v GROUP BY doc_id ORDER BY media_id
    """,
)
def multimodal_avi_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from vexere_lakehouse_pipeline_spark.operators.multimodal import (
        encode_avi,
        framesample_video,
    )

    docs = load_table(spark, sf_dir, "documents")

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["doc_id"]
            payloads = []
            for d in ids:
                d = int(d)
                nf, w, h = 2 + d % 5, 3 + d % 3, 2 + d % 2
                frames = [
                    [
                        (
                            (d * 7 + f * 13 + r * 5 + c * 3) % 256,
                            (d * 7 + f * 13 + r * 5 + c * 3 + 11) % 256,
                            (d * 7 + f * 13 + r * 5 + c * 3 + 22) % 256,
                        )
                        for r in range(h)
                        for c in range(w)
                    ]
                    for f in range(nf)
                ]
                payloads.append(encode_avi(w, h, frames))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.select("doc_id").repartition(
        spark.sparkContext.defaultParallelism).mapInPandas(
        synth, schema="media_id long, payload binary"
    )
    return framesample_video(media, step=_VFS_STEP).orderBy("media_id")


# ---------------------------------------------------------------------------
# Video frame-stride RE-ENCODE (the video analog of
# multimodal_wav_downsample, VERDICT r4 #6): same synthetic AVI corpus
# as the framesample row, but the operator re-ENCODES the kept frames
# into a new AVI payload and reports stats of the RE-DECODED output
# plus its byte size.  The oracle regenerates the kept frames' pixels
# AND the encoder's closed-form RIFF size — a green row proves
# decode → stride → encode → decode end-to-end, including the
# 4-byte-row-stride layout arithmetic.  step=3 (vs framesample's 2)
# so the two rows cannot shadow each other.
# ---------------------------------------------------------------------------
_VST_STEP = 3

@_register(
    "multimodal_avi_framestride",
    f"""
    WITH t AS (SELECT doc_id, 2 + doc_id % 5 AS nf,
                      3 + doc_id % 3 AS w, 2 + doc_id % 2 AS h
               FROM documents),
    dims AS (SELECT doc_id, nf, w, h,
                    ((w * 3 + 3) - ((w * 3 + 3) % 4)) AS row_stride,
                    (nf + {_VST_STEP - 1}) // {_VST_STEP} AS nfo
             FROM t),
    fr AS (SELECT doc_id, nf, w, h, unnest(range(0, nf)) AS f FROM t),
    kept AS (SELECT doc_id, nf, w, h, f FROM fr WHERE f % {_VST_STEP} = 0),
    px AS (SELECT doc_id, nf, w, h, f, unnest(range(0, w * h)) AS k
           FROM kept),
    v AS (SELECT doc_id, nf, w, h,
                 (doc_id * 7 + f * 13 + (k // w) * 5 + (k % w) * 3) % 256 AS vr,
                 (doc_id * 7 + f * 13 + (k // w) * 5 + (k % w) * 3 + 11) % 256 AS vg,
                 (doc_id * 7 + f * 13 + (k // w) * 5 + (k % w) * 3 + 22) % 256 AS vb
          FROM px)
    SELECT v.doc_id AS media_id,
           CAST(MIN(v.nf) AS INTEGER) AS n_frames_in,
           CAST(MIN(dims.nfo) AS INTEGER) AS n_frames_out,
           CAST(MIN(v.w) AS INTEGER) AS width,
           CAST(MIN(v.h) AS INTEGER) AS height,
           CAST(MIN(100 + dims.nfo * (8 + dims.row_stride * dims.h))
                AS BIGINT) AS out_bytes,
           CAST(SUM(v.vr) AS BIGINT) AS sum_r,
           CAST(SUM(v.vg) AS BIGINT) AS sum_g,
           CAST(SUM(v.vb) AS BIGINT) AS sum_b,
           CAST(MAX(299 * v.vr + 587 * v.vg + 114 * v.vb) AS BIGINT)
               AS peak_luma_milli
    FROM v JOIN dims ON dims.doc_id = v.doc_id
    GROUP BY v.doc_id ORDER BY media_id
    """,
)
def multimodal_avi_framestride(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from vexere_lakehouse_pipeline_spark.operators.multimodal import (
        encode_avi,
        framestride_video,
    )

    docs = load_table(spark, sf_dir, "documents")

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["doc_id"]
            payloads = []
            for d in ids:
                d = int(d)
                nf, w, h = 2 + d % 5, 3 + d % 3, 2 + d % 2
                frames = [
                    [
                        (
                            (d * 7 + f * 13 + r * 5 + c * 3) % 256,
                            (d * 7 + f * 13 + r * 5 + c * 3 + 11) % 256,
                            (d * 7 + f * 13 + r * 5 + c * 3 + 22) % 256,
                        )
                        for r in range(h)
                        for c in range(w)
                    ]
                    for f in range(nf)
                ]
                payloads.append(encode_avi(w, h, frames))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.select("doc_id").repartition(
        spark.sparkContext.defaultParallelism).mapInPandas(
        synth, schema="media_id long, payload binary"
    )
    return framestride_video(media, step=_VST_STEP).orderBy("media_id")


# ---------------------------------------------------------------------------
# Exact-substring dedup (Lee et al. 2022 ExactSubstr, arXiv 2107.06499):
# every 8-token span occurring >= 2 times anywhere in the corpus is
# REMOVED from every document (not the document dropped — the span).
# The reference implementation builds a corpus suffix array on one
# machine; the distributed re-expression is span hashing: one explode
# to the token-linear span stream, one map-side-partial count, one
# anti-join.  clean_hash = md5 of the rebuilt text proves the exact
# in-order reconstruction cross-engine without shipping full texts.
# ---------------------------------------------------------------------------
_ESD_N = 8


@_register(
    "corpus_exact_substring_dedup",
    f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents),
    pidx AS (SELECT doc_id, toks,
                    unnest(range(0, greatest(len(toks) - {_ESD_N - 1}, 0)))
                        AS p
             FROM t),
    spans AS (SELECT doc_id, CAST(p AS BIGINT) AS p,
                     md5(array_to_string(
                         toks[CAST(p AS INTEGER) + 1
                              : CAST(p AS INTEGER) + {_ESD_N}],
                         ' ')) AS h
              FROM pidx),
    dup AS (SELECT h FROM spans GROUP BY h HAVING COUNT(*) >= 2),
    covered AS (SELECT DISTINCT doc_id, CAST(c AS BIGINT) AS pos
                FROM (SELECT spans.doc_id,
                             unnest(range(spans.p, spans.p + {_ESD_N})) AS c
                      FROM spans JOIN dup USING (h))),
    tokpos AS (SELECT doc_id, CAST(p AS BIGINT) AS pos,
                      toks[CAST(p AS INTEGER) + 1] AS token
               FROM (SELECT doc_id, toks,
                            unnest(range(0, len(toks))) AS p
                     FROM t)),
    kept AS (SELECT tp.doc_id, tp.pos, tp.token FROM tokpos tp
             LEFT JOIN covered c
               ON c.doc_id = tp.doc_id AND c.pos = tp.pos
             WHERE c.pos IS NULL),
    rebuilt AS (SELECT doc_id, COUNT(*) AS n_kept,
                       md5(string_agg(token, ' ' ORDER BY pos))
                           AS clean_hash
                FROM kept GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(toks) - COALESCE(n_kept, 0) AS BIGINT) AS n_removed,
           COALESCE(clean_hash, md5('')) AS clean_hash
    FROM t LEFT JOIN rebuilt USING (doc_id)
    ORDER BY t.doc_id
    """,
)
def corpus_exact_substring_dedup(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.exact_substring_clean(docs, n=_ESD_N).orderBy("doc_id")


# ---------------------------------------------------------------------------
# ExactSubstr with the paper's length threshold (Lee et al. §4.1
# remove MAXIMAL duplicated substrings >= 50 tokens; round-5 verdict
# #3): covered positions are merged into maximal contiguous runs per
# document (gaps-and-islands: pos - ROW_NUMBER within doc) and only
# runs >= min_len are removed — a duplicated n-gram quote shorter
# than the threshold SURVIVES where corpus_exact_substring_dedup
# excises it.  min_len=24 (not 50) so the threshold is exercised on
# this corpus's doc lengths; the short-quote-survival semantics are
# pinned on a crafted fixture in tests/test_dedup_similarity.py
# (test_exact_substring_min_len_keeps_short_quotes).
# ---------------------------------------------------------------------------
_ESD_MIN_LEN = 24


@_register(
    "corpus_exact_substring_runs",
    f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents),
    pidx AS (SELECT doc_id, toks,
                    unnest(range(0, greatest(len(toks) - {_ESD_N - 1}, 0)))
                        AS p
             FROM t),
    spans AS (SELECT doc_id, CAST(p AS BIGINT) AS p,
                     md5(array_to_string(
                         toks[CAST(p AS INTEGER) + 1
                              : CAST(p AS INTEGER) + {_ESD_N}],
                         ' ')) AS h
              FROM pidx),
    dup AS (SELECT h FROM spans GROUP BY h HAVING COUNT(*) >= 2),
    covered AS (SELECT DISTINCT doc_id, CAST(c AS BIGINT) AS pos
                FROM (SELECT spans.doc_id,
                             unnest(range(spans.p, spans.p + {_ESD_N})) AS c
                      FROM spans JOIN dup USING (h))),
    runs AS (SELECT doc_id, pos,
                    pos - ROW_NUMBER() OVER (PARTITION BY doc_id
                                             ORDER BY pos) AS grp
             FROM covered),
    long_runs AS (SELECT doc_id, pos FROM (
                     SELECT doc_id, pos,
                            COUNT(*) OVER (PARTITION BY doc_id, grp) AS rl
                     FROM runs) WHERE rl >= {_ESD_MIN_LEN}),
    tokpos AS (SELECT doc_id, CAST(p AS BIGINT) AS pos,
                      toks[CAST(p AS INTEGER) + 1] AS token
               FROM (SELECT doc_id, toks,
                            unnest(range(0, len(toks))) AS p
                     FROM t)),
    kept AS (SELECT tp.doc_id, tp.pos, tp.token FROM tokpos tp
             LEFT JOIN long_runs c
               ON c.doc_id = tp.doc_id AND c.pos = tp.pos
             WHERE c.pos IS NULL),
    rebuilt AS (SELECT doc_id, COUNT(*) AS n_kept,
                       md5(string_agg(token, ' ' ORDER BY pos))
                           AS clean_hash
                FROM kept GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(toks) - COALESCE(n_kept, 0) AS BIGINT) AS n_removed,
           COALESCE(clean_hash, md5('')) AS clean_hash
    FROM t LEFT JOIN rebuilt USING (doc_id)
    ORDER BY t.doc_id
    """,
)
def corpus_exact_substring_runs(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.exact_substring_clean(
        docs, n=_ESD_N, min_len=_ESD_MIN_LEN
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# URL canonicalization + canonical-URL dedup — the crawl-curation
# stage that runs BEFORE content dedup (a page fetched as
# https://WWW.site.com/a/?utm_source=x#frag and http://site.com/a is
# one document; URL-level dedup removes the refetch before any text
# is even compared).  A deterministic URL is synthesized per doc
# (four shapes by doc_id % 4, same arithmetic on both engines), then
# canonicalized with the standard rules: scheme+host lowercased,
# leading www. stripped, fragment dropped, utm_* tracking params
# removed, remaining query params SORTED, trailing slash stripped,
# empty path normalized to '/'.
#
# Portability: all parts are regexp_extract + split/filter/sort/join
# — no regex REPLACEMENT ever carries a group reference, so the
# Java-$1 vs RE2-\\1 metacharacter divergence never applies (the
# webcur module rule).  One projection + one canon-key groupBy;
# the dup census shows variants 1 and 3 collapsing across docs.
# ---------------------------------------------------------------------------


@_register(
    "text_url_canonicalize",
    r"""
    WITH u AS (
        SELECT doc_id,
               CASE CAST(doc_id % 4 AS INTEGER)
                 WHEN 0 THEN 'https://WWW.Example' || CAST(doc_id % 5 AS VARCHAR)
                      || '.com/Item/' || CAST(doc_id % 7 AS VARCHAR)
                      || '?utm_source=feed&id=' || CAST(doc_id % 97 AS VARCHAR)
                      || '&b=2#sec'
                 WHEN 1 THEN 'http://example' || CAST(doc_id % 5 AS VARCHAR)
                      || '.com/item/' || CAST(doc_id % 7 AS VARCHAR) || '/'
                 WHEN 2 THEN 'https://News.Site' || CAST(doc_id % 5 AS VARCHAR)
                      || '.org?z=9&a=1&utm_campaign=x'
                 ELSE 'http://WWW.example' || CAST(doc_id % 5 AS VARCHAR)
                      || '.com/item/' || CAST(doc_id % 7 AS VARCHAR)
               END AS url
        FROM documents
    ),
    parts AS (
        SELECT doc_id, url,
               -- COALESCE each extract: DuckDB returns NULL on no
               -- match where Spark returns '' (it would NULL the canon)
               lower(COALESCE(regexp_extract(url, '^([a-zA-Z]+)://', 1), ''))
                   AS scheme,
               lower(COALESCE(
                   regexp_extract(url, '^[a-zA-Z]+://([^/?#]+)', 1), ''))
                   AS host0,
               COALESCE(
                   regexp_extract(url, '^[a-zA-Z]+://[^/?#]+([^?#]*)', 1), '')
                   AS path0,
               COALESCE(regexp_extract(url, '\?([^#]*)', 1), '') AS query0
        FROM u
    ),
    norm AS (
        SELECT doc_id, url, scheme,
               CASE WHEN host0 LIKE 'www.%' THEN substr(host0, 5)
                    ELSE host0 END AS host,
               CASE WHEN path0 = '' THEN '/'
                    WHEN path0 <> '/' AND path0 LIKE '%/'
                      THEN substr(path0, 1, length(path0) - 1)
                    ELSE path0 END AS path,
               -- COALESCE: DuckDB's array_to_string over an EMPTY
               -- list returns NULL (Spark's array_join returns '')
               COALESCE(array_to_string(
                   list_sort(list_filter(string_split(query0, '&'),
                             p -> p <> '' AND p NOT LIKE 'utm\_%' ESCAPE '\')),
                   '&'), '') AS q
        FROM parts
    ),
    canon AS (
        SELECT doc_id, url,
               scheme || '://' || host || path
               || CASE WHEN q = '' THEN '' ELSE '?' || q END AS canon_url
        FROM norm
    )
    SELECT doc_id, url, canon_url,
           CAST(COUNT(*) OVER (PARTITION BY canon_url) AS BIGINT) AS n_dupes,
           CAST(ROW_NUMBER() OVER (PARTITION BY canon_url
                                   ORDER BY doc_id) AS BIGINT) = 1
               AS is_survivor
    FROM canon ORDER BY doc_id
    """,
)
def text_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    u = docs.select(
        "doc_id",
        F.when(
            (d % 4).cast("int") == 0,
            F.concat(
                F.lit("https://WWW.Example"), (d % 5).cast("string"),
                F.lit(".com/Item/"), (d % 7).cast("string"),
                F.lit("?utm_source=feed&id="), (d % 97).cast("string"),
                F.lit("&b=2#sec"),
            ),
        )
        .when(
            (d % 4).cast("int") == 1,
            F.concat(
                F.lit("http://example"), (d % 5).cast("string"),
                F.lit(".com/item/"), (d % 7).cast("string"), F.lit("/"),
            ),
        )
        .when(
            (d % 4).cast("int") == 2,
            F.concat(
                F.lit("https://News.Site"), (d % 5).cast("string"),
                F.lit(".org?z=9&a=1&utm_campaign=x"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("http://WWW.example"), (d % 5).cast("string"),
                F.lit(".com/item/"), (d % 7).cast("string"),
            ),
        )
        .alias("url"),
    )
    scheme = F.lower(F.regexp_extract("url", r"^([a-zA-Z]+)://", 1))
    host0 = F.lower(F.regexp_extract("url", r"^[a-zA-Z]+://([^/?#]+)", 1))
    path0 = F.regexp_extract("url", r"^[a-zA-Z]+://[^/?#]+([^?#]*)", 1)
    query0 = F.regexp_extract("url", r"\?([^#]*)", 1)
    host = F.when(
        host0.startswith("www."), F.expr("substring(host0, 5)")
    ).otherwise(host0)
    path = (
        F.when(path0 == "", F.lit("/"))
        .when(
            (path0 != "/") & path0.endswith("/"),
            F.expr("substring(path0, 1, length(path0) - 1)"),
        )
        .otherwise(path0)
    )
    q = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query0, "&"),
                lambda p: (p != "") & ~p.startswith("utm_"),
            )
        ),
        "&",
    )
    canon = (
        u.withColumn("scheme", scheme)
        .withColumn("host0", host0)
        .withColumn("path0", path0)
        .withColumn("query0", query0)
        .select(
            "doc_id",
            "url",
            F.concat(
                F.col("scheme"), F.lit("://"), host, path,
                F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
            ).alias("canon_url"),
        )
    )
    wc = Window.partitionBy("canon_url")
    wr = Window.partitionBy("canon_url").orderBy("doc_id")
    return canon.select(
        "doc_id",
        "url",
        "canon_url",
        F.count("*").over(wc).cast("long").alias("n_dupes"),
        (F.row_number().over(wr) == 1).alias("is_survivor"),
    ).orderBy("doc_id")

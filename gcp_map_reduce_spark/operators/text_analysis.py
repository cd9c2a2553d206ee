"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, fingerprinting.

The reference's only text analytics are wordcount / inverted index; these
are the corpus-curation operators a 100 TB text pipeline needs. All are
single-scan, groupBy-free (per-row expressions) or one narrow aggregation,
fully JVM-side (regexp/array built-ins — no Python UDFs), so they pipeline
inside one codegen stage and scale linearly.

Determinism: scores are integer counts and ratios of integer counts
(single double division) — identical across engines; classification is a
fixed-priority argmax over integer scores.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_map_reduce_spark.functions.text import WS_SPLIT, normalize_text, sql_normalize
from gcp_map_reduce_spark.plans.registry import query
from gcp_map_reduce_spark.sources.tables import load_table

# Language marker stopwords (tiny on purpose: the operator demonstrates
# n-gram-free marker scoring; swap in real profiles for production).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "a"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "las", "y", "una"],
    "de": ["der", "die", "das", "und", "ein"],
}

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]

# BPE-ish tokenizer regex: letter runs | digit runs | single non-space
# symbol. RE2- and Java-compatible (no lookarounds).
_BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
_BPE_RE_SQL = "[a-z]+|[0-9]+|[^a-z0-9[:space:]]"


def _marker_score(words: Column, markers: list[str]) -> Column:
    lits = [F.lit(m) for m in markers]
    return F.size(F.filter(words, lambda t: t.isin(*lits)))


def _sql_marker_score(markers: list[str]) -> str:
    inlist = ", ".join(f"'{m}'" for m in markers)
    return (
        f"len(list_filter(regexp_split_to_array(lower(text), '{WS_SPLIT}'), "
        f"t -> t IN ({inlist})))"
    )


@query(
    "text_langid",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang AS labeled_lang,
    {_sql_marker_score(LANG_MARKERS['en'])} AS s_en,
    {_sql_marker_score(LANG_MARKERS['fr'])} AS s_fr,
    {_sql_marker_score(LANG_MARKERS['es'])} AS s_es,
    {_sql_marker_score(LANG_MARKERS['de'])} AS s_de,
    length(text) - length(regexp_replace(text, '[\\x{{4e00}}-\\x{{9fff}}]', '', 'g')) AS s_zh
  FROM documents
)
SELECT doc_id, labeled_lang,
  CASE
    WHEN s_zh > 0 THEN 'zh'
    WHEN greatest(s_en, s_fr, s_es, s_de) = 0 THEN 'unknown'
    WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en'
    WHEN s_fr >= s_es AND s_fr >= s_de THEN 'fr'
    WHEN s_es >= s_de THEN 'es'
    ELSE 'de'
  END AS detected_lang
FROM scored
""",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-stopword language ID with fixed-priority argmax (en > fr >
    es > de on ties; CJK codepoint presence short-circuits to zh)."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.lower(F.col("text")), WS_SPLIT)
    scores = {
        lang: _marker_score(words, mk).alias(f"s_{lang}")
        for lang, mk in LANG_MARKERS.items()
    }
    s_zh = (
        F.length("text")
        - F.length(F.regexp_replace("text", "[\\x{4e00}-\\x{9fff}]", ""))
    ).alias("s_zh")
    scored = docs.select(
        "doc_id", F.col("lang").alias("labeled_lang"), *scores.values(), s_zh
    )
    detected = (
        F.when(F.col("s_zh") > 0, "zh")
        .when(F.greatest("s_en", "s_fr", "s_es", "s_de") == 0, "unknown")
        .when(
            (F.col("s_en") >= F.col("s_fr"))
            & (F.col("s_en") >= F.col("s_es"))
            & (F.col("s_en") >= F.col("s_de")),
            "en",
        )
        .when((F.col("s_fr") >= F.col("s_es")) & (F.col("s_fr") >= F.col("s_de")), "fr")
        .when(F.col("s_es") >= F.col("s_de"), "es")
        .otherwise("de")
    )
    return scored.select("doc_id", "labeled_lang", detected.alias("detected_lang"))


@query(
    "text_quality",
    oracle=f"""
WITH m AS (
  SELECT doc_id, length(text) AS n_chars,
    len(list_filter(regexp_split_to_array({sql_normalize('text')}, '{WS_SPLIT}'),
        t -> t <> '')) AS n_tokens,
    len(list_filter(regexp_split_to_array(lower(text), '{WS_SPLIT}'),
        t -> t IN ({", ".join(f"'{w}'" for w in STOPWORDS)}))) AS n_stop,
    length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS n_punct,
    length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit
  FROM documents
)
SELECT doc_id, n_chars, n_tokens,
  CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1) AS stopword_ratio,
  CAST(n_punct AS DOUBLE) / greatest(n_chars, 1) AS punct_ratio,
  CAST(n_digit AS DOUBLE) / greatest(n_chars, 1) AS digit_ratio,
  CAST(n_chars AS DOUBLE) / greatest(n_tokens, 1) AS chars_per_token,
  CASE WHEN n_tokens >= 20
        AND CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1) >= 0.01
        AND CAST(n_punct AS DOUBLE) / greatest(n_chars, 1) < 0.2
       THEN 1 ELSE 0 END AS passes_quality
FROM m
""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document-quality metrics (Gopher-rules style): length,
    stopword density, punctuation/digit ratios, plus a pass/fail gate.
    Integer counts + one double division each -> engine-exact."""
    docs = load_table(spark, sf_dir, "documents")
    norm_words = F.split(normalize_text(F.col("text")), WS_SPLIT)
    low_words = F.split(F.lower(F.col("text")), WS_SPLIT)
    m = docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(F.filter(norm_words, lambda t: t != "")).alias("n_tokens"),
        _marker_score(low_words, STOPWORDS).alias("n_stop"),
        F.length(F.regexp_replace("text", r"[^\p{Punct}]", "")).alias("n_punct"),
        F.length(F.regexp_replace("text", "[^0-9]", "")).alias("n_digit"),
    )
    g = lambda c: F.greatest(F.col(c), F.lit(1))  # noqa: E731
    stop_ratio = F.col("n_stop").cast("double") / g("n_tokens")
    punct_ratio = F.col("n_punct").cast("double") / g("n_chars")
    return m.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        (F.col("n_digit").cast("double") / g("n_chars")).alias("digit_ratio"),
        (F.col("n_chars").cast("double") / g("n_tokens")).alias("chars_per_token"),
        F.when(
            (F.col("n_tokens") >= 20) & (stop_ratio >= 0.01) & (punct_ratio < 0.2),
            1,
        )
        .otherwise(0)
        .alias("passes_quality"),
    )


@query(
    "token_count_regex",
    oracle=f"""
SELECT doc_id,
  len(list_filter(regexp_split_to_array(text, '{WS_SPLIT}'), t -> t <> '')) AS n_ws_tokens,
  len(regexp_extract_all(lower(text), '{_BPE_RE_SQL}')) AS n_bpe_tokens,
  CAST(length(text) AS DOUBLE)
    / greatest(len(regexp_extract_all(lower(text), '{_BPE_RE_SQL}')), 1)
    AS chars_per_bpe_token
FROM documents
""",
)
def token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    (letter runs / digit runs / single symbols) — the cheap proxy for LLM
    token budgeting over a corpus."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), WS_SPLIT)
    n_bpe = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(_BPE_RE), 0))
    return docs.select(
        "doc_id",
        F.size(F.filter(ws, lambda t: t != "")).alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        (F.length("text").cast("double") / F.greatest(n_bpe, F.lit(1))).alias(
            "chars_per_bpe_token"
        ),
    )


@query(
    "doc_fingerprint",
    oracle=f"""
SELECT doc_id, md5({sql_normalize('text')}) AS fp,
  substring(md5({sql_normalize('text')}), 1, 16) AS fp64,
  length({sql_normalize('text')}) AS n_norm_chars
FROM documents
""",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint over normalized text (md5 + 64-bit prefix) —
    the join key for exact dedup across shards/snapshots."""
    docs = load_table(spark, sf_dir, "documents")
    norm = normalize_text(F.col("text"))
    fp = F.md5(norm)
    return docs.select(
        "doc_id",
        fp.alias("fp"),
        F.substring(fp, 1, 16).alias("fp64"),
        F.length(norm).alias("n_norm_chars"),
    )


@query(
    "corpus_lang_stats",
    oracle="""
SELECT lang, source, count(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  CAST(SUM(n_chars) AS DOUBLE) / count(*) AS avg_chars
FROM documents GROUP BY lang, source
""",
)
def corpus_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition rollup by (lang, source) — integer sums, exact."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
    )


# -- TF-IDF + n-grams ------------------------------------------------------

from gcp_map_reduce_spark.functions.text import sql_tokens_cte, tokenize  # noqa: E402


@query(
    "text_tfidf",
    oracle=f"""
WITH toks AS ({sql_tokens_cte()}),
tf AS (
  SELECT doc_id, word, count(*) AS tf FROM toks WHERE word <> ''
  GROUP BY doc_id, word
),
df AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf)
SELECT tf.doc_id, tf.word, tf.tf, df.df, n.n_docs
FROM tf JOIN df USING (word) CROSS JOIN n
""",
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF components per (doc, word): term frequency, document
    frequency, corpus size — all exact integers, so the oracle hash-checks
    the whole statistical substrate. The ln-based score lives in
    :func:`tfidf_score` because ln() differs between engines in the last
    ulp (measured: ~1% of integer arguments) and can't value-hash.

    Plan shape: tf is one shuffle on (doc_id, word); df is a map-side-
    combinable reaggregation of tf (NOT a second corpus scan); n_docs and
    df broadcast back onto tf.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokenize(docs, text_col="text", out_col="word", keep_cols=["doc_id"])
    tf = toks.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df = tf.groupBy("word").agg(F.count("*").alias("df"))
    n = tf.select(F.count_distinct("doc_id").alias("n_docs"))
    return tf.join(F.broadcast(df), "word").crossJoin(F.broadcast(n)).select(
        "doc_id", "word", "tf", "df", "n_docs"
    )


def tfidf_score(components: DataFrame) -> DataFrame:
    """Add the smoothed TF-IDF score to :func:`text_tfidf` output:
    ``tf * (ln((n_docs + 1) / (df + 1)) + 1)`` (sklearn-style smoothing).
    Kept outside the oracle gate (see text_tfidf docstring)."""
    idf = (
        F.log((F.col("n_docs") + F.lit(1)) / (F.col("df") + F.lit(1)))
        + F.lit(1.0)
    )
    return components.withColumn("tfidf", F.col("tf") * idf)


@query(
    "corpus_bigrams",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array({sql_normalize('text')}, '{WS_SPLIT}') AS w
  FROM documents
),
grams AS (
  SELECT doc_id, w[i] || ' ' || w[i+1] AS bigram
  FROM toks, UNNEST(range(1, len(w))) AS t(i)
  WHERE len(w) >= 2
)
SELECT bigram, count(*) AS n_occurrences,
  count(DISTINCT doc_id) AS n_docs
FROM grams GROUP BY bigram
""",
)
def corpus_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram statistics (occurrences + doc frequency) — the
    n-gram counting path, built array-natively like the dedup shingles
    (zip_with over a shifted slice; no per-token shuffle)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    w = F.filter(
        F.split(normalize_text(F.col("text")), WS_SPLIT), lambda t: t != ""
    )
    shifted = F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0)))
    grams = F.zip_with(
        w,
        shifted,
        lambda g, t: F.when(g.isNull() | t.isNull(), F.lit(None)).otherwise(
            F.concat(g, F.lit(" "), t)
        ),
    )
    flat = docs.select(
        "doc_id",
        F.explode(F.filter(grams, lambda x: x.isNotNull())).alias("bigram"),
    )
    return flat.groupBy("bigram").agg(
        F.count("*").alias("n_occurrences"),
        F.count_distinct("doc_id").alias("n_docs"),
    )

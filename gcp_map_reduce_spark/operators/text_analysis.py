"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, fingerprinting.

The reference's only text analytics are wordcount / inverted index; these
are the corpus-curation operators a 100 TB text pipeline needs. All are
single-scan, groupBy-free (per-row expressions) or one narrow aggregation,
fully JVM-side (regexp/array built-ins — no Python UDFs), so they pipeline
inside one codegen stage and scale linearly.

The per-document operators (language ID, quality metrics, token counts,
fingerprints, token statistics) are registered as ONE consolidated
``text_profile`` query: they share the same scan and the same per-row
execution shape, so one wide select is both the natural plan (a 100 TB
profiling pass computes every per-doc metric in one read) and one driver
correctness row covering all of them. The individual builders remain
importable for composition (``pipeline.py`` uses ``text_quality``).

Determinism: scores are integer counts and ratios of integer counts
(single double division) — identical across engines; classification is a
fixed-priority argmax over integer scores.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_map_reduce_spark.functions.text import (
    NON_WS,
    WS_SPLIT,
    normalize_text,
    sql_normalize,
)
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


def _detected_lang() -> Column:
    """Fixed-priority argmax over the marker scores (en > fr > es > de on
    ties; CJK codepoint presence short-circuits to zh)."""
    return (
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


_SQL_DETECTED = """
  CASE
    WHEN s_zh > 0 THEN 'zh'
    WHEN greatest(s_en, s_fr, s_es, s_de) = 0 THEN 'unknown'
    WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en'
    WHEN s_fr >= s_es AND s_fr >= s_de THEN 'fr'
    WHEN s_es >= s_de THEN 'es'
    ELSE 'de'
  END
"""


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-stopword language ID (library form; registered via
    ``text_profile``)."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.lower(F.col("text")), WS_SPLIT)
    scores = {
        lang: _marker_score(words, mk).alias(f"s_{lang}")
        for lang, mk in LANG_MARKERS.items()
    }
    # count matches directly — a char-class regexp_count is one scan with
    # no replacement-string build (the replace-and-measure form was ~2x
    # the cost at the sf1 stress scale; identical integers either way)
    s_zh = F.regexp_count("text", F.lit("[\\x{4e00}-\\x{9fff}]")).alias("s_zh")
    scored = docs.select(
        "doc_id", F.col("lang").alias("labeled_lang"), *scores.values(), s_zh
    )
    return scored.select("doc_id", "labeled_lang", _detected_lang().alias("detected_lang"))


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document-quality metrics (Gopher-rules style): length,
    stopword density, punctuation/digit ratios, plus a pass/fail gate.
    Integer counts + one double division each -> engine-exact.
    (Library form; registered via ``text_profile``.)"""
    docs = load_table(spark, sf_dir, "documents")
    norm_words = F.split(normalize_text(F.col("text")), WS_SPLIT)
    low_words = F.split(F.lower(F.col("text")), WS_SPLIT)
    m = docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(F.filter(norm_words, lambda t: t != "")).alias("n_tokens"),
        _marker_score(low_words, STOPWORDS).alias("n_stop"),
        F.regexp_count("text", F.lit(r"[\p{Punct}]")).alias("n_punct"),
        F.regexp_count("text", F.lit("[0-9]")).alias("n_digit"),
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
    "text_profile",
    oracle=f"""
WITH m AS (
  SELECT doc_id, lang AS labeled_lang, text,
    {_sql_marker_score(LANG_MARKERS['en'])} AS s_en,
    {_sql_marker_score(LANG_MARKERS['fr'])} AS s_fr,
    {_sql_marker_score(LANG_MARKERS['es'])} AS s_es,
    {_sql_marker_score(LANG_MARKERS['de'])} AS s_de,
    length(text) - length(regexp_replace(text, '[\\x{{4e00}}-\\x{{9fff}}]', '', 'g')) AS s_zh,
    length(text) AS n_chars,
    list_filter(regexp_split_to_array({sql_normalize('text')}, '{WS_SPLIT}'),
        t -> t <> '') AS w,
    len(list_filter(regexp_split_to_array(lower(text), '{WS_SPLIT}'),
        t -> t IN ({", ".join(f"'{w}'" for w in STOPWORDS)}))) AS n_stop,
    length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS n_punct,
    length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
    len(list_filter(regexp_split_to_array(text, '{WS_SPLIT}'), t -> t <> '')) AS n_ws_tokens,
    len(regexp_extract_all(lower(text), '{_BPE_RE_SQL}')) AS n_bpe_tokens,
    md5({sql_normalize('text')}) AS fp,
    length({sql_normalize('text')}) AS n_norm_chars
  FROM documents
),
t AS (SELECT *, len(w) AS n_tokens FROM m)
SELECT doc_id, labeled_lang,
  {_SQL_DETECTED} AS detected_lang,
  n_chars, n_tokens,
  CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1) AS stopword_ratio,
  CAST(n_punct AS DOUBLE) / greatest(n_chars, 1) AS punct_ratio,
  CAST(n_digit AS DOUBLE) / greatest(n_chars, 1) AS digit_ratio,
  CAST(n_chars AS DOUBLE) / greatest(n_tokens, 1) AS chars_per_token,
  CASE WHEN n_tokens >= 20
        AND CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1) >= 0.01
        AND CAST(n_punct AS DOUBLE) / greatest(n_chars, 1) < 0.2
       THEN 1 ELSE 0 END AS passes_quality,
  n_ws_tokens, n_bpe_tokens,
  CAST(n_chars AS DOUBLE) / greatest(n_bpe_tokens, 1) AS chars_per_bpe_token,
  fp, substring(fp, 1, 16) AS fp64, n_norm_chars,
  len(list_distinct(w)) AS n_distinct_tokens,
  CASE WHEN n_tokens > 0
       THEN CAST(list_aggregate(list_transform(w, t -> length(t)), 'sum') AS DOUBLE)
            / n_tokens
       ELSE NULL END AS avg_word_len
FROM t
""",
)
def text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consolidated per-document profiling pass: language ID, quality
    metrics + gate, token counts (whitespace + BPE-ish regex), content
    fingerprints, and token statistics — every per-doc metric a curation
    pipeline wants, in ONE scan and one codegen stage.

    Token statistics (count/distinct/avg length) are array-native over the
    normalized token array — zero shuffle, unlike a groupBy over exploded
    tokens. Consolidates the formerly separate text_langid / text_quality /
    token_count_regex / doc_fingerprint / token_stats_per_doc queries
    (same expressions, same oracles — now one driver row).
    """
    # heaviest per-row regex pass in the text family; fan out the
    # degenerate single-split local scan (no-op at real scale)
    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents"),
        spark.sparkContext.defaultParallelism,
    )
    low_words = F.split(F.lower(F.col("text")), WS_SPLIT)
    norm = normalize_text(F.col("text"))
    w = F.filter(F.split(norm, WS_SPLIT), lambda t: t != "")
    n_bpe = F.regexp_count(F.lower(F.col("text")), F.lit(_BPE_RE))
    fp = F.md5(norm)
    scores = {
        lang: _marker_score(low_words, mk).alias(f"s_{lang}")
        for lang, mk in LANG_MARKERS.items()
    }
    # count matches directly — a char-class regexp_count is one scan with
    # no replacement-string build (the replace-and-measure form was ~2x
    # the cost at the sf1 stress scale; identical integers either way)
    s_zh = F.regexp_count("text", F.lit("[\\x{4e00}-\\x{9fff}]")).alias("s_zh")
    m = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *scores.values(),
        s_zh,
        F.length("text").alias("n_chars"),
        w.alias("w"),
        _marker_score(low_words, STOPWORDS).alias("n_stop"),
        F.regexp_count("text", F.lit(r"[\p{Punct}]")).alias("n_punct"),
        F.regexp_count("text", F.lit("[0-9]")).alias("n_digit"),
        F.regexp_count("text", F.lit(NON_WS + "+")).alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        fp.alias("fp"),
        F.length(norm).alias("n_norm_chars"),
        F.regexp_count(norm, F.lit(NON_WS)).alias("n_nonws"),
    ).withColumn("n_tokens", F.size("w"))
    g = lambda c: F.greatest(F.col(c), F.lit(1))  # noqa: E731
    stop_ratio = F.col("n_stop").cast("double") / g("n_tokens")
    punct_ratio = F.col("n_punct").cast("double") / g("n_chars")
    return m.select(
        "doc_id",
        "labeled_lang",
        _detected_lang().alias("detected_lang"),
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
        "n_ws_tokens",
        "n_bpe_tokens",
        (F.col("n_chars").cast("double") / g("n_bpe_tokens")).alias(
            "chars_per_bpe_token"
        ),
        "fp",
        F.substring("fp", 1, 16).alias("fp64"),
        "n_norm_chars",
        F.size(F.array_distinct("w")).alias("n_distinct_tokens"),
        # sum(len(token)) == count of non-whitespace chars in the
        # normalized text (tokens are exactly its maximal non-ws runs) —
        # one char-class count instead of an interpreted per-token
        # transform+aggregate lambda chain (CodegenFallback)
        F.when(
            F.col("n_tokens") > 0,
            F.col("n_nonws").cast("double") / F.col("n_tokens"),
        ).alias("avg_word_len"),
    )


# -- TF-IDF + n-grams ------------------------------------------------------

from gcp_map_reduce_spark.functions.text import sql_tokens_cte, tokenize  # noqa: E402
from gcp_map_reduce_spark.operators.scale import ensure_parallelism  # noqa: E402


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
    # Fan out ONLY if the scan under-splits (tiny local files); at scale
    # the scan's own splits carry the per-row work with no Exchange.
    docs = ensure_parallelism(docs, spark.sparkContext.defaultParallelism)
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


RARE_FREQ_MAX = 2  # corpus frequency <= this marks a token "rare"


def token_rarity_scores(
    spark: SparkSession, sf_dir: str, rare_freq_max: int = RARE_FREQ_MAX
) -> DataFrame:
    """Per-document rarity signals from a self-trained unigram table —
    the deterministic cousin of LM-perplexity quality scoring (rare-token
    density is the signal; no transcendental math, so every value is an
    exact integer ratio and reproducible across engines):

    - ``mean_token_freq``: average corpus frequency of the doc's tokens
      (high = templated/common text, low = rare/noisy text);
    - ``rare_ratio``: fraction of the doc's token OCCURRENCES whose
      corpus frequency is <= ``rare_freq_max`` (hapax-ish density).

    Plan: one tokenize pass builds the unigram table (groupBy word —
    the vocabulary, orders of magnitude smaller than the corpus), a
    second joins tokens to it and re-aggregates per doc. At 100 TB the
    unigram table is still broadcast-size after pruning to the rare set
    for ``rare_ratio``; the mean needs the full table, so that leg
    shuffles on word — the standard two-pass frequency-feature shape.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokenize(docs, text_col="text", out_col="word", keep_cols=["doc_id"])
    uni = toks.groupBy("word").agg(F.count("*").alias("freq"))
    return (
        toks.join(uni, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            (F.sum("freq").cast("double") / F.count("*")).alias(
                "mean_token_freq"
            ),
            (
                F.sum(
                    F.when(F.col("freq") <= rare_freq_max, 1).otherwise(0)
                ).cast("double")
                / F.count("*")
            ).alias("rare_ratio"),
        )
    )

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
from gcp_map_reduce_spark.plans.probes import corpus_key
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
    (Library form; registered via ``text_profile`` and the quality leg
    of ``curated_corpus``; :func:`text_quality_df` is the df-level core
    the streaming curation pipeline applies per micro-batch.)"""
    # per-row regex CPU on a possibly single-row-group scan: without the
    # fan-out this leg was a ONE-task 4.2 s straggler inside
    # curated_corpus at the sf1 stress set (11-task stage, median 9 ms)
    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents"),
        spark.sparkContext.defaultParallelism,
        cache_key=corpus_key(sf_dir, "documents"),
    )
    return text_quality_df(docs)


def text_quality_df(docs: DataFrame) -> DataFrame:
    """Df-level form of :func:`text_quality`: same expressions over any
    (doc_id, text, ...) relation — shared verbatim by the batch operator
    and the streaming curation gate so the pass/fail decision cannot
    drift between them."""
    norm_words = F.split(normalize_text(F.col("text"), trim=False), WS_SPLIT)
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
def text_profile(
    spark: SparkSession, sf_dir: str, engine: str = "arrow"
) -> DataFrame:
    """The consolidated per-document profiling pass: language ID, quality
    metrics + gate, token counts (whitespace + BPE-ish regex), content
    fingerprints, and token statistics — every per-doc metric a curation
    pipeline wants, in ONE scan and one stage.

    Consolidates the formerly separate text_langid / text_quality /
    token_count_regex / doc_fingerprint / token_stats_per_doc queries
    (same metrics, same oracles — now one driver row).

    ``engine`` picks the per-row metric implementation; both feed the
    same final projection (:func:`_profile_finalize`) and are row-equal
    (pytest-gated on the real corpus):

    - ``"expr"``: JVM expression form — ~10 regex/array passes per row,
      each individually cheap, but the query's whole cost IS this sum
      (measured at the sf1 stress set: no single hot regex, 6 x ~0.2 s
      marginal each). This remains the executable spec and the shape the
      SQL oracle mirrors.
    - ``"arrow"`` (default): ONE vectorized pass per row
      (:func:`profile_metrics_arrow`) — codepoint masks for the
      char-class counts, one token Counter for the marker scores,
      C-level str ops + md5 for the fingerprint. Measured best-of-3:
      3.07 -> 0.96 s at the sf1 stress set (3.2x, row-identical) and
      0.76 -> 0.66 s at sf0.1 — the same Arrow-kernel boundary rule as
      the dedup family: the win condition is many per-char interpreted
      passes over the same text, and this query is made of exactly that.
    """
    if engine not in ("expr", "arrow"):
        raise ValueError(f"engine must be 'expr' or 'arrow', got {engine!r}")
    # heaviest per-row pass in the text family; fan out the degenerate
    # single-split local scan (no-op at real scale)
    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents"),
        spark.sparkContext.defaultParallelism,
        cache_key=corpus_key(sf_dir, "documents"),
    )
    metrics = (
        profile_metrics_arrow(docs)
        if engine == "arrow"
        else _profile_metrics_expr(docs)
    )
    return _profile_finalize(metrics)


# m-level metric schema shared by the expression and Arrow forms
_PROFILE_METRICS_SCHEMA = (
    "doc_id long, labeled_lang string, "
    "s_en int, s_fr int, s_es int, s_de int, s_zh int, "
    "n_chars int, n_tokens int, n_distinct_tokens int, n_stop int, "
    "n_punct int, n_digit int, n_ws_tokens int, n_bpe_tokens int, "
    "fp string, n_norm_chars int, n_nonws int"
)


def _profile_metrics_expr(docs: DataFrame) -> DataFrame:
    """Expression-form per-document metrics — the executable spec the
    SQL oracle mirrors and the Arrow kernel is gated against."""
    low_words = F.split(F.lower(F.col("text")), WS_SPLIT)
    norm = normalize_text(F.col("text"))
    w = F.filter(F.split(norm, WS_SPLIT), lambda t: t != "")
    n_bpe = F.regexp_count(F.lower(F.col("text")), F.lit(_BPE_RE))
    scores = {
        lang: _marker_score(low_words, mk).alias(f"s_{lang}")
        for lang, mk in LANG_MARKERS.items()
    }
    # count matches directly — a char-class regexp_count is one scan with
    # no replacement-string build (the replace-and-measure form was ~2x
    # the cost at the sf1 stress scale; identical integers either way)
    s_zh = F.regexp_count("text", F.lit("[\\x{4e00}-\\x{9fff}]")).alias("s_zh")
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *scores.values(),
        s_zh,
        F.length("text").alias("n_chars"),
        F.size(w).alias("n_tokens"),
        F.size(F.array_distinct(w)).alias("n_distinct_tokens"),
        _marker_score(low_words, STOPWORDS).alias("n_stop"),
        F.regexp_count("text", F.lit(r"[\p{Punct}]")).alias("n_punct"),
        F.regexp_count("text", F.lit("[0-9]")).alias("n_digit"),
        F.regexp_count("text", F.lit(NON_WS + "+")).alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        F.md5(norm).alias("fp"),
        F.length(norm).alias("n_norm_chars"),
        F.regexp_count(norm, F.lit(NON_WS)).alias("n_nonws"),
    )


def profile_metrics_arrow(docs: DataFrame) -> DataFrame:
    """One-pass Arrow kernel computing every per-document profile metric,
    row-identical to :func:`_profile_metrics_expr` (the executable spec;
    equality pytest-gated on the real corpus in
    ``tests/test_text_analysis.py``).

    Why: the expression form is ~10 independent interpreted regex/array
    passes over the same text per row — at the sf1 stress set they are
    the entire cost of ``text_profile`` (82 s stage CPU, no single hot
    pass). This kernel replaces them with one pass per row of C-speed
    primitives, streaming over Arrow batches — no shuffle, bounded
    memory, measured ~2x end-to-end at stress.

    Exactness notes (why each metric matches the JVM form):

    - char-class counts (digits, ASCII punct = Java ``\\p{Punct}``'s 32
      chars, the CJK block, the explicit 10-char WS class) are codepoint
      range/table masks — identical sets by construction;
    - run counts (``NON_WS+``, the BPE alternation) are mask transition
      sums; the BPE "other symbol" arm uses Java's 6-char ``\\s`` (NOT
      the 10-char class — ``\\x1C-\\x1F`` are \\p{Punct}-free symbols
      that the Java regex DOES count);
    - marker/stopword scores split the LOWERED RAW text on the explicit
      WS class via ``re.split`` (NOT ``str.split()``, whose Unicode
      whitespace set would split tokens the Java class keeps intact) and
      count via a token Counter;
    - the normalization chain (punct delete -> lower -> ASCII delete ->
      WS-class strip) runs as C-level ``str.translate`` /
      ``encode('ascii','ignore')`` / ``strip``; after the ASCII fold the
      WS class equals Python's ASCII whitespace set so ``.split()`` is
      exact (the WS_CLASS design invariant, property-tested);
    - ``lower()``: Python ``str.lower()`` vs the JVM's — both implement
      Unicode simple+special lowercase; equality on the corpus is what
      the pytest gate pins (any future divergence fails loudly there).
    """
    import hashlib
    import re as _re
    import string as _string

    import numpy as np
    import pandas as pd

    ws_chars = " \t\n\x0b\f\r\x1c\x1d\x1e\x1f"
    ws_split_re = _re.compile("[" + ws_chars.replace("\\", "\\\\") + "]+")
    punct_del = {ord(c): None for c in _string.punctuation}
    marker_sets = {lang: set(mk) for lang, mk in LANG_MARKERS.items()}
    stop_set = set(STOPWORDS)

    def kernel(batches):
        from collections import Counter

        # codepoint class tables (BMP+: full range, bool per codepoint)
        punct_tab = np.zeros(0x110000, dtype=bool)
        for c in _string.punctuation:
            punct_tab[ord(c)] = True
        ws_tab = np.zeros(0x110000, dtype=bool)
        for c in ws_chars:
            ws_tab[ord(c)] = True
        # Java \s for the BPE regex: [ \t\n\x0B\f\r] ONLY
        jss_tab = np.zeros(0x110000, dtype=bool)
        for c in " \t\n\x0b\f\r":
            jss_tab[ord(c)] = True

        def runs(mask: np.ndarray) -> int:
            if not len(mask):
                return 0
            return int(mask[0]) + int((mask[1:] & ~mask[:-1]).sum())

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            ints = {
                k: np.zeros(n, dtype=np.int32)
                for k in (
                    "s_en", "s_fr", "s_es", "s_de", "s_zh", "n_chars",
                    "n_tokens", "n_distinct_tokens", "n_stop", "n_punct",
                    "n_digit", "n_ws_tokens", "n_bpe_tokens",
                    "n_norm_chars", "n_nonws",
                )
            }
            fps = []
            null_rows = np.zeros(n, dtype=bool)
            for i, t in enumerate(pdf["text"]):
                if t is None:
                    # expr parity: every metric expression propagates
                    # the null (regexp_count/size/length/md5 of NULL
                    # are NULL); mask this row to nulls after the loop
                    null_rows[i] = True
                    fps.append(None)
                    continue
                cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
                ints["n_chars"][i] = len(cp)
                ints["n_digit"][i] = int(((cp >= 48) & (cp <= 57)).sum())
                ints["n_punct"][i] = int(punct_tab[cp].sum())
                ints["s_zh"][i] = int(((cp >= 0x4E00) & (cp <= 0x9FFF)).sum())
                ints["n_ws_tokens"][i] = runs(~ws_tab[cp])
                low = t.lower()
                lo = np.frombuffer(low.encode("utf-32-le"), dtype=np.uint32)
                alpha = (lo >= 97) & (lo <= 122)
                digit = (lo >= 48) & (lo <= 57)
                other = ~jss_tab[lo] & ~alpha & ~digit
                ints["n_bpe_tokens"][i] = (
                    runs(alpha) + runs(digit) + int(other.sum())
                )
                cnt = Counter(ws_split_re.split(low))
                for lang, mk in marker_sets.items():
                    ints[f"s_{lang}"][i] = sum(cnt[w] for w in mk)
                ints["n_stop"][i] = sum(cnt[w] for w in stop_set)
                norm = (
                    t.translate(punct_del)
                    .lower()
                    .encode("ascii", "ignore")
                    .decode("ascii")
                    .strip(ws_chars)
                )
                fps.append(hashlib.md5(norm.encode("utf-8")).hexdigest())
                ints["n_norm_chars"][i] = len(norm)
                toks = norm.split()  # pure ASCII: == the WS class split
                ints["n_tokens"][i] = len(toks)
                ints["n_distinct_tokens"][i] = len(set(toks))
                ints["n_nonws"][i] = sum(len(w) for w in toks)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "labeled_lang": pdf["lang"],
                }
            )
            for k, v in ints.items():
                if null_rows.any():
                    s = pd.array(v, dtype="Int32")
                    s[null_rows] = pd.NA
                    out[k] = s
                else:
                    out[k] = v
            out["fp"] = fps
            # column order must match the declared schema
            yield out[
                [
                    "doc_id", "labeled_lang", "s_en", "s_fr", "s_es",
                    "s_de", "s_zh", "n_chars", "n_tokens",
                    "n_distinct_tokens", "n_stop", "n_punct", "n_digit",
                    "n_ws_tokens", "n_bpe_tokens", "fp", "n_norm_chars",
                    "n_nonws",
                ]
            ]

    return docs.select("doc_id", "lang", "text").mapInPandas(
        kernel, _PROFILE_METRICS_SCHEMA
    )


def _profile_finalize(m: DataFrame) -> DataFrame:
    """Shared final projection over the m-level metrics: ratios, the
    quality gate, language argmax, fingerprint prefix — trivial JVM
    arithmetic, identical for both metric engines."""
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
        "n_distinct_tokens",
        # sum(len(token)) == count of non-whitespace chars in the
        # normalized text (tokens are exactly its maximal non-ws runs)
        F.when(
            F.col("n_tokens") > 0,
            F.col("n_nonws").cast("double") / F.col("n_tokens"),
        ).alias("avg_word_len"),
    )


# -- TF-IDF + n-grams ------------------------------------------------------

from gcp_map_reduce_spark.functions.text import sql_tokens_cte, tokenize  # noqa: E402
from gcp_map_reduce_spark.operators.scale import ensure_parallelism, materialize  # noqa: E402


_TFIDF_ORACLE = f"""
WITH toks AS ({sql_tokens_cte()}),
tf AS (
  SELECT doc_id, word, count(*) AS tf FROM toks WHERE word <> ''
  GROUP BY doc_id, word
),
df AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf)
SELECT tf.doc_id, tf.word, tf.tf, df.df, n.n_docs
FROM tf JOIN df USING (word) CROSS JOIN n
"""


def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF components per (doc, word): term frequency, document
    frequency, corpus size — all exact integers, so the oracle hash-checks
    the whole statistical substrate. The ln-based score lives in
    :func:`tfidf_score` because ln() differs between engines in the last
    ulp (measured: ~1% of integer arguments) and can't value-hash.

    Plan shape: tf is one shuffle on (doc_id, word), MATERIALIZED before
    its three consumers (r8, measured): tf feeds the output, the df
    broadcast, and the n_docs broadcast — without the checkpoint each
    broadcast leg re-executes the whole scan+tokenize+tf subtree as its
    own query stage (three concurrent 50k-doc tokenizes profiled at
    stress, one ~2.6 s single-split task each). With the checkpoint plus
    the degenerate-split fan-out the tokenize runs ONCE across all
    cores: 3.04 -> 1.70 s at the sf1 stress set AND 0.71 -> 0.66 s at
    sf0.1 — this REVERSES the r7 fan-out-only adjudication (+42% at
    sf0.1 then), because the exchange is now paid once instead of once
    per recompute; the checkpoint is |distinct (doc, word)| rows, the
    standard cut at 100 TB.

    EAGER at plan-build (r16 contract, documented per r16 ADVICE):
    calling this function runs Spark jobs — the tf checkpoint and the
    1-row n_docs scalar collect — before any action on the returned
    DataFrame. Plan-only consumers (explain/plan-capture tooling,
    composition that may discard the plan) pay that compute; this is the
    measured bench tradeoff of the scalar-literal pattern, shared with
    :func:`gcp_map_reduce_spark.operators.sampling.corpus_shards`.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs = ensure_parallelism(
        docs,
        spark.sparkContext.defaultParallelism,
        cache_key=corpus_key(sf_dir, "documents"),
    )
    toks = tokenize(docs, text_col="text", out_col="word", keep_cols=["doc_id"])
    tf = materialize(toks.groupBy("doc_id", "word").agg(F.count("*").alias("tf")))
    df = tf.groupBy("word").agg(F.count("*").alias("df"))
    # n_docs as a driver scalar (r16): tf is already materialized, so
    # the 1-row count is one small job and the former crossJoin's
    # broadcast-build + BroadcastNestedLoopJoin drop out of the plan
    # (the corpus_shards scalar pattern)
    n_docs = tf.select(F.count_distinct("doc_id")).collect()[0][0] or 0
    return tf.join(F.broadcast(df), "word").select(
        "doc_id", "word", "tf", "df",
        F.lit(int(n_docs)).cast("bigint").alias("n_docs"),
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
def corpus_bigrams(
    spark: SparkSession, sf_dir: str, engine: str = "arrow"
) -> DataFrame:
    """Corpus bigram statistics (occurrences + doc frequency).

    ``engine="arrow"`` (default, r8): one ``mapInPandas`` pass per doc —
    the same C-level normalize chain the profile kernel proved exact
    (punct-delete -> lower -> ASCII-fold -> WS-strip; after the fold
    ``str.split()`` equals the WS-class split), then a bigram Counter —
    emitting PRE-COLLAPSED (bigram, per-doc count) partials. Downstream
    the doc-frequency is a plain ``count(*)`` (one row per (doc,
    bigram) by construction) instead of a ``count_distinct`` expansion,
    and the shuffle carries per-doc distinct bigrams rather than raw
    occurrences. Row-identical to the expression form (pytest-gated).

    ``engine="expr"`` is the executable spec the SQL oracle mirrors:
    array-native zip_with over a shifted slice (no per-token shuffle),
    explode, groupBy + count_distinct."""
    if engine not in ("arrow", "expr"):
        raise ValueError(f"engine must be 'arrow' or 'expr', got {engine!r}")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # Fan out ONLY if the scan under-splits (tiny local files); at scale
    # the scan's own splits carry the per-row work with no Exchange.
    docs = ensure_parallelism(
        docs,
        spark.sparkContext.defaultParallelism,
        cache_key=corpus_key(sf_dir, "documents"),
    )
    if engine == "expr":
        w = F.filter(
            F.split(normalize_text(F.col("text"), trim=False), WS_SPLIT),
            lambda t: t != "",
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

    import string as _string

    ws_chars = " \t\n\x0b\f\r\x1c\x1d\x1e\x1f"
    punct_del = {ord(c): None for c in _string.punctuation}

    def kernel(batches):
        from collections import Counter

        import pandas as pd

        for pdf in batches:
            grams: list[str] = []
            cnts: list[int] = []
            for t in pdf["text"]:
                if t is None:
                    continue  # expr parity: explode of the NULL gram
                    # array emits no bigram rows
                norm = (
                    t.translate(punct_del)
                    .lower()
                    .encode("ascii", "ignore")
                    .decode("ascii")
                    .strip(ws_chars)
                )
                toks = norm.split()  # pure ASCII == the WS-class split
                if len(toks) < 2:
                    continue
                c = Counter(
                    " ".join(p) for p in zip(toks, toks[1:])
                )
                grams.extend(c.keys())
                cnts.extend(c.values())
            yield pd.DataFrame({"bigram": grams, "cnt": cnts})

    part = docs.mapInPandas(kernel, "bigram string, cnt long")
    return part.groupBy("bigram").agg(
        F.sum("cnt").alias("n_occurrences"),
        F.count("*").alias("n_docs"),
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


_RARITY_ORACLE = f"""
WITH toks AS ({{toks_cte}}),
tk AS (SELECT doc_id, word FROM toks WHERE word <> ''),
uni AS (SELECT word, count(*) AS freq FROM tk GROUP BY word)
SELECT doc_id, count(*) AS n_tokens,
  CAST(SUM(freq) AS DOUBLE) / count(*) AS mean_token_freq,
  CAST(SUM(CASE WHEN freq <= {RARE_FREQ_MAX} THEN 1 ELSE 0 END) AS DOUBLE)
    / count(*) AS rare_ratio
FROM tk JOIN uni USING (word) GROUP BY doc_id
"""


@query(
    "text_tfidf",
    oracle=f"""
SELECT 'tfidf' AS branch, doc_id, word, tf, df, n_docs,
  CAST(NULL AS BIGINT) AS n_tokens, CAST(NULL AS DOUBLE) AS mean_token_freq,
  CAST(NULL AS DOUBLE) AS rare_ratio
FROM ({_TFIDF_ORACLE})
UNION ALL
SELECT 'rarity', doc_id, NULL, NULL, NULL, NULL,
  n_tokens, mean_token_freq, rare_ratio
FROM ({_RARITY_ORACLE.format(toks_cte=sql_tokens_cte())})
""",
)
def text_tfidf_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency-feature family in one tagged union: the TF-IDF
    component table (:func:`text_tfidf` — exact integers, the full
    statistical substrate) plus the per-document rarity signals
    (:func:`token_rarity_scores` — mean corpus frequency and rare-token
    density, exact integer ratios). Same tokenize pass domain, same
    unigram-table plan family; folded per the bounded driver-window
    discipline (suite unions, never new rows). ``bench.build_overrides``
    keeps timing the original single-operator ``text_tfidf`` plan under
    the historical name."""
    null_s = F.lit(None).cast("string")
    null_l = F.lit(None).cast("bigint")
    null_d = F.lit(None).cast("double")
    tf = text_tfidf(spark, sf_dir).select(
        F.lit("tfidf").alias("branch"),
        "doc_id",
        "word",
        "tf",
        "df",
        "n_docs",
        null_l.alias("n_tokens"),
        null_d.alias("mean_token_freq"),
        null_d.alias("rare_ratio"),
    )
    rare = token_rarity_scores(spark, sf_dir).select(
        F.lit("rarity").alias("branch"),
        "doc_id",
        null_s.alias("word"),
        null_l.alias("tf"),
        null_l.alias("df"),
        null_l.alias("n_docs"),
        "n_tokens",
        "mean_token_freq",
        "rare_ratio",
    )
    return tf.unionByName(rare)

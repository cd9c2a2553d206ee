"""PII redaction unit tests: the phone pattern must cover real NANP
formats (not just the injected fixture format — the r3/r4 verdict carry),
must NOT over-scrub inside longer digit runs (the r5 advice carry: the
left edge is guarded), and Spark and DuckDB must agree on every variant
(the regex lives in the Java/RE2 common subset — no lookbehind — so the
guard is a consumed capture group each engine's replacement restores;
divergence here would silently break the oracle hash)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from gcp_map_reduce_spark.operators.curation_rules import (
    PHONE_RE,
    PHONE_REPL_SPARK,
    PHONE_REPL_SQL,
)

REDACTED = [
    "+1-555-0123",
    "555-867-5309",
    "(555) 867-5309",
    "+1 (555) 867-5309",
    "555.867.5309",
    "867-5309",
]

KEPT = [
    "5558675309",  # bare 10-digit integer: no separator, don't redact
    "version 1.2.3456",  # needs 3-digit group before the separator
    "10.0.203.7",  # IPv4 is the IP rule's job
    "order 1234567",  # bare 7-digit integer
    "98765-4321",  # tail of a longer digit run must not scrub (left guard)
    "1.234.5678",  # dotted numeric ID must not scrub (left guard)
    "id 9-867-5309",  # digit-dash prefix: not a standalone phone
]


def _spark_scrub(spark, text):
    return (
        spark.createDataFrame([(text,)], ["t"])
        .select(
            F.regexp_replace("t", PHONE_RE, PHONE_REPL_SPARK).alias("clean"),
            F.size(F.regexp_extract_all("t", F.lit(PHONE_RE), F.lit(0))).alias("n"),
        )
        .first()
    )


@pytest.mark.parametrize("s", REDACTED)
def test_phone_variants_redacted(spark, s):
    out = _spark_scrub(spark, f"call {s} now")
    assert out.clean == "call <PHONE> now", (s, out.clean)
    assert out.n == 1


@pytest.mark.parametrize("s", KEPT)
def test_non_phones_kept(spark, s):
    out = _spark_scrub(spark, f"x {s} y")
    assert out.clean == f"x {s} y", (s, out.clean)


def test_phone_at_string_start_redacted(spark):
    # the guard's ^ alternative: no preceding char to consume
    out = _spark_scrub(spark, "555-867-5309 called")
    assert out.clean == "<PHONE> called"
    assert out.n == 1


def test_adjacent_phones_both_redacted(spark):
    out = _spark_scrub(spark, "a 555-867-5309 555.867.5309 b")
    assert out.clean == "a <PHONE> <PHONE> b"
    assert out.n == 2


@pytest.mark.parametrize("s", REDACTED + KEPT)
def test_spark_duckdb_agree_on_phone_regex(spark, s):
    text = f"call {s} now"
    spark_row = _spark_scrub(spark, text)
    duck = duckdb.sql(
        f"SELECT regexp_replace('{text}', '{PHONE_RE}', '{PHONE_REPL_SQL}', 'g') AS clean, "
        f"len(regexp_extract_all('{text}', '{PHONE_RE}')) AS n"
    ).fetchone()
    assert (spark_row.clean, spark_row.n) == duck, (s, spark_row, duck)


def test_pii_arrow_kernel_row_identical_to_expr_on_corpus(spark):
    """The Arrow default engine must be row-identical to the expression
    spec on the real corpus (the oracle checks the spec; this pins the
    kernel to it)."""
    from gcp_map_reduce_spark.operators.curation_rules import pii_scrub

    d = "/root/testdata/sf0.01"
    a = {tuple(r) for r in pii_scrub(spark, d, engine="expr").collect()}
    b = {tuple(r) for r in pii_scrub(spark, d, engine="arrow").collect()}
    assert a == b and a


def test_pii_arrow_kernel_row_identical_on_adversarial_texts(spark):
    """Java regex (expr) vs Python re (kernel) must agree on the nasty
    cases: every REDACTED/KEPT phone variant, emails with dots/plus
    tags/subdomains, IPs adjacent to phones, unicode text, placeholder
    literals already present, and empty-ish strings."""
    from gcp_map_reduce_spark.operators.curation_rules import (
        _pii_scrub_expr,
        _pii_scrub_kernel,
    )

    texts = (
        [f"call {s} now" for s in REDACTED + KEPT]
        + [
            "mail first.last+tag@sub.example.co.uk today",
            "a@b.io x@y.z 1.2.3.4 555-867-5309 10.0.0.1",
            "phone then ip 555.867.5309 10.0.203.7 end",
            "unicode café naïve 北京 🎉 +1 (555) 867-5309",
            "already <EMAIL> and <PHONE> and <IP> here",
            "",
            "   ",
            "dot.end@example.com.",
            "999.999.999.999 is not a valid ip but matches the class",
        ]
    )
    doc = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    a = sorted(map(tuple, _pii_scrub_expr(doc).collect()))
    b = sorted(map(tuple, _pii_scrub_kernel(doc).collect()))
    assert a == b


def test_quality_rules_arrow_kernel_row_identical(spark):
    """Arrow default vs the expression spec, on the corpus and an
    adversarial set (empty/whitespace strings, unicode lowering,
    repeated-token runs, bigram ties, single-token docs)."""
    from gcp_map_reduce_spark.operators.curation_rules import (
        _quality_rules_kernel,
        quality_rules,
    )
    from gcp_map_reduce_spark.operators.scale import ensure_parallelism  # noqa: F401

    d = "/root/testdata/sf0.01"
    a = sorted(map(tuple, quality_rules(spark, d, engine="expr").collect()))
    b = sorted(map(tuple, quality_rules(spark, d, engine="arrow").collect()))
    assert a == b and a

    texts = [
        "",
        "   ",
        "one",
        "a a a a a a",
        "x y x y x y x y",
        "İstanbul STRASSE ß Σίσυφος ΣΊΣΥΦΟΣ",
        "tab\tand  double  space",
        "b b c c",  # bigram tie
        "café 北京 🎉 café 北京 🎉",
        # r14 language-ID: marker hits, a tie (en vs es markers equal),
        # an all-miss ("und"), and case folding of markers
        "el que la de los claros clarines",
        "der hund und die katze sind ein team",
        "THE cat AND THE dog OF the house IS here",
        "le chat et les oiseaux des villes une fois",
        "the and of el los y",  # en 3 vs es 3: earlier language wins
        "zzz qqq www",  # no marker: und
        # r15 (r14 ADVICE pin): ADJACENT repeats of one marker share
        # their separating space, and non-overlapping substring
        # counting consumes it — "the the" scores 1 on this surface
        # (text_langid's token-equality form would say 2; only the
        # VOCABULARY is shared across surfaces, never the scores)
        "the the",
    ]
    doc = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    from pyspark.sql import functions as F  # noqa: F401

    # expression form over the same custom frame: reuse quality_rules'
    # internals by writing the frame to a temp table dir is overkill —
    # compare the kernel against a DuckDB-free python reimplementation?
    # No: run the real expression pipeline by monkey-path — simplest is
    # the library seam: both engines share ensure_parallelism(load_table)
    # so drive them through a parquet round-trip.
    import tempfile, shutil, os
    work = tempfile.mkdtemp(prefix="qr_adv_")
    try:
        doc.withColumn("lang", F.lit("en")).write.parquet(
            os.path.join(work, "documents.parquet")
        )
        a = sorted(map(tuple, quality_rules(spark, work, engine="expr").collect()))
        b = sorted(map(tuple, quality_rules(spark, work, engine="arrow").collect()))
        assert a == b and len(a) == len(texts)
        # r14 language-ID semantics (both engines just proved identical;
        # assert the arrow one): marker counts, tie-break to the earlier
        # language, "und" on zero hits, case-folded markers
        got = {
            r.doc_id: (r.lang_pred, r.lang_score)
            for r in quality_rules(spark, work, engine="arrow").collect()
        }
        assert got[9] == ("es", 2)
        assert got[10] == ("de", 4)
        assert got[11] == ("en", 6)  # markers matched case-insensitively
        assert got[12] == ("fr", 4)
        assert got[13] == ("en", 3)  # 3-3 tie with es: earlier lang wins
        assert got[14] == ("und", 0)
        # repeated-adjacent-marker: non-overlapping counting eats the
        # shared space, so "the the" is 1 here, not token-form's 2
        assert got[15] == ("en", 1)
        # one vocabulary, two mechanisms: the curation marker table is
        # DERIVED from text_analysis.LANG_MARKERS (padded), so the two
        # language-ID surfaces cannot drift apart
        from gcp_map_reduce_spark.operators.curation_rules import (
            LANG_MARKERS,
        )
        from gcp_map_reduce_spark.operators.text_analysis import (
            LANG_MARKERS as PROFILE,
        )

        assert LANG_MARKERS == [
            (lang, [f" {w} " for w in ws]) for lang, ws in PROFILE.items()
        ]
    finally:
        shutil.rmtree(work, ignore_errors=True)

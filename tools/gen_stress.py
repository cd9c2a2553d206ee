#!/usr/bin/env python
"""Generate the skewed ~sf1 stress dataset from the driver's sf0.1 parquet.

The provided testdata tops out at 17 MB (sf0.1); every 100 TB design claim
in SCALING.md otherwise rests on plan-shape assertions alone. This script
derives a ~10x volume set WITH a deliberate Zipf-style hot key so the
skew-safe paths (salted aggregation, two-phase grouped top-k, AQE skew
splits) can be MEASURED, not argued:

- ``events.parquet``: 10x rows (1M). One hot user (user_id=1) receives
  ~10% of all rows; the rest keep the source distribution. Replicated
  copies get distinct event_ids and a per-copy +1h timestamp shift so
  event-time logic (sessionize, hourly resample) sees real new data.
- ``documents.parquet``: 10x rows (50k). Copy 1 is an EXACT duplicate of
  the base corpus (stresses exact dedup at volume); copies 2-9 mutate the
  text tail with a copy marker (near-dup pressure for the shingle/minhash
  ladder without collapsing everything). Token frequencies stay Zipfian
  organically, which is the salted wordcount's stress case.
- ``lineitem.parquet`` / ``orders.parquet``: 10x rows, orderkeys offset
  per copy so FK integrity holds; additionally ONE hot supplier
  (l_suppkey=1) takes ~10% of all lineitem rows (join-skew pressure for
  the q21 self-joins and any supplier-grouped aggregate).
- every other table (region/nation/customer/supplier/part/embeddings) is
  copied through unchanged — dimensions don't scale with fact volume.

Deterministic: every choice is a pure function of (row id, copy index) —
hash-gated, no RNG state. Output dir defaults to /root/repo/stress/sf1/
(gitignored run artifact, ~180 MB). DuckDB does the heavy lifting so
generation stays under a minute.

Usage: python tools/gen_stress.py [--out DIR] [--src DIR] [--copies N]
"""

from __future__ import annotations

import argparse
import os
import shutil

import duckdb

COPIES = 10
HOT_SHARE = 0.10  # hot key's target share of all rows

PASSTHROUGH = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
]


def gen_embeddings(con, src: str, out: str, copies: int) -> None:
    """10x embeddings; copy 0 is the base set, copies 1+ are slightly
    perturbed variants (deterministic per-copy scale factor) so ANN at
    20k vectors sees near-neighbors rather than exact duplicates."""
    con.execute(
        f"""
        COPY (
          SELECT
            e.vec_id + copy_i * (SELECT max(vec_id) + 1 FROM src) AS vec_id,
            CASE WHEN copy_i = 0 THEN e.embedding
                 ELSE list_transform(e.embedding,
                      x -> CAST(x * (1.0 + 0.001 * copy_i) AS FLOAT)) END
              AS embedding,
            e.label
          FROM src e CROSS JOIN copies
        ) TO '{out}' (FORMAT PARQUET)
        """
    )


def _copies_rel(con: duckdb.DuckDBPyConnection, n: int) -> None:
    con.execute(
        f"CREATE OR REPLACE TEMP TABLE copies AS "
        f"SELECT unnest(range({n})) AS copy_i"
    )


def gen_events(con, src: str, out: str, copies: int) -> None:
    """10x events; user_id=1 takes ~HOT_SHARE of rows.

    Reassignment is hash-gated per (event_id, copy): a row whose gate
    lands under HOT_SHARE moves to the hot user, so the hot share holds
    in expectation without disturbing other columns. Timestamps shift
    +copy_i hours; event_ids offset by copy_i * (max+1).
    """
    con.execute(
        f"""
        COPY (
          SELECT
            e.event_id + copy_i * (SELECT max(event_id) + 1 FROM src) AS event_id,
            e.ts + INTERVAL (copy_i) HOUR AS ts,
            CASE WHEN (hash(e.event_id * 31 + copy_i) % 1000) < {int(HOT_SHARE * 1000)}
                 THEN 1 ELSE e.user_id END AS user_id,
            e.event_type, e.value, e.props
          FROM src e CROSS JOIN copies
        ) TO '{out}' (FORMAT PARQUET)
        """
    )


def gen_documents(con, src: str, out: str, copies: int,
                  clique_size: int = 0) -> None:
    """10x documents; copy 1 = exact dup of copy 0, copies 2+ mutate.

    ``clique_size`` (r11, verdict task #4) decouples near-dup CLIQUE
    size from the copy factor: with the legacy 0 every copy of a base
    doc is a near-dup of every other copy, so the pair graph grows
    QUADRATICALLY in ``--copies`` (sf1→sf3 measured 9.6x pairs for 3x
    volume) and any pair-emitting operator's measured exponent
    conflates engine scaling with output growth. With ``clique_size=K``
    copies are partitioned into groups of K (group = copy_i // K) and
    every token in group g > 0 is prefixed with a group tag
    (``g<g><token>``), so shingle overlap ACROSS groups is zero while
    near-dup structure WITHIN a group is exactly the legacy one (local
    copy j = copy_i %% K: j<=1 exact dup, j>=2 tail marker). Pair
    output then grows ~linearly with copies at fixed K — the honest
    volume axis for exponent measurement. K>=2 required for any
    near-dup pairs to exist."""
    if clique_size <= 0:
        text = (
            "CASE WHEN copy_i <= 1 THEN d.text "
            "ELSE d.text || ' rev' || CAST(copy_i AS VARCHAR) END"
        )
        n_chars = (
            "CASE WHEN copy_i <= 1 THEN d.n_chars ELSE d.n_chars + 5 END"
        )
    else:
        k = clique_size
        # group tag on every token kills cross-group shingle overlap;
        # within-group mutation mirrors the legacy scheme
        base = (
            f"CASE WHEN copy_i // {k} = 0 THEN d.text "
            f"ELSE regexp_replace(d.text, '([A-Za-z0-9]+)', "
            f"'g' || CAST(copy_i // {k} AS VARCHAR) || '\\1', 'g') END"
        )
        text = (
            f"CASE WHEN copy_i % {k} <= 1 THEN ({base}) "
            f"ELSE ({base}) || ' rev' || CAST(copy_i AS VARCHAR) END"
        )
        n_chars = f"length({text})"
    con.execute(
        f"""
        COPY (
          SELECT
            d.doc_id + copy_i * (SELECT max(doc_id) + 1 FROM src) AS doc_id,
            {text} AS text,
            d.lang, d.source,
            {n_chars} AS n_chars
          FROM src d CROSS JOIN copies
        ) TO '{out}' (FORMAT PARQUET)
        """
    )


def gen_lineitem(con, src: str, out: str, copies: int) -> None:
    con.execute(
        f"""
        COPY (
          SELECT
            l.l_orderkey + copy_i * (SELECT max(l_orderkey) + 1 FROM src) AS l_orderkey,
            l.l_partkey,
            CASE WHEN (hash(l.l_orderkey * 37 + l.l_linenumber + copy_i) % 1000)
                      < {int(HOT_SHARE * 1000)}
                 THEN 1 ELSE l.l_suppkey END AS l_suppkey,
            l.l_linenumber, l.l_quantity, l.l_extendedprice, l.l_discount,
            l.l_tax, l.l_returnflag, l.l_linestatus, l.l_shipdate
          FROM src l CROSS JOIN copies
        ) TO '{out}' (FORMAT PARQUET)
        """
    )


def gen_orders(con, src: str, out: str, copies: int, li_src: str) -> None:
    con.execute(
        f"""
        COPY (
          SELECT
            o.o_orderkey + copy_i * (SELECT max(l_orderkey) + 1 FROM '{li_src}') AS o_orderkey,
            o.o_custkey, o.o_orderstatus, o.o_totalprice,
            o.o_orderdate, o.o_orderpriority
          FROM src o CROSS JOIN copies
        ) TO '{out}' (FORMAT PARQUET)
        """
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/stress/sf1")
    ap.add_argument("--copies", type=int, default=COPIES)
    ap.add_argument("--clique-size", type=int, default=0,
                    help="near-dup clique size for documents (0 = legacy: "
                    "one clique per base doc spanning ALL copies, pair "
                    "output quadratic in --copies; K>=2 = cliques of K "
                    "copies, pair output ~linear in --copies)")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    _copies_rel(con, args.copies)

    for table, fn in [
        ("events", gen_events),
        ("documents", gen_documents),
        ("lineitem", gen_lineitem),
        ("embeddings", gen_embeddings),
    ]:
        src = os.path.join(args.src, f"{table}.parquet")
        out = os.path.join(args.out, f"{table}.parquet")
        con.execute(
            f"CREATE OR REPLACE TEMP TABLE src AS SELECT * FROM '{src}'"
        )
        if fn is gen_documents:
            fn(con, src, out, args.copies, clique_size=args.clique_size)
        else:
            fn(con, src, out, args.copies)
        print(f"{table}: wrote {out}")

    li_src = os.path.join(args.src, "lineitem.parquet")
    src = os.path.join(args.src, "orders.parquet")
    con.execute(f"CREATE OR REPLACE TEMP TABLE src AS SELECT * FROM '{src}'")
    gen_orders(con, src, os.path.join(args.out, "orders.parquet"),
               args.copies, li_src)
    print("orders: wrote", os.path.join(args.out, "orders.parquet"))

    for table in PASSTHROUGH:
        shutil.copyfile(
            os.path.join(args.src, f"{table}.parquet"),
            os.path.join(args.out, f"{table}.parquet"),
        )
    print("passthrough dims copied:", ", ".join(PASSTHROUGH))

    # summary: row counts + realized hot-key shares
    for table, key, hot in [
        ("events", "user_id", 1),
        ("lineitem", "l_suppkey", 1),
    ]:
        p = os.path.join(args.out, f"{table}.parquet")
        n, h = con.execute(
            f"SELECT count(*), sum(CASE WHEN {key} = {hot} THEN 1 ELSE 0 END)"
            f" FROM '{p}'"
        ).fetchone()
        print(f"{table}: {n} rows, hot {key}={hot} share {h / n:.3f}")
    p = os.path.join(args.out, "documents.parquet")
    n, d = con.execute(
        f"SELECT count(*), count(*) - count(DISTINCT text) FROM '{p}'"
    ).fetchone()
    print(f"documents: {n} rows, exact-dup rows {d}")


if __name__ == "__main__":
    main()

"""Golden tests for the stage-artifact fidelity sink vs the reference's
checked-in ``kv-data-store/`` intermediates (an invertedindex run with 4
mappers / 3 reducers, plus a wordcount final output from a separate run —
SURVEY §5's caveat, so each artifact is compared at the granularity that
is actually deterministic:

- reducer files: the letter->reducer assignment is a fixed rule, so each
  reducer{N}.json must match the checked-in file KEY-FOR-KEY (posting
  lists order-insensitively — set iteration order is nondeterministic);
- mapper/input files: the reference's per-mapper document order came from
  os.listdir — nondeterministic — so the UNION across files is compared
  (pairs for mapper-output; per-doc reconstructed line sequences for
  input-docs);
- final output: the wordcount dict must match exactly.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

REF = Path("/root/reference/kv-data-store")
RAW = "/root/reference/raw-dataset"

pytestmark = pytest.mark.skipif(
    not REF.is_dir(), reason="reference kv-data-store not available"
)


@pytest.fixture(scope="module")
def inv_store(spark, tmp_path_factory):
    from gcp_map_reduce_spark.sinks.stage_artifacts import write_stage_artifacts

    store = tmp_path_factory.mktemp("kv-inv")
    write_stage_artifacts(
        spark, RAW, str(store), "invertedindex", n_mappers=4, n_reducers=3
    )
    return store


def test_reducer_outputs_match_reference_per_file(inv_store):
    for i in (1, 2, 3):
        ours = json.load(open(inv_store / "reducer-output" / f"reducer{i}.json"))
        theirs = json.load(open(REF / "reducer-output" / f"reducer{i}.json"))
        assert set(ours) == set(theirs), (
            i,
            list(set(ours) - set(theirs))[:5],
            list(set(theirs) - set(ours))[:5],
        )
        for k, docs in ours.items():
            assert sorted(docs) == sorted(theirs[k]), (i, k)


def test_mapper_output_union_matches_reference(inv_store):
    def pairs(root):
        out = set()
        for p in Path(root).glob("mapper*.json"):
            d = json.load(open(p))
            out |= {tuple(pair) for pair in d["default_mapper_key"]}
        return out

    ours = pairs(inv_store / "mapper-output")
    theirs = pairs(REF / "mapper-output")
    assert ours == theirs, (
        list(ours - theirs)[:5],
        list(theirs - ours)[:5],
    )


def test_input_docs_reconstruct_identical_corpus(inv_store):
    def corpus(root):
        # concatenate each doc's chunks in mapper order — the chunking
        # splits docs across mappers but preserves line order
        docs: dict[str, list[str]] = {}
        for i in (1, 2, 3, 4):
            d = json.load(open(Path(root) / f"input-mapper{i}.json"))
            for doc, lines in d.items():
                docs.setdefault(doc, []).extend(lines)
        return docs

    assert corpus(inv_store / "input-docs") == corpus(REF / "input-docs")


def test_wordcount_final_output_matches_reference_exactly(spark, tmp_path):
    from gcp_map_reduce_spark.sinks.stage_artifacts import write_stage_artifacts

    store = tmp_path / "kv-wc"
    write_stage_artifacts(
        spark, RAW, str(store), "wordcount", n_mappers=3, n_reducers=2
    )
    ours = json.load(open(store / "final-output" / "final-output-wordcount.json"))
    theirs = json.load(open(REF / "final-output" / "final-output-wordcount.json"))
    assert ours == theirs

    # wordcount mapper artifacts: every value is a list of 1s whose
    # length sums (across mappers) to the final count for letter keys
    sums: dict[str, int] = {}
    for p in (store / "mapper-output").glob("mapper*.json"):
        for k, ones in json.load(open(p)).items():
            assert set(ones) == {1}
            sums[k] = sums.get(k, 0) + len(ones)
    for k, v in theirs.items():
        assert sums[k] == v, k


def test_dump_is_atomic_per_file_and_sweeps_stale_tmp(spark, tmp_path):
    """r10 kill-audit: a killed run must never leave a TRUNCATED
    artifact in place of a complete one, and stale .tmp litter from the
    kill is swept on the retry."""
    import os

    from gcp_map_reduce_spark.sinks.stage_artifacts import _dump

    dest = str(tmp_path / "arts")
    os.makedirs(dest)
    # debris from a killed prior run: a half-written tmp
    with open(os.path.join(dest, "out-1.json.tmp"), "w") as fh:
        fh.write('{"trunc')
    df = spark.createDataFrame(
        [(1, '{"a": 1}'), (2, '{"b": 2}')], "id int, js string"
    )
    _dump(df, dest, "out-{}.json")
    assert sorted(os.listdir(dest)) == ["out-1.json", "out-2.json"]
    import json

    assert json.load(open(os.path.join(dest, "out-1.json"))) == {"a": 1}

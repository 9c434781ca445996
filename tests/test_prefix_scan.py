"""Dictionary prefix scan (stages/postings.prefix_term_scan)."""

import os

import pyarrow.parquet as pq

from search_engine_ray.stages.postings import load_manifest, prefix_term_scan


def _all_dictionary_rows(index_dir):
    man = load_manifest(index_dir)
    rows = []
    for e in man["entries"].values():
        f = e["file"]
        if "segment-" not in f:
            continue
        path = os.path.join(index_dir, f) if "/" in f \
            else os.path.join(index_dir, "segments", f)
        t = pq.read_table(path, columns=["term", "df", "cf"])
        rows += [(r["term"], r["df"], r["cf"]) for r in t.to_pylist()]
    return rows


def test_prefix_scan_matches_full_dictionary(built_index):
    cfg, _ = built_index
    full = _all_dictionary_rows(cfg.index_dir)
    assert full, "fixture index has no dictionary rows"
    prefixes = ["word000", "word", "zzz", "w"]
    exp = sorted((p, t, df, cf) for (t, df, cf) in full
                 for p in prefixes if t.startswith(p))
    got = prefix_term_scan(cfg.index_dir, prefixes).take_all()
    got = sorted((r["prefix"], r["term"], r["df"], r["cf"]) for r in got)
    assert got == exp
    # overlapping prefixes each contribute a row
    assert any(p == "w" for p, *_ in got) and any(
        p == "word" for p, *_ in got)

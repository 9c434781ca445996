"""BPE merge-rule training (stages/bpe.py) vs a plain-Python reference
implementation of Sennrich-style BPE over word counts."""

import re

import pyarrow as pa

import ray.data

from search_engine_ray.stages.bpe import (bpe_encode_token_counts, bpe_train,
                                          word_counts)

DOCS = [
    "lower lowest newer newest low new",
    "lower lower newer wider widest",
    "low low low new newer lowest",
]


def _ref_bpe(texts, k):
    word_re = re.compile(r"[a-z]{2,32}")
    wc: dict[str, int] = {}
    for t in texts:
        for w in word_re.findall(t.lower()):
            wc[w] = wc.get(w, 0) + 1
    vocab = {w: list(w) + ["</w>"] for w in wc}
    merges = []
    for rank in range(1, k + 1):
        pairs: dict[tuple, int] = {}
        for w, f in wc.items():
            s = vocab[w]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, n))
        for w in vocab:
            s, out, i = vocab[w], [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            vocab[w] = out
    return merges


def _docs_ds():
    t = pa.table({
        "doc_id": pa.array(range(len(DOCS)), pa.int64()),
        "text": pa.array(DOCS, pa.string()),
    })
    return ray.data.from_arrow(t).repartition(2)


def test_word_counts_match():
    got = {r["word"]: r["freq"] for r in word_counts(_docs_ds()).take_all()}
    word_re = re.compile(r"[a-z]{2,32}")
    want: dict[str, int] = {}
    for t in DOCS:
        for w in word_re.findall(t.lower()):
            want[w] = want.get(w, 0) + 1
    assert got == want


def test_bpe_train_matches_reference():
    k = 10
    got = bpe_train(_docs_ds(), num_merges=k)
    want = _ref_bpe(DOCS, k)
    rows = list(zip(got.column("rank").to_pylist(),
                    got.column("lft").to_pylist(),
                    got.column("rgt").to_pylist(),
                    got.column("freq").to_pylist()))
    assert rows == want
    # the learned rules are real merges: later symbols compose earlier ones
    assert any(len(l) + len(r) > 2 and "</w>" not in (l, r)
               for _, l, r, _ in rows[3:])


def _ref_encode_counts(texts, k):
    """Token counts after applying _ref_bpe's merges (same vocab walk)."""
    word_re = re.compile(r"[a-z]{2,32}")
    wc: dict[str, int] = {}
    for t in texts:
        for w in word_re.findall(t.lower()):
            wc[w] = wc.get(w, 0) + 1
    vocab = {w: list(w) + ["</w>"] for w in wc}
    for _, a, b, _ in _ref_bpe(texts, k):
        for w in vocab:
            s, out, i = vocab[w], [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            vocab[w] = out
    counts: dict[str, int] = {}
    for w, f in wc.items():
        for s in vocab[w]:
            counts[s] = counts.get(s, 0) + f
    return counts


def test_bpe_encode_token_counts_matches_reference():
    k = 6
    got = {r["token"]: r["total"]
           for r in bpe_encode_token_counts(_docs_ds(),
                                            num_merges=k).take_all()}
    want = _ref_encode_counts(DOCS, k)
    assert got == want
    # merged tokens actually appear, and merging strictly shrank the
    # corpus symbol mass vs the unmerged char+</w> symbolization
    assert any(len(tok) > 2 and tok != "</w>" for tok in got)
    unmerged_mass = 0
    for t in DOCS:
        for w in re.findall(r"[a-z]{2,32}", t.lower()):
            unmerged_mass += len(w) + 1
    assert sum(got.values()) < unmerged_mass

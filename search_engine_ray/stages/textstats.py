"""Per-document text analysis stages (SURVEY.md §2.2 M5-M8 + north-rule
training-data additions): validation, token counts, quality, freshness,
language ID heuristic, rolling-hash fingerprints.

All vectorized or single-regex-pass per row inside ``map_batches``; each
function is also mirrored by an ANSI-SQL oracle in ``__ray_entry__`` where
expressible.
"""

from __future__ import annotations

import datetime as _dt
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.hashing import md5_hash64
from ..functions.text import STOPWORDS, TOKEN_RE, quality_score

# Tiny language-ID marker sets (deterministic heuristic; a distinct-marker
# count per language, highest count wins, ties -> lexicographic language id,
# 0 markers -> 'unk').  SQL-mirrorable (IN-list membership).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "that", "with", "for"),
    "es": ("el", "la", "los", "las", "es", "una", "para"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit"),
    "fr": ("le", "les", "des", "est", "une", "dans", "pour"),
}

_LANGS = sorted(LANG_MARKERS)
_MARKER_SETS = {l: frozenset(LANG_MARKERS[l]) for l in _LANGS}


def classify_lang(token_set: set) -> str:
    """Distinct-marker-count language heuristic over a doc's token set —
    highest count wins, ties lexicographic, zero markers -> 'unk'.  ONE
    implementation shared by lang_id and the stratified sampler so their
    strata can't silently diverge."""
    best_lang, best_n = "unk", 0
    for l in _LANGS:                             # lexicographic tie-break
        n = len(token_set & _MARKER_SETS[l])
        if n > best_n:
            best_lang, best_n = l, n
    return best_lang


def text_stats(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, word_count, token_count, char_count, stopword_count,
    punct_ratio, quality) per doc.

    word_count = whitespace split (reference word_count,
    /root/reference/app/crawler/worker.py:222); token_count = reference token
    regex matches (pre-stopword); quality = reference compute_quality with 0
    outbound links (worker.py:146-152)."""
    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        wc, tc, cc, sw, pr, q = [], [], [], [], [], []
        for t in texts:
            t = t or ""
            words = t.split()
            toks = TOKEN_RE.findall(t.lower())
            n_stop = sum(1 for x in toks if x in STOPWORDS)
            n_alnum = sum(ch.isalnum() or ch.isspace() for ch in t)
            wc.append(len(words))
            tc.append(len(toks))
            cc.append(len(t))
            sw.append(n_stop)
            pr.append((len(t) - n_alnum) / len(t) if t else 0.0)
            q.append(quality_score(len(words), 0))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "word_count": pa.array(wc, pa.int64()),
            "token_count": pa.array(tc, pa.int64()),
            "char_count": pa.array(cc, pa.int64()),
            "stopword_count": pa.array(sw, pa.int64()),
            "punct_ratio": pa.array(pr, pa.float64()),
            "quality": pa.array(q, pa.float64()),
        })
    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow")


def freshness(docs: "ray.data.Dataset", *, build_now: str) -> "ray.data.Dataset":
    """(doc_id, age_days, freshness) against the pinned build timestamp
    (/root/reference/app/crawler/worker.py:154-159 semantics, vectorized)."""
    now = _dt.datetime.fromisoformat(build_now)
    now_us = int(now.timestamp()) * 1_000_000

    def fn(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        age_days = (now_us - ts) // (86_400 * 1_000_000)
        fresh = np.maximum(0.0, 1.0 - np.minimum(365, age_days) / 365.0)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "age_days": pa.array(age_days, pa.int64()),
            "freshness": pa.array(fresh, pa.float64()),
        })
    return docs.select_columns(["doc_id", "ts"]).map_batches(
        fn, batch_format="pyarrow")


def lang_id(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, lang) — distinct-marker-count heuristic over whitespace
    tokens; deterministic and SQL-mirrorable."""
    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        out = [classify_lang(set((t or "").lower().split()))
               for t in texts]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "lang": pa.array(out, pa.string())})
    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow")


def validate_turns(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Validation filter (reference M5, worker.py:306-309 analogue): keep
    turns with non-whitespace text; counterpart drop-count is derivable as
    N - count(valid)."""
    def fn(batch: pa.Table) -> pa.Table:
        keep = pc.greater(
            pc.utf8_length(pc.utf8_trim_whitespace(
                pc.fill_null(batch.column("text"), ""))), 0)
        return batch.filter(keep)
    return docs.map_batches(fn, batch_format="pyarrow")


def rolling_fingerprints(docs: "ray.data.Dataset", *, window: int = 8
                         ) -> "ray.data.Dataset":
    """(doc_id, fp_count, fp_min) — polynomial rolling hash over token
    windows (document fingerprinting for containment detection); fp_min is
    the winnowing-style minimum selected fingerprint."""
    MOD = (1 << 61) - 1
    BASE = 1_000_003

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_out, min_out = [], []
        for t in texts:
            toks = (t or "").lower().split()
            if len(toks) < window:
                n_out.append(0)
                min_out.append(0)
                continue
            h = [md5_hash64(x) % MOD for x in toks]
            power = pow(BASE, window - 1, MOD)
            cur = 0
            fps = []
            for i, v in enumerate(h):
                cur = (cur * BASE + v) % MOD
                if i >= window:
                    cur = (cur - h[i - window] * power * BASE) % MOD
                if i >= window - 1:
                    fps.append(cur)
            n_out.append(len(fps))
            min_out.append(min(fps) if fps else 0)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "fp_count": pa.array(n_out, pa.int64()),
            "fp_min": pa.array(min_out, pa.int64()),
        })
    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow")


# Gopher/MassiveText repetition rules (Rae et al. 2021 A1.1, the other
# half of the gate set): per-doc top-n-gram char fraction (n = 2, 3, 4)
# and duplicated-n-gram char fraction (n = 5, 10), published thresholds.
# Fractions are pinned to integer microunits (floor(1e6 * num / den + .5))
# so the SQL mirror compares identical integers — int/int ratios CAN land
# exactly on a round-half boundary, unlike the irrational-derived floats
# elsewhere.
GOPHER_TOP_NGRAM = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_DUP_NGRAM = {5: 0.15, 10: 0.10}

# ASCII-whitespace tokenization, matching the oracle's RE2 '\s' class
# (str.split would also split on unicode whitespace).  Known residual
# tie-break assumption: a token containing a char below 0x20 would order
# differently under tuple-compare vs the oracle's space-joined strings.
_ASCII_TOKEN_RE = re.compile(r"[^ \t\n\r\f\v]+")


def _ngram_repetition_doc(toks: list, text_len: int
                          ) -> tuple[dict, dict]:
    """(top_frac_u, dup_frac_u) integer-microunit fractions per n.

    A gram occurrence's char weight is len(' '.join(gram)); the top-n
    fraction weights the most frequent gram (count DESC, gram ASC ties)
    by count * weight; the dup-n fraction sums the token-char lengths of
    positions covered by any gram occurring > 1 time.  Denominator is
    the raw doc char length."""
    top_u: dict[int, int] = {}
    dup_u: dict[int, int] = {}
    den = max(text_len, 1)
    for n in GOPHER_TOP_NGRAM:
        counts: dict[tuple, int] = {}
        for i in range(len(toks) - n + 1):
            g = tuple(toks[i:i + n])
            counts[g] = counts.get(g, 0) + 1
        if not counts:
            top_u[n] = 0
            continue
        g, c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        num = c * (sum(len(x) for x in g) + (n - 1))
        top_u[n] = int(np.floor(1_000_000.0 * num / den + 0.5))
    for n in GOPHER_DUP_NGRAM:
        counts = {}
        for i in range(len(toks) - n + 1):
            g = tuple(toks[i:i + n])
            counts[g] = counts.get(g, 0) + 1
        covered = set()
        for i in range(len(toks) - n + 1):
            if counts[tuple(toks[i:i + n])] > 1:
                covered.update(range(i, i + n))
        num = sum(len(toks[j]) for j in covered)
        dup_u[n] = int(np.floor(1_000_000.0 * num / den + 0.5))
    return top_u, dup_u


def gopher_repetition(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, top2_u, top3_u, top4_u, dup5_u, dup10_u, keep) — the
    Gopher repetition gates over whitespace tokens; *_u columns are
    integer-microunit fractions, keep = every fraction at or under its
    published threshold (thresholds compared in the integer domain)."""
    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        texts = batch.column("text").to_pylist()
        cols: dict[str, list] = {f"top{n}_u": [] for n in GOPHER_TOP_NGRAM}
        cols.update({f"dup{n}_u": [] for n in GOPHER_DUP_NGRAM})
        keep = []
        for t in texts:
            t = t or ""
            # ASCII \S+ (not str.split): the oracle's RE2 '\s' is
            # ASCII-only, so unicode whitespace (\xa0 etc.) must NOT
            # split tokens on the engine side either
            toks = _ASCII_TOKEN_RE.findall(t)
            top_u, dup_u = _ngram_repetition_doc(toks, len(t))
            ok = True
            for n, th in GOPHER_TOP_NGRAM.items():
                cols[f"top{n}_u"].append(top_u[n])
                ok = ok and top_u[n] <= int(th * 1_000_000)
            for n, th in GOPHER_DUP_NGRAM.items():
                cols[f"dup{n}_u"].append(dup_u[n])
                ok = ok and dup_u[n] <= int(th * 1_000_000)
            keep.append(1 if ok else 0)
        return pa.table({
            "doc_id": ids,
            **{k: pa.array(v, pa.int64()) for k, v in cols.items()},
            "keep": pa.array(keep, pa.int64()),
        })
    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow")


# Gopher/MassiveText quality rules (Rae et al. 2021, appendix A1.1) — the
# subset expressible as deterministic whole-doc statistics; thresholds are
# the published ones.  Everything below runs through pyarrow.compute's RE2 /
# string kernels (vectorized, SQL-mirrorable: DuckDB's regexp_* is RE2 too).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_STOP_HITS = 2


def gopher_quality(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, word_count, mean_word_len, symbol_word_ratio, stop_hits,
    keep) per doc — the Gopher repetition-free quality gates:

      keep = GOPHER_MIN_WORDS <= word_count <= GOPHER_MAX_WORDS
           AND 3 <= mean_word_len <= 10
           AND (#'#' + #'...') / word_count <= 0.1
           AND >= 2 distinct Gopher stopwords present

    Floats are round-6 on both engine and oracle (repo convention).  The
    '...' count uses the replace-length trick so engine and SQL share the
    same non-overlapping greedy-left scan."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        t = batch.column("text")
        if t.type != pa.string():
            t = t.cast(pa.string())
        t = pc.fill_null(t, "")
        wc = pc.count_substring_regex(t, r"\S+").cast(pa.int64())
        nonspace = pc.utf8_length(
            pc.replace_substring_regex(t, r"\s+", "")).cast(pa.int64())
        safe_wc = pc.max_element_wise(wc, 1)
        mwl = pc.round(pc.divide(nonspace.cast(pa.float64()),
                                 safe_wc.cast(pa.float64())), ndigits=6)
        hashes = pc.count_substring(t, "#").cast(pa.int64())
        tlen = pc.utf8_length(t).cast(pa.int64())
        no_ell = pc.utf8_length(pc.replace_substring(t, "...", "")
                                ).cast(pa.int64())
        ell = pc.divide(pc.subtract(tlen, no_ell), 3)
        sym = pc.round(pc.divide(
            pc.add(hashes, ell).cast(pa.float64()),
            safe_wc.cast(pa.float64())), ndigits=6)
        stop_hits = None
        for w in GOPHER_STOPWORDS:
            hit = pc.match_substring_regex(
                t, rf"\b{w}\b").cast(pa.int64())
            stop_hits = hit if stop_hits is None else pc.add(stop_hits, hit)
        keep = pc.and_(
            pc.and_(
                pc.and_(pc.greater_equal(wc, GOPHER_MIN_WORDS),
                        pc.less_equal(wc, GOPHER_MAX_WORDS)),
                pc.and_(pc.greater_equal(mwl, GOPHER_MIN_MEAN_WORD_LEN),
                        pc.less_equal(mwl, GOPHER_MAX_MEAN_WORD_LEN))),
            pc.and_(pc.less_equal(sym, GOPHER_MAX_SYMBOL_RATIO),
                    pc.greater_equal(stop_hits, GOPHER_MIN_STOP_HITS)))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "word_count": wc,
            "mean_word_len": mwl,
            "symbol_word_ratio": sym,
            "stop_hits": stop_hits,
            "keep": keep.cast(pa.int64()),
        })

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow")


# C4 document-cleaning rules (Raffel et al. 2020 §2.2): line-level keep
# rules + whole-page filters.  Thresholds are the published ones.
C4_MIN_LINE_WORDS = 5
C4_MIN_SENTENCES = 3
C4_TERMINAL_RE = r'[.!?"]$'
C4_SENTENCE_RE = r"[.!?]"


def c4_clean(docs: "ray.data.Dataset", *,
             min_line_words: int = C4_MIN_LINE_WORDS,
             min_sentences: int = C4_MIN_SENTENCES) -> "ray.data.Dataset":
    """C4 cleaning (Raffel et al. 2020 §2.2) over newline-separated text:

    line KEEP rules — ends in a terminal punctuation mark (``.!?"``),
    has >= ``min_line_words`` whitespace words, and does not mention
    "javascript" (case-insensitive); page KEEP rules — the original page
    contains neither "lorem ipsum" (case-insensitive) nor "{", and the
    cleaned page has >= ``min_sentences`` sentences (terminal-punct
    occurrences in the kept lines).

    Returns (doc_id, total_lines, kept_lines, sentences, keep,
    clean_text); ``clean_text`` is the kept lines re-joined with \\n.
    Pure per-batch map — no exchange; all line predicates are
    pyarrow.compute kernels over the flattened line array, per-doc
    reductions are cumsum diffs over the list offsets.  Reference
    counterpart: none — north-rule training-data addition (quality
    family, same shape as gopher_quality)."""

    def fn(batch: pa.Table) -> pa.Table:
        t = batch.column("text")
        if t.type != pa.string():
            t = t.cast(pa.string())
        t = pc.fill_null(t, "")
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        lines = pc.split_pattern(t, "\n")
        flat = pc.list_flatten(lines)
        offs = lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        endp = pc.match_substring_regex(flat, C4_TERMINAL_RE)
        wc_ok = pc.greater_equal(
            pc.count_substring_regex(flat, r"\S+"), min_line_words)
        no_js = pc.invert(pc.match_substring(flat, "javascript",
                                             ignore_case=True))
        keep_line = pc.and_(pc.and_(endp, wc_ok), no_js).to_numpy(
            zero_copy_only=False)
        offs = offs - offs[0]        # flat is the logical slice from offs[0]
        cs = np.concatenate([[0], np.cumsum(keep_line, dtype=np.int64)])
        kept_n = cs[offs[1:]] - cs[offs[:-1]]
        total_n = np.diff(offs)
        # kept lines stay in Arrow: filter the flattened array, rebuild the
        # per-doc lists from the kept-count prefix sums, join with \n — no
        # per-line Python objects
        kept_flat = flat.filter(pa.array(keep_line))
        kept_lists = pa.ListArray.from_arrays(
            pa.array(cs[offs], pa.int32()), kept_flat)
        ca = pc.binary_join(kept_lists, "\n")
        sentences = pc.count_substring_regex(ca, C4_SENTENCE_RE).cast(
            pa.int64())
        page_ok = pc.and_(
            pc.invert(pc.match_substring(t, "lorem ipsum",
                                         ignore_case=True)),
            pc.invert(pc.match_substring(t, "{")))
        keep = pc.and_(page_ok,
                       pc.greater_equal(sentences, min_sentences))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "total_lines": pa.array(total_n, pa.int64()),
            "kept_lines": pa.array(kept_n, pa.int64()),
            "sentences": sentences,
            "keep": keep.cast(pa.int64()),
            "clean_text": ca,
        })

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow")


def fk_readability(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Flesch-Kincaid grade level (Kincaid et al. 1975) per doc:

        fk_grade = 0.39 * words/sentences + 11.8 * syllables/words - 15.59

    with the standard regex surrogates — words = ``\\S+`` runs, sentences
    = terminal-punctuation (``[.!?]``) occurrences, syllables = vowel
    groups (``[aeiouy]+``) in the lowercased text.  Divisors clamp at 1
    (raw counts are emitted unclamped); fk_grade_micro is the grade in
    integer microunits (floor(1e6*x + 0.5)) — round-6 emitted a
    representation tie (5.012 vs 5.0120000000000005 for the same value)
    between pyarrow round and DuckDB round, while the micro conversion
    is exact given both sides compute the identical IEEE double.  Pure
    per-batch map, three RE2 count kernels — no exchange.  Reference
    counterpart: none — north-rule training-data addition (quality
    scoring family)."""

    def fn(batch: pa.Table) -> pa.Table:
        t = batch.column("text")
        if t.type != pa.string():
            t = t.cast(pa.string())
        t = pc.fill_null(t, "")
        words = pc.count_substring_regex(t, r"\S+").cast(pa.int64())
        sents = pc.count_substring_regex(t, C4_SENTENCE_RE).cast(pa.int64())
        syll = pc.count_substring_regex(
            pc.utf8_lower(t), r"[aeiouy]+").cast(pa.int64())
        wf = words.cast(pa.float64())
        sw = pc.max_element_wise(words, 1).cast(pa.float64())
        ss = pc.max_element_wise(sents, 1).cast(pa.float64())
        fk = pc.subtract(
            pc.add(pc.divide(pc.multiply(wf, 0.39), ss),
                   pc.divide(pc.multiply(syll.cast(pa.float64()), 11.8),
                             sw)),
            15.59)
        fk_micro = pc.floor(pc.add(pc.multiply(fk, 1e6), 0.5)).cast(
            pa.int64())
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "words": words,
            "sentences": sents,
            "syllables": syll,
            "fk_grade_micro": fk_micro,
        })

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow")


# UTF-8-bytes-read-as-cp1252 mojibake table (the classic double-encoding
# class an encoding fixer repairs; cf. ftfy / the CCNet cleanup pass).
# Patterns are generated, not hand-typed, so engine and oracle share the
# exact byte sequences; none of the patterns overlap another and no
# replacement re-creates a pattern, so one ordered replace pass is exact.
_MOJI_CHARS = "éèäöü’“…"
MOJIBAKE: list[tuple[str, str]] = [
    (c.encode("utf-8").decode("cp1252"), c) for c in _MOJI_CHARS]


def fix_encoding(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, replacements, fixed_text) — repair cp1252-mojibake
    (UTF-8 bytes mis-decoded as cp1252: 'cafÃ©' -> 'café') via the
    MOJIBAKE table.  Counts are computed per pattern before its replace;
    the patterns are mutually non-overlapping so the counts equal
    original-text occurrence counts (mirrored in SQL).  Pure per-batch
    map, pyarrow.compute substring kernels — no exchange.  Reference
    counterpart: none — north-rule training-data addition (text-fixing
    family)."""

    def fn(batch: pa.Table) -> pa.Table:
        t = batch.column("text")
        if t.type != pa.string():
            t = t.cast(pa.string())
        t = pc.fill_null(t, "")
        reps = None
        for bad, good in MOJIBAKE:
            c = pc.count_substring(t, bad).cast(pa.int64())
            reps = c if reps is None else pc.add(reps, c)
            t = pc.replace_substring(t, bad, good)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "replacements": reps,
            "fixed_text": t,
        })

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow")


def nfc_normalize(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, text, changed) — Unicode NFC normalization (compose
    base+combining sequences; the canonical first step of a text-cleaning
    pipeline so downstream hashing/dedup sees one byte form per grapheme).

    Pure per-batch map, no exchange.  pyarrow's ``utf8_normalize`` does NOT
    compose base+combining pairs (verified: 'cafe'+U+0301 passes through
    decomposed), so the normalize itself is ``unicodedata.normalize("NFC")``
    behind a vectorized ASCII fast path: ``pc.string_is_ascii`` skips the
    Python call for ASCII rows (the overwhelming majority of English web
    text), and only non-ASCII rows pay the per-row cost.  Mirrored by
    DuckDB's ``nfc_normalize``.  Reference counterpart: none — north-rule
    training-data addition (text-fixing family)."""
    import unicodedata

    def fn(batch: pa.Table) -> pa.Table:
        t = batch.column("text")
        if t.type != pa.string():
            t = t.cast(pa.string())
        t = pc.fill_null(t, "")
        is_ascii = pc.string_is_ascii(t).to_numpy(zero_copy_only=False)
        if is_ascii.all():
            out = t
            changed = pa.array(np.zeros(len(is_ascii), dtype=bool))
        else:
            vals = t.to_pylist()
            norm = [v if a else unicodedata.normalize("NFC", v)
                    for v, a in zip(vals, is_ascii)]
            out = pa.array(norm, pa.string())
            changed = pc.not_equal(out, t)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "text": out,
            "changed": changed,
        })

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow")

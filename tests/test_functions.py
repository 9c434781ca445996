"""Unit tests for the pure scalar/vector functions (SURVEY.md §5.3)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_ray.functions.porter import stem
from search_engine_ray.functions.text import (STOPWORDS, candidate_limit,
                                              extract_query_words, idf,
                                              normalize_text, tokenize)
from search_engine_ray.functions.varbyte import (block_max_meta,
                                                 decode_postings,
                                                 delta_decode, delta_encode,
                                                 encode_postings, vb_decode,
                                                 vb_encode)
from search_engine_ray.functions.osa import (LexiconEntry, apply_case,
                                             choose_correction, osa_distance)
from search_engine_ray.functions.simhash import hamming64, simhash_text
from search_engine_ray.functions.urlnorm import normalize_url, registrable_domain


# -- Porter stemmer (published example pairs from Porter 1980) --------------

PORTER_PAIRS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky", "relational": "relat",
    "conditional": "condit", "rational": "ration", "valenci": "valenc",
    "hesitanci": "hesit", "digitizer": "digit", "conformabli": "conform",
    "radicalli": "radic", "differentli": "differ", "vileli": "vile",
    "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good", "revival": "reviv", "allowance": "allow",
    "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
    "cease": "ceas", "controll": "control", "roll": "roll",
}


def test_porter_published_pairs():
    for word, expect in PORTER_PAIRS.items():
        assert stem(word) == expect, word


# -- Tokenizer edge cases (reference regex semantics) -----------------------

def test_tokenize_edges():
    assert tokenize("") == {}
    assert tokenize("   ") == {}
    assert tokenize("the and of to") == {}               # all stopwords
    assert tokenize("a x 1 9") == {}                      # 1-char tokens dropped
    assert tokenize("ab") == {"ab": 1}                    # 2-char boundary
    assert tokenize("error404 v2") == {"error404": 1, "v2": 1}
    # \b is unicode-aware in Python re: no token inside 'café' (é is a word char)
    assert tokenize("café") == {}
    assert tokenize("日本語") == {}
    # underscore is a word char for \b but not in the class: no tokens
    assert tokenize("foo_bar") == {}
    assert tokenize("Running RUNS runs!") == {"run": 3}   # stem collapse
    assert tokenize("dog dog cat") == {"dog": 2, "cat": 1}


def test_query_words_order_preserving_dedup():
    assert extract_query_words("Dog the cat dog CAT") == ["dog", "cat"]


def test_candidate_limit_formula():
    # min(2000, max(offset+limit+200, limit*10))
    assert candidate_limit(20, 0) == 220
    assert candidate_limit(100, 0) == 1000
    assert candidate_limit(100, 1900) == 2000
    assert candidate_limit(1, 0) == 201


def test_idf_positive():
    assert idf(1, 1) > 0
    assert idf(1000, 1000) > 0
    assert idf(1000, 1) > idf(1000, 999)


# -- varbyte / delta / block-max -------------------------------------------

@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
@settings(max_examples=50, deadline=None)
def test_vbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(vb_decode(vb_encode(arr)), arr)


@given(st.sets(st.integers(min_value=0, max_value=2**40), max_size=200))
@settings(max_examples=50, deadline=None)
def test_postings_roundtrip(docset):
    docs = np.array(sorted(docset), dtype=np.uint64)
    tfs = (docs % 7 + 1).astype(np.uint64)
    dbuf, tbuf = encode_postings(docs, tfs)
    d2, t2 = decode_postings(dbuf, tbuf)
    assert np.array_equal(d2, docs)
    assert np.array_equal(t2, tfs)


def test_delta_roundtrip():
    v = np.array([3, 5, 6, 100, 1000], dtype=np.uint64)
    assert np.array_equal(delta_decode(delta_encode(v)), v)


def test_block_max_bounds():
    docs = np.arange(0, 1000, 3, dtype=np.uint64)
    tfs = (docs % 13 + 1).astype(np.uint64)
    bld, bmt = block_max_meta(docs, tfs, block_size=128)
    assert bld[-1] == int(docs[-1])
    for i in range(len(bld)):
        s, e = i * 128, min((i + 1) * 128, len(docs))
        assert bmt[i] == int(tfs[s:e].max())
        assert bmt[i] >= tfs[s:e].max()


# -- OSA distance vs brute force -------------------------------------------

def _brute_osa(a, b):
    rows, cols = len(a) + 1, len(b) + 1
    dp = [[0] * cols for _ in range(rows)]
    for i in range(rows):
        dp[i][0] = i
    for j in range(cols):
        dp[0][j] = j
    for i in range(1, rows):
        for j in range(1, cols):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            dp[i][j] = min(dp[i - 1][j] + 1, dp[i][j - 1] + 1,
                           dp[i - 1][j - 1] + cost)
            if i > 1 and j > 1 and a[i - 1] == b[j - 2] and a[i - 2] == b[j - 1]:
                dp[i][j] = min(dp[i][j], dp[i - 2][j - 2] + 1)
    return dp[-1][-1]


@given(st.text(alphabet="abcd", max_size=8), st.text(alphabet="abcd", max_size=8))
@settings(max_examples=200, deadline=None)
def test_osa_matches_bruteforce(a, b):
    d = osa_distance(a, b, max_distance=2)
    expected = _brute_osa(a, b)
    if expected <= 2:
        assert d == expected
    else:
        assert d is None


def test_osa_transposition():
    assert osa_distance("ab", "ba") == 1
    assert osa_distance("hello", "hlelo") == 1


def test_choose_correction_thresholds():
    cands = [LexiconEntry("hello", 10, 100, 50, 30.0),
             LexiconEntry("hallo", 1, 2, 0, 1.0)]
    # unknown word, d=1 candidate with pop >= 0.5 accepted
    assert choose_correction(word="helo", known=None, candidates=cands) == "hello"
    # known word needs 1.8x its popularity at d=1: 15*1.8=27 <= 30 accepts
    known = LexiconEntry("helo", 5, 50, 0, 15.0)
    assert choose_correction(word="helo", known=known, candidates=cands) == "hello"
    # 20*1.8=36 > 30 rejects
    known_strong = LexiconEntry("helo", 5, 50, 0, 20.0)
    assert choose_correction(word="helo", known=known_strong, candidates=cands) is None
    # short words (<=3) only accept distance 1
    assert choose_correction(word="xq", known=None,
                             candidates=[LexiconEntry("ab", 0, 0, 9, 9.0)]) is None


def test_apply_case():
    assert apply_case("HELLO", "world") == "WORLD"
    assert apply_case("Hello", "world") == "World"
    assert apply_case("hello", "World") == "World"


# -- simhash / urlnorm ------------------------------------------------------

def test_simhash_near_dup_proximity():
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = a.replace("lazy", "sleepy")
    c = "completely different words entirely unrelated content here now"
    ha, hb, hc = simhash_text(a), simhash_text(b), simhash_text(c)
    assert ha == simhash_text(a)            # deterministic
    assert hamming64(ha, hb) < hamming64(ha, hc)
    assert simhash_text("") == 0


def test_normalize_url():
    assert normalize_url("HTTP://Example.COM//a//b?utm_source=x&q=1#frag") == \
        "http://example.com/a/b?q=1"
    assert normalize_url("example.com") == "https://example.com"
    assert normalize_url("https://example.com") == "https://example.com/"


def test_registrable_domain():
    assert registrable_domain("https://www.example.co.uk/x") == "example.co.uk"
    assert registrable_domain("https://a.b.example.com") == "example.com"
    assert registrable_domain("https://example.com") == "example.com"


def test_trigram_similarity_pg_trgm_semantics():
    """Pinned against values computed by PostgreSQL pg_trgm's similarity()
    (padding '  w ', Jaccard over trigram sets)."""
    from search_engine_ray.functions.trigram import similarity, trigrams
    # trigrams('word') per pg_trgm docs: {'  w',' wo','wor','ord','rd '}
    assert trigrams("word") == {"  w", " wo", "wor", "ord", "rd "}
    assert similarity("word", "word") == 1.0
    # similarity('word','words') = |{  w, wo,wor,ord}∩...| -> 4/7
    assert abs(similarity("word", "words") - 4 / 7) < 1e-12
    assert similarity("abc", "xyz") == 0.0
    assert similarity("word", "") == 0.0


def test_sql_porter_stemmer_bit_exact():
    """The pure-SQL Porter chain in __ray_entry__.oracle_sql must stem
    bit-identically to functions/porter.stem — classic Porter vocabulary,
    random words, suffix-stress cases, and y-chain adversaries."""
    import random
    import sys

    import duckdb

    sys.path.insert(0, ".")
    from __ray_entry__ import _porter_ctes
    from search_engine_ray.functions.porter import stem as py_stem

    words = set("""caresses ponies ties caress cats feed agreed plastered
      bled motoring sing conflated troubled sized hopping tanned falling
      hissing fizzed failing filing happy sky relational conditional rational
      valenci hesitanci digitizer conformabli radicalli differentli vileli
      analogousli vietnamization predication operator feudalism decisiveness
      hopefulness callousness formaliti sensitiviti sensibiliti triplicate
      formative formalize electriciti electrical hopeful goodness revival
      allowance inference airliner gyroscopic adjustable defensible irritant
      replacement adjustment dependent adoption homologou communism activate
      angulariti homologous effective bowdlerize probate rate cease control
      roll skyy yyyy ydy syzygy ony oy yy why dry dying lying tying agree
      trees tree by baby crying flying spy relay delay enjoy employ destroy
      convey survey obey prey whey abcd""".split())
    rng = random.Random(42)
    letters = "abcdefghijklmnopqrstuvwyz"
    sufs = ["ational", "iveness", "ization", "biliti", "ies", "sses", "ss",
            "s", "eed", "ed", "ing", "y", "e", "ll", "ement", "ion", "ative"]
    for _ in range(800):
        words.add("".join(rng.choice(letters)
                          for _ in range(rng.randrange(2, 12))))
    for _ in range(400):
        words.add("".join(rng.choice("aeyiouszbdl")
                          for _ in range(rng.randrange(2, 10))))
    for _ in range(800):
        words.add("".join(rng.choice(letters)
                          for _ in range(rng.randrange(1, 6)))
                  + rng.choice(sufs))
    words = sorted(words)

    con = duckdb.connect()
    con.execute("CREATE TABLE tok(w VARCHAR)")
    con.executemany("INSERT INTO tok VALUES (?)", [(w,) for w in words])
    got = dict(con.sql(
        f"WITH {_porter_ctes('tok')} SELECT orig, stem FROM stemmed"
    ).fetchall())
    assert got == {w: py_stem(w) for w in words}

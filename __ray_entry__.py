"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (index build + two-stage search) on
sf0.001.  ``queries()`` exposes one callable per implemented operator from
SURVEY.md §2 (+ the training-data additions); ``oracle_sql()`` carries the
DuckDB mirror for every SQL-expressible one.  Ray is initialised by the
driver BEFORE import; nothing here calls ray.init()/ray.shutdown().

Float discipline (must match search_engine_ray/pipelines/queries.py):
money-like sums are integerized via floor(x*100 + 0.5) cents on both sides;
log/cosine/score floats are rounded to 6 decimals on both sides; single-IEEE-
op expressions (quality, freshness) compare bit-exactly unrounded.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from search_engine_ray.pipelines import queries as Q
from search_engine_ray.sources.transcripts import TRANSCRIPTS_FROM_DOCUMENTS_SQL


def entry() -> Any:
    """Flagship: build the stemmed index over sf0.001 transcripts, run the
    reference-scored two-stage search query set."""
    return Q.search_reference("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # index build + stats (SURVEY.md §2.4 A1/A2)
        "corpus_stats": Q.corpus_stats,
        "term_stats": Q.term_stats,
        # query path (A6/K1/K2)
        "search_stage1": Q.search_stage1,
        "search_reference": Q.search_reference,
        "search_bm25": Q.search_bm25,
        "search_news": Q.search_news,
        # spellcheck (A4/A5)
        "word_counts": Q.word_counts,
        "doc_frequencies": Q.doc_frequencies,
        "spellcheck_dictionary": Q.spellcheck_dictionary,
        # dedup (D1/D2 + training-data additions)
        "dedup_exact_groups": Q.dedup_exact_groups,
        "dedup_exact_survivors": Q.dedup_exact_survivors,
        "simhash_fingerprints": Q.simhash_fingerprints,
        "simhash_near_pairs": Q.simhash_near_pairs,
        "minhash_near_dups": Q.minhash_near_dups,
        # per-doc text analysis (M5-M8 + additions)
        "text_stats": Q.text_stats,
        "lang_id": Q.lang_id,
        "freshness": Q.freshness,
        "rolling_fingerprints": Q.rolling_fingerprints,
        # graph (J1/A7/A8)
        "graph_inlinks": Q.graph_inlinks,
        "graph_pagerank": Q.graph_pagerank,
        # relational / streaming-style ops (A9/K-family over events, orders)
        "events_window": Q.events_window,
        "sessionize": Q.sessionize,
        "join_orders_customers": Q.join_orders_customers,
        "lineitem_agg": Q.lineitem_agg,
        "topk_orders": Q.topk_orders,
        # embeddings (similarity search additions)
        "ann_topk": Q.ann_topk,
        "ann_lsh_topk": Q.ann_lsh_topk,
        "embedding_near_dups": Q.embedding_near_dups,
        # validation filter (M5) + anti-join (J5) + suggestion path (J4)
        "validate_turns": Q.validate_turns,
        "customers_without_orders": Q.customers_without_orders,
        "spellcheck_suggestions": Q.spellcheck_suggestions,
        # multimodal plumbing
        "media_features": Q.media_features,
    }


_STOP = ("('a','an','and','are','as','at','be','but','by','for','if','in',"
         "'into','is','it','no','not','of','on','or','such','that','the',"
         "'their','then','there','these','they','this','to','was','will',"
         "'with')")

_TOKS = f"""
toks AS (
  SELECT d.doc_id, t.term
  FROM documents d,
       unnest(regexp_extract_all(lower(d.text), '\\b[a-zA-Z0-9]{{2,}}\\b')) AS t(term)
  WHERE t.term NOT IN {_STOP}
)
"""

_WORDS = """
words AS (
  SELECT d.doc_id, w.word
  FROM documents d,
       unnest(regexp_extract_all(lower(d.text), '[a-z]{2,32}')) AS w(word)
)
"""


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}

    sql["corpus_stats"] = f"""
    WITH {_TOKS}
    SELECT (SELECT count(*) FROM documents) AS doc_total,
           (SELECT count(*) FROM toks) AS total_tokens,
           round((SELECT count(*) FROM toks) * 1.0
                 / (SELECT count(*) FROM documents), 6) AS avgdl
    """

    sql["term_stats"] = f"""
    WITH {_TOKS},
    stats AS (
      SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf
      FROM toks GROUP BY term
    )
    SELECT term, df, cf,
           round(ln(((SELECT count(*) FROM documents) - df + 0.5)
                    / (df + 0.5) + 1), 6) AS idf
    FROM stats
    """

    sql["search_stage1"] = f"""
    WITH {_TOKS},
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    stats AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
    n AS (SELECT count(*) AS n FROM documents)
    SELECT tf.doc_id,
           round(SUM(tf.tf * ln((n.n - stats.df + 0.5) / (stats.df + 0.5) + 1)), 6)
             AS token_score,
           count(DISTINCT tf.term) AS matched_terms
    FROM tf JOIN stats USING(term), n
    WHERE tf.term IN ('merge','sort','window')
    GROUP BY tf.doc_id
    """

    sql["word_counts"] = f"""
    WITH {_WORDS}
    SELECT word, count(*) AS total_frequency FROM words GROUP BY word
    """

    sql["doc_frequencies"] = f"""
    WITH {_WORDS}
    SELECT word, count(DISTINCT doc_id) AS doc_frequency FROM words GROUP BY word
    """

    sql["spellcheck_dictionary"] = f"""
    WITH {_WORDS},
    agg AS (
      SELECT word, count(DISTINCT doc_id) AS doc_frequency,
             count(*) AS total_frequency
      FROM words GROUP BY word
    )
    SELECT word, doc_frequency, total_frequency,
           CAST(0 AS BIGINT) AS external_frequency,
           round(4.0 * ln(1 + doc_frequency) + 2.0 * ln(1 + total_frequency), 6)
             AS popularity_score
    FROM agg
    """

    sql["dedup_exact_groups"] = """
    SELECT min(doc_id) AS canonical_doc_id, count(*) AS dup_count
    FROM documents GROUP BY text
    """

    sql["dedup_exact_survivors"] = """
    SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
    """

    sql["text_stats"] = f"""
    WITH base AS (
      SELECT doc_id, text,
        CASE WHEN length(trim(text)) = 0 THEN 0
             ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS wc,
        regexp_extract_all(lower(text), '\\b[a-zA-Z0-9]{{2,}}\\b') AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST(wc AS BIGINT) AS word_count,
           CAST(len(toks) AS BIGINT) AS token_count,
           CAST(length(text) AS BIGINT) AS char_count,
           CAST(len(list_filter(toks, x -> x IN {_STOP})) AS BIGINT)
             AS stopword_count,
           CASE WHEN wc = 0 THEN 0.0
                ELSE greatest(0.0, least(1.0, wc / 300.0)) END AS quality
    FROM base
    """

    sql["lang_id"] = """
    WITH t AS (
      SELECT doc_id,
             list_distinct(regexp_split_to_array(lower(text), '\\s+')) AS toks
      FROM documents
    ),
    c AS (
      SELECT doc_id,
        len(list_intersect(toks, ['der','die','das','und','ist','nicht','mit'])) AS de,
        len(list_intersect(toks, ['the','and','of','is','that','with','for'])) AS en,
        len(list_intersect(toks, ['el','la','los','las','es','una','para'])) AS es,
        len(list_intersect(toks, ['le','les','des','est','une','dans','pour'])) AS fr
      FROM t
    )
    SELECT doc_id,
           CASE WHEN greatest(de, en, es, fr) = 0 THEN 'unk'
                WHEN de = greatest(de, en, es, fr) THEN 'de'
                WHEN en = greatest(de, en, es, fr) THEN 'en'
                WHEN es = greatest(de, en, es, fr) THEN 'es'
                ELSE 'fr' END AS lang
    FROM c
    """

    sql["freshness"] = f"""
    WITH tr AS ({TRANSCRIPTS_FROM_DOCUMENTS_SQL}),
    a AS (
      SELECT doc_id,
             CAST(floor((epoch(TIMESTAMP '2026-03-01 00:00:00') - epoch(ts))
                        / 86400.0) AS BIGINT) AS age_days
      FROM tr
    )
    SELECT doc_id, age_days,
           greatest(0.0, 1.0 - least(365, age_days) / 365.0) AS freshness
    FROM a
    """

    sql["graph_inlinks"] = """
    WITH n AS (SELECT count(*) AS n FROM documents),
    edges AS (
      SELECT doc_id AS src, (doc_id * 7 + 13) % n.n AS dst
      FROM documents, n WHERE doc_id % 3 = 0
    )
    SELECT dst AS doc_id, count(*) AS inlink_count FROM edges GROUP BY dst
    """

    sql["events_window"] = """
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, event_type,
           count(*) AS n_events,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_value_cents
    FROM events GROUP BY 1, 2
    """

    sql["sessionize"] = """
    WITH e AS (
      SELECT event_id, ts, user_id, value,
        CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
             THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
      FROM e
    )
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_value_cents
    FROM s GROUP BY user_id, session_id
    """

    sql["join_orders_customers"] = """
    SELECT c.c_mktsegment AS mktsegment, count(*) AS n_orders,
           CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """

    sql["lineitem_agg"] = """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_items,
           CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_qty_cents,
           CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_price_cents
    FROM lineitem GROUP BY 1, 2
    """

    sql["topk_orders"] = """
    SELECT o_orderkey,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total_cents
    FROM orders
    ORDER BY total_cents DESC, o_orderkey
    LIMIT 50
    """

    sql["validate_turns"] = """
    SELECT doc_id FROM documents WHERE length(trim(text)) > 0
    """

    sql["customers_without_orders"] = """
    SELECT c.c_custkey, c.c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000.0)
    """

    sql["ann_topk"] = """
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
      FROM embeddings WHERE vec_id IN (0, 1)
    ),
    sims AS (
      SELECT q.query_id, e.vec_id,
             round(list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])), 6)
               AS cosine
      FROM q CROSS JOIN embeddings e
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id) AS rank
      FROM sims
    )
    SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= 10
    """

    return sql

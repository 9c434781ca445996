"""search_engine_ray — a Ray-Data-native full-text index build + BM25 query engine.

Re-creates the query/data-processing capabilities of the reference
(YoungerMax/search-engine, surveyed in SURVEY.md) from scratch on top of
``ray.data.Dataset``: zero-copy Arrow ``map_batches`` stages, actor pools for
stateful work, groupby/sort/aggregate for the wide steps, and immutable Parquet
artifacts with a per-partition lineage manifest for resume.

Layout:
  functions/  pure, deterministic scalar/vector functions (tokenizer, Porter
              stemmer, varbyte codec, simhash, OSA distance, url normalizer)
  sources/    readers + deterministic synthetic transcript generator
  stages/     Dataset -> Dataset build stages (tokenize, postings, stats,
              dedup, graph, spellcheck, text-stats, ANN, multimodal)
  state/      stateful components (lineage manifest, QueryEngine)
  pipelines/  end-to-end build / search pipelines
"""

__version__ = "0.1.0"

"""Ray-Data-native inverted-index + BM25 engine (SURVEY.md blueprint).

A brand-new engine with the query/data-processing capabilities of the
reference web search engine class, re-expressed Ray-Data-first:
Dataset -> map_batches over zero-copy Arrow -> groupby-aggregate merge
shuffle -> varbyte/delta posting segments -> block-max WAND BM25 top-k.
"""
from web_search_engine_ray.spec import DEFAULT_CONFIG, EngineConfig  # noqa: F401

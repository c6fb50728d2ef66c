"""Ray-Data-native distributed search engine.

A brand-new engine (NOT a port) with the query/data-processing
capabilities of the reference repo
``xinyue27/WORK_SAMPLE_spark_cloud_based_distributed_search_engine``:
inverted-index build + BM25 / reference-tf-idf top-k query serving over
Parquet tables of Common-Crawl-style web pages
(``url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string``),
plus the reference's Flame dataflow-operator inventory re-expressed as
Ray Data ``Dataset`` transforms, and the large-scale training-data
operators (dedup, similarity search, text analysis, multimodal plumbing).

Layout
------
- ``functions/`` pure functions: tokenizer, HTML extraction, hashing,
  posting-list codec, sketches, text statistics.
- ``sources/``   deterministic synthetic pages corpus + parquet readers.
- ``stages/``    Ray Data stage classes/functions (extract actor pool,
  relational ops, dedup, ANN, multimodal).
- ``pipelines/`` end-to-end pipelines: index build (checkpointed),
  query engine (BM25 + block-max WAND), brute-force oracle.
- ``state/``     checkpoint manifests / lineage.

Nothing in this package calls ``ray.init``/``ray.shutdown`` — sessions
are owned by the driver, ``bench.py``, CLI mains and the test fixture.
"""

__version__ = "0.1.0"

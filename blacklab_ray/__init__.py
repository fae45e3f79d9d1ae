"""blacklab_ray — a Ray-Data-native corpus indexing + BM25 retrieval engine.

A from-scratch rebuild of the capabilities of BlackLab (reference:
/root/reference — a Lucene-8-based corpus retrieval engine) expressed as
idiomatic Ray Data pipelines:

- HTML extraction + tokenization as ``map_batches`` actor-pool stages over
  zero-copy Arrow batches (reference: engine/src/main/java/nl/inl/blacklab/
  index/IndexerImpl.java's analyzer-per-Indexer design).
- Term-partitioned posting-list construction via a ``groupby`` shuffle into
  docID-delta + VByte compressed blocks with per-block max-score metadata
  (reference: the BlackLab40 codec's postings/forward-index writers,
  engine/src/main/java/nl/inl/blacklab/codec/BlackLab40PostingsWriter.java).
- A BM25 top-k engine (Lucene-8-style BM25 + SmallFloat norms) with
  document-at-a-time Block-Max-WAND and a vectorized term-at-a-time
  cross-check scorer.
- Corpus analytics (frequency lists, collocations, KWIC, grouping) as
  groupby/aggregate pipelines (reference: FrequencyTool, HitGroups,
  TermFrequencyList).
- Training-data operators (dedup exact/MinHash/SimHash, ANN search,
  text-quality stats, windowed event aggregates) as first-class pipelines.

Nothing in this package calls ``ray.init``/``ray.shutdown`` — sessions are
owned by the caller (tests, bench.py, the driver).
"""

__version__ = "0.1.0"

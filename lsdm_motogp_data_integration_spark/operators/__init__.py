"""Custom operators built on the DataFrame API.

Each module replaces a capability of the reference (SURVEY.md §2) or
extends the engine with the large-scale training-data operations the
reference lacks:

- ``keys``        surrogate-key sequences (Kettle Sequence steps, §2.9)
                  + deterministic training-shard assignment/export
- ``fuzzy``       Jaro-Winkler best-match similarity join (FuzzyMatch, §2.3)
- ``dedup``       exact / MinHash-LSH / SimHash / n-gram-Jaccard /
                  embedding-cosine / SemDeDup deduplication + clusters
                  + directed containment (quoted-subdocument screen)
- ``ann``         approximate nearest-neighbor search, k-means,
                  int8/product quantization, JL random projection,
                  persisted codebooks + IVF/PQ indexes (train once,
                  assign once, search many), hard-negative mining
- ``textops``     language-ID, quality scoring, token counting,
                  fingerprinting, HTML→text extraction, chunking,
                  packing, sampling, span dedup, BPE training
- ``urls``        URL canonicalization (crawl-frontier dedup keys)
                  + zone blocklist screen (suffix-ladder equi-join)
- ``sketches``    count-min sketch (constant-size frequency state)
                  + HyperLogLog (mergeable distinct-count registers)
- ``graph``       PageRank (iterative link-graph ranking), triangles,
                  degree stats, bipartite projection
- ``sessions``    sessionization, tumbling windows, time-series gap fill
- ``asof``/``ranges``  as-of join, bucketized range join
- ``scoring``     LM perplexity filters, quality classifier, DSIR
- ``ranking``     BM25
- ``membership``  n-gram decontamination (exact + Bloom screen)
- ``boilerplate`` corpus line-frequency hygiene
- ``profile``     one-pass column profiler, corpus diff,
                  exact global quantiles (no global sort)
- ``skew``        salted joins
- ``multimodal``  binary-column (image/audio/video) plumbing
  + ``mediacodec`` pure-numpy BMP/PGM/PPM/WAV/Y4M codecs
- ``sketches``/``graph``/``urls`` are round-3 additions
"""

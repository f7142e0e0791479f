"""Custom operators built on the DataFrame API.

Each module replaces a capability of the reference (SURVEY.md §2) or
extends the engine with the large-scale training-data operations the
reference lacks:

- ``keys``        surrogate-key sequences (Kettle Sequence steps, §2.9)
- ``fuzzy``       Jaro-Winkler best-match similarity join (FuzzyMatch, §2.3)
- ``dedup``       exact / MinHash-LSH / SimHash / n-gram-Jaccard /
                  embedding-cosine deduplication
- ``ann``         approximate nearest-neighbor search over embeddings
- ``textops``     language-ID, quality scoring, token counting,
                  fingerprinting
- ``sessions``    sessionization (gaps-and-islands over event streams)
- ``multimodal``  binary-column (image/audio/video) plumbing
"""

"""Scale-headroom probe: run the heaviest operators at 1× and ~20× the
sf0.1 corpus and report scaling factors.

Replicas are mutated (per-replica vowel rotation) so they are
DISSIMILAR to their originals — the near-dup pair count stays
proportional, isolating throughput from output growth.

Usage: python tools/scale_probe.py [replicas]  (default 20)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from lsdm_motogp_data_integration_spark.operators.ann import (
    cosine_topk,
    ivf_topk,
    lsh_topk,
    quantize_embeddings,
)
from lsdm_motogp_data_integration_spark.operators.keys import training_shards
from lsdm_motogp_data_integration_spark.operators.boilerplate import (
    remove_boilerplate_lines,
)
from lsdm_motogp_data_integration_spark.operators.dedup import (
    minhash_lsh_pairs,
    simhash_pairs,
)
from lsdm_motogp_data_integration_spark.operators.membership import (
    ngram_decontaminate,
)
from lsdm_motogp_data_integration_spark.operators.ranking import bm25_scores
from lsdm_motogp_data_integration_spark.operators.scoring import (
    dsir_log_weights,
)
from lsdm_motogp_data_integration_spark.operators.textops import (
    cross_doc_span_dedup,
    mask_repeated_ngrams,
)
from lsdm_motogp_data_integration_spark.session import get_spark
from lsdm_motogp_data_integration_spark.sources import read_table

SF_DIR = "/root/testdata/sf0.1"


def scaled_docs(spark, replicas: int):
    import random

    d = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    parts = [d]
    for r in range(1, replicas):
        # per-replica seeded alphabet permutation: every WORD is renamed
        # 1:1, so replicas share no shingles and no token distribution
        # with each other or the originals (a shared inserted token
        # would dominate SimHash's sketch; plain rotations repeat after
        # 25 replicas); per-doc structure is preserved, so output pair
        # counts stay ~proportional
        letters = list(alphabet)
        random.Random(r).shuffle(letters)
        parts.append(
            d.select(
                (F.col("doc_id") + r * 1_000_000).alias("doc_id"),
                F.translate(
                    F.col("text"), alphabet, "".join(letters)
                ).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def scaled_embeddings(spark, replicas: int):
    e = read_table(spark, SF_DIR, "embeddings")
    parts = [e]
    for r in range(1, replicas):
        salt = float(r)
        parts.append(
            e.select(
                (F.col("vec_id") + r * 1_000_000).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, s=salt: (x + F.lit(s * 0.01)).cast("float"),
                ).alias("embedding"),
                "label",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


#: rows whose first run lands under this are re-run and reported
#: min-of-2 — a 0.1–0.3 s measurement is mostly worker spin-up, and a
#: single sample lets a 2× "ratio" read as a regression when it is
#: noise (VERDICT r8 "what's wrong" #2; the same fix bench.py got)
MIN_OF_2_BELOW_S = 3.0


def timed(label: str, df_or_thunk) -> tuple[float, int]:
    """Time evaluation. Pass a THUNK (zero-arg callable) for operators
    that run eager Spark jobs at DataFrame-construction time (IVF's
    Lloyd training collects) so that work is inside the timer too.

    Sub-``MIN_OF_2_BELOW_S`` first runs are re-run and the MINIMUM
    reported: on measurements that small the scheduler/spin-up noise
    dominates, and min-of-2 is the cheapest way to make the row
    self-defending (both samples are printed for the log)."""
    t0 = time.time()
    df = df_or_thunk() if callable(df_or_thunk) else df_or_thunk
    n = df.count()
    dt = time.time() - t0
    if dt < MIN_OF_2_BELOW_S:
        t1 = time.time()
        df2 = df_or_thunk() if callable(df_or_thunk) else df_or_thunk
        df2.count()
        dt2 = time.time() - t1
        print(f"  {label}: {min(dt, dt2):.1f}s rows={n} "
              f"(min of {dt:.2f}/{dt2:.2f})", flush=True)
        dt = min(dt, dt2)
    else:
        print(f"  {label}: {dt:.1f}s rows={n}", flush=True)
    # drop anything an operator persisted (e.g. minhash persist_sets)
    # so later probes aren't measured under its memory pressure
    df.sparkSession.catalog.clearCache()
    return dt, n


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = get_spark("scale_probe")
    spark.range(100).count()

    results = {}
    for scale, n_rep in (("1x", 1), (f"{replicas}x", replicas)):
        docs = scaled_docs(spark, n_rep)
        emb = scaled_embeddings(spark, n_rep)
        queries = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        n_docs = docs.count()
        n_vecs = emb.count()
        print(f"{scale}: {n_docs} docs, {n_vecs} vectors", flush=True)
        r = {"n_docs": n_docs, "n_vecs": n_vecs}
        # persist_sets: the replica corpus is expensive derived lineage
        # (50-way translate union) — evaluate it once, not three times
        r["minhash_lsh_s"], r["minhash_pairs"] = timed(
            "minhash_lsh",
            minhash_lsh_pairs(docs, "text", "doc_id", persist_sets=True),
        )
        r["simhash_s"], r["simhash_pairs"] = timed(
            "simhash",
            simhash_pairs(
                docs, "text", "doc_id", max_hamming=3, persist_sketch=True
            ),
        )
        # --- round-2 curation operators ---
        words = F.split(
            F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")),
            " ",
        )
        n_lines = F.ceil(F.size(words) / F.lit(8.0)).cast("int")
        lined = docs.select(
            "doc_id",
            F.concat_ws(
                "\n",
                F.transform(
                    F.sequence(F.lit(0), n_lines - F.lit(1)),
                    lambda i: F.concat_ws(
                        " ", F.slice(words, i * 8 + 1, 8)
                    ),
                ),
            ).alias("text"),
        )
        r["boilerplate_s"], _ = timed(
            "boilerplate",
            remove_boilerplate_lines(
                lined, min_docs=3, persist_lines=True
            ),
        )
        r["span_dedup_s"], _ = timed(
            "span_dedup",
            mask_repeated_ngrams(docs, k=5, persist_words=True),
        )
        # cross-doc variant: replicas are vocabulary-disjoint, so the
        # shared-gram population stays ~per-replica — the gram-keyed
        # aggregate + join-back is the part whose linearity matters
        r["span_xdoc_s"], _ = timed(
            "span_xdoc",
            cross_doc_span_dedup(docs, k=5, persist_words=True),
        )
        r["bm25_s"], _ = timed(
            "bm25", bm25_scores(
                docs, ["spark", "shuffle", "window"], persist_tokens=True
            )
        )
        # SemDeDup with the knob scaled (n_clusters ∝ corpus, constant
        # per-cluster membership) — the within-cluster scan must stay
        # linear; a FIXED n_clusters would grow it quadratically (see
        # dedup.semdedup docstring)
        from lsdm_motogp_data_integration_spark.operators.dedup import (
            semdedup,
        )

        r["semdedup_s"], _ = timed(
            "semdedup",
            lambda: semdedup(
                emb, "embedding", "vec_id",
                n_clusters=8 * n_rep, n_iters=2,
            ),
        )
        r["ann_brute_s"], _ = timed(
            "ann_brute",
            cosine_topk(
                emb, queries, "embedding", "vec_id", "query_id", "query_vec", k=5
            ),
        )
        r["ann_lsh_s"], _ = timed(
            "ann_lsh",
            lsh_topk(
                emb, queries, "embedding", "vec_id", "query_id", "query_vec", k=5
            ),
        )
        r["ann_ivf_s"], _ = timed(
            "ann_ivf",
            # thunk: ivf_topk trains its codebook EAGERLY at
            # construction (3 collect jobs) — build inside the timer
            lambda: ivf_topk(
                emb, queries, "embedding", "vec_id", "query_id",
                "query_vec", k=5, n_cells=16, nprobe=3,
            ),
        )
        r["quantize_s"], _ = timed(
            "quantize", quantize_embeddings(emb, "embedding", "vec_id")
        )
        # PQ: codebook fitting is sample-bounded (flat cost); the
        # encode pass is the part that must scale linearly
        from lsdm_motogp_data_integration_spark.operators.ann import (
            pq_quantize,
        )

        r["pq_s"], _ = timed(
            "pq",
            # thunk: per-subspace Lloyd training runs eagerly
            lambda: pq_quantize(
                emb, "embedding", "vec_id",
                n_subspaces=2, n_codes=8, n_iters=2,
            ),
        )
        # CCNet partition: LM scoring (explode + vocab join) + the
        # range-partitioned two-phase global rank — the rank's range
        # exchange is the scale-interesting shuffle
        from lsdm_motogp_data_integration_spark.operators.scoring import (
            ccnet_buckets,
        )

        r["ccnet_s"], _ = timed(
            "ccnet",
            # thunk: the distributed rank eagerly checkpoints
            lambda: ccnet_buckets(docs),
        )
        r["shards_s"], _ = timed(
            "shards", training_shards(docs, "doc_id", n_shards=32)
        )
        # eval side stays FIXED while the corpus scales — the bloom
        # screen's cost must track the corpus scan, not the filter build
        eval_docs = read_table(spark, SF_DIR, "documents").select(
            "doc_id", "text"
        ).filter(F.col("doc_id") % 5 == 0)
        r["decontam_bloom_s"], _ = timed(
            "decontam_bloom",
            lambda: ngram_decontaminate(
                docs, eval_docs, n=8, method="bloom"
            ),
        )
        # real multimodal decode: one BMP per doc (md5-chain pixels,
        # same builder as q41) through media_stats — Arrow-batched
        # mapInPandas build + decode, expected linear
        from __spark_entry__ import _build_multimodal_media
        from lsdm_motogp_data_integration_spark.operators.multimodal import (
            media_stats,
        )

        r["media_decode_s"], _ = timed(
            "media_decode",
            media_stats(_build_multimodal_media(docs, kinds=(0,))),
        )
        # r6 perceptual near-dup: dHash (decode + 8-byte fingerprint)
        # then the pigeonhole Hamming band join — the join input is 8
        # bytes/image, so pair generation must stay ~flat while the
        # hash pass scales with the decode (linear)
        from lsdm_motogp_data_integration_spark.operators.dedup import (
            hamming64_pairs,
        )
        from lsdm_motogp_data_integration_spark.operators.multimodal import (
            image_dhash,
        )

        bmp_media = _build_multimodal_media(docs, kinds=(0,))
        dhash_holder = {}

        def _dhash():
            h = image_dhash(bmp_media).localCheckpoint(eager=True)
            dhash_holder["df"] = h
            return h

        r["dhash_s"], _ = timed("dhash", _dhash)
        # r7: the entropy guard's own telemetry — the sub-grid fixtures
        # (7×6 BMPs) are exactly where the r6 probe found the radius-6
        # blowup; record what the guard sees so SCALE.md can show it
        # fires at the same point
        from lsdm_motogp_data_integration_spark.operators.dedup import (
            hamming_join_cost,
        )

        gc = hamming_join_cost(dhash_holder["df"], "dhash", 6)
        gc["fires_default"] = bool(
            (gc["ratio"] > 16.0 and gc["est_candidates"] > 2e6)
            or gc["est_candidates"] > 1e8
        )
        r["dhash_guard"] = gc
        r["dhash_pairs_s"], _ = timed(
            "dhash_pairs",
            hamming64_pairs(
                dhash_holder["df"], "media_id", "dhash", max_hamming=6,
                entropy_guard="off",  # timing the join, not the guard
            ).agg(F.count(F.lit(1))),
        )
        # r6 continuation codecs: compressed-image decode (JPEG
        # entropy loop + batched IDCT; GIF LZW — per-blob Python
        # inside Arrow batches, expected linear in blob count),
        # header-only container metadata (O(header) per blob — must
        # stay linear with a SMALL constant), and the video member of
        # the perceptual family (decode + 2 frame hashes, then two
        # slot-band joins conjoined by a pair count)
        from lsdm_motogp_data_integration_spark.operators.multimodal import (
            container_info,
            video_dhash,
            video_neardup_pairs,
        )

        r["jpeg_decode_s"], _ = timed(
            "jpeg_decode",
            media_stats(_build_multimodal_media(docs, kinds=(5,))),
        )
        # r7: the progressive (SOF2) twin — multi-scan entropy decode
        # over the same pixels; expected linear with a modestly larger
        # constant than baseline (several passes over the band scans)
        r["jpeg_p_decode_s"], _ = timed(
            "jpeg_p_decode",
            media_stats(
                _build_multimodal_media(
                    docs, kinds=(5,), jpeg_progressive=True
                )
            ),
        )
        # r7: PDF text extraction — skeleton build + full xref/object
        # walk + Flate + text-operator interpretation per blob, both
        # layouts (classic / 1.5 compressed); expected linear
        from lsdm_motogp_data_integration_spark.operators.multimodal import (
            pdf_text,
        )

        def _build_pdf_media_probe(ds):
            import pandas as _pd

            from lsdm_motogp_data_integration_spark.operators.multimodal import (  # noqa: E501
                MEDIA_SCHEMA,
            )
            from lsdm_motogp_data_integration_spark.operators.pdfcodec import (  # noqa: E501
                encode_pdf_skeleton,
            )

            def run(batches):
                for pb in batches:
                    ids, kinds_c, contents, metas = [], [], [], []
                    for did, text in zip(pb["doc_id"], pb["text"]):
                        t = "" if text is None else str(text)
                        ids.append(int(did))
                        kinds_c.append("document")
                        contents.append(
                            encode_pdf_skeleton(
                                [t[:200], "p2: " + t[200:400]],
                                layout=(
                                    "classic"
                                    if did % 2 == 0
                                    else "xref_stream"
                                ),
                            )
                        )
                        metas.append(None)
                    yield _pd.DataFrame(
                        {
                            "media_id": ids,
                            "kind": kinds_c,
                            "content": contents,
                            "meta": metas,
                        }
                    )

            return ds.select("doc_id", "text").mapInPandas(
                run, schema=MEDIA_SCHEMA
            )

        r["pdf_text_s"], _ = timed(
            "pdf_text",
            pdf_text(_build_pdf_media_probe(docs)).agg(
                F.sum(F.length("text"))
            ),
        )
        r["gif_decode_s"], _ = timed(
            "gif_decode",
            media_stats(_build_multimodal_media(docs, kinds=(6,))),
        )
        # r8: lossless WebP (VP8L) decode — LSB-first prefix decode +
        # subtract-green inverse per blob; expected linear
        r["webp_decode_s"], _ = timed(
            "webp_decode",
            media_stats(
                _build_multimodal_media(docs, kinds=(4,), webp=True)
            ),
        )
        # r9 late: PDF embedded-image extraction — XObject walk +
        # Flate inflate + PNG re-encode per blob; expected linear
        from lsdm_motogp_data_integration_spark.operators.multimodal import (  # noqa: E501
            MEDIA_SCHEMA,
            pdf_image_extract,
        )

        def _pdf_img_media(dd):
            import hashlib as _hl

            import numpy as _nnp
            import pandas as _ppd

            from lsdm_motogp_data_integration_spark.operators.pdfcodec import (  # noqa: E501
                encode_pdf_with_images,
            )

            def run(batches):
                for pb in batches:
                    ids, kinds, contents, metas = [], [], [], []
                    for did, text in zip(pb["doc_id"], pb["text"]):
                        t = "" if text is None else str(text)
                        px = _hl.md5(f"{t}:pi:0".encode()).digest()[:12]
                        arr = _nnp.frombuffer(
                            px, _nnp.uint8
                        ).reshape(3, 4)
                        ids.append(int(did))
                        kinds.append("document")
                        contents.append(
                            encode_pdf_with_images(
                                [("flate_gray", arr)], text=t[:40]
                            )
                        )
                        metas.append(None)
                    yield _ppd.DataFrame(
                        {
                            "media_id": ids,
                            "kind": kinds,
                            "content": contents,
                            "meta": metas,
                        }
                    )

            return dd.select("doc_id", "text").mapInPandas(
                run, schema=MEDIA_SCHEMA
            )

        r["pdf_img_s"], _ = timed(
            "pdf_img", pdf_image_extract(_pdf_img_media(docs))
        )
        # r9: lossy VP8 decode — boolean arithmetic decoder + B_PRED
        # prediction + IDCT per blob; expected linear
        r["vp8_decode_s"], _ = timed(
            "vp8_decode",
            media_stats(
                _build_multimodal_media(docs, kinds=(4,), vp8=True)
            ),
        )
        # r8: FLAC decode — frame walk + FIXED/Rice residual decode +
        # CRC/MD5 verification per blob; expected linear
        r["flac_decode_s"], _ = timed(
            "flac_decode",
            media_stats(
                _build_multimodal_media(docs, kinds=(2,), flac=True)
            ),
        )
        r["minfo_s"], _ = timed(
            "minfo",
            container_info(_build_multimodal_media(docs, kinds=(7,))),
        )
        vh_holder = {}

        def _vdhash():
            hdf = video_dhash(
                _build_multimodal_media(docs, kinds=(3,)),
                n_sample_frames=2,
            ).localCheckpoint(eager=True)
            vh_holder["df"] = hdf
            return hdf

        r["vdhash_s"], _ = timed("vdhash", _vdhash)
        # radius 1, not the q41 default 6: the probe's 4×3 fixture
        # frames have only ~9 bits of effective hash entropy (tiny
        # frames upsample with repeated pixels — structurally
        # constant bits), so radius 6 false-pairs ~1.2% of ALL video
        # pairs and the expansion goes quadratic at 20× (measured;
        # the video_dhash docstring documents the tighten-the-radius
        # rule for sub-grid media)
        r["vdhash_pairs_s"], _ = timed(
            "vdhash_pairs",
            video_neardup_pairs(
                vh_holder["df"], n_sample_frames=2, max_hamming=1
            ).agg(F.count(F.lit(1))),
        )
        r["dsir_s"], _ = timed(
            "dsir",
            # thunk: dsir_log_weights eagerly localCheckpoints its
            # result (cache-release contract) — build inside the timer
            lambda: dsir_log_weights(
                docs,
                read_table(spark, SF_DIR, "documents").select(
                    "doc_id", "text"
                ),
            ),
        )
        # --- round-3 operators ---
        from lsdm_motogp_data_integration_spark.operators.graph import (
            pagerank,
        )
        from lsdm_motogp_data_integration_spark.operators.sketches import (
            count_min_sketch,
        )
        from lsdm_motogp_data_integration_spark.operators.textops import (
            strip_html,
        )
        from lsdm_motogp_data_integration_spark.operators.urls import (
            normalize_url,
        )

        # HTML extraction: pure per-row regex chain — must be linear
        html_docs = docs.select(
            "doc_id",
            F.concat(
                F.lit(
                    "<html><head><title>D</title><script>var x = 1;"
                    "</script><style>.a { b: c; }</style></head><body><p>"
                ),
                F.col("text"),
                F.lit(
                    ' &amp; tail</p><a href="https://ex.com/a">l</a>'
                    "</body></html>"
                ),
            ).alias("html"),
        )
        r["strip_html_s"], _ = timed(
            # aggregate over the extracted length: a bare projection
            # under count() is PRUNED (measures only the scan) — the
            # sum forces the whole regex chain per row
            "strip_html",
            html_docs.select(
                F.length(strip_html(F.col("html"))).alias("n")
            ).agg(F.sum("n")),
        )
        # URL canonicalization: per-row regex + array HOFs
        url_docs = docs.select(
            F.concat(
                F.lit("https://WWW.Example.com:443/page/"),
                (F.col("doc_id") % 1000).cast("string"),
                F.lit("/?utm_source=x&b=2&a=1#frag"),
            ).alias("u")
        )
        r["normalize_url_s"], _ = timed(
            "normalize_url",
            url_docs.select(
                F.length(normalize_url(F.col("u"))).alias("n")
            ).agg(F.sum("n")),
        )
        # CMS build: token explode + constant-key-space aggregate —
        # the output is depth×width rows at ANY corpus size
        toks = docs.select(F.explode(words).alias("term"))
        r["cms_s"], _ = timed(
            "cms", count_min_sketch(toks, "term", width=1024, depth=4)
        )
        # PageRank: 3 modular out-edges per doc, 5 iterations — per-
        # round cost is one edge join + one dst aggregate, so time
        # must track edge count linearly. Edges stay CLOSED within
        # each replica's doc_id block (base corpus is 5000 docs per
        # 1M-offset block) — an open graph would silently leak rank
        # mass (documented pagerank contract) and under-exercise the
        # fill-back join
        n_base = read_table(spark, SF_DIR, "documents").count()
        nodes = docs.select("doc_id")
        pedges = None
        for k in (1, 2, 3):
            ek = nodes.select(
                F.col("doc_id").alias("src"),
                (
                    F.floor(F.col("doc_id") / 1_000_000) * 1_000_000
                    + ((F.col("doc_id") * k + k) % F.lit(n_base))
                ).cast("bigint").alias("dst"),
            )
            pedges = ek if pedges is None else pedges.unionByName(ek)
        r["pagerank_s"], _ = timed(
            "pagerank",
            # thunk: pagerank counts nodes eagerly at construction
            lambda: pagerank(
                nodes, pedges, node_col="doc_id", src_col="src",
                dst_col="dst", n_iters=5,
            ),
        )
        # --- round-3 continuation operators ---
        from lsdm_motogp_data_integration_spark.operators.graph import (
            bipartite_project,
            triangle_counts,
            undirected_canonical,
        )
        from lsdm_motogp_data_integration_spark.operators.merge import (
            scd2_apply,
            scd2_init,
        )
        from lsdm_motogp_data_integration_spark.operators.sessions import (
            cohort_retention,
            funnel_counts,
        )
        from lsdm_motogp_data_integration_spark.operators.textops import (
            stratified_allocate,
        )

        # triangles over the same closed modular graph — the wedge
        # self-join is the superlinear-risk step; degree orientation
        # must keep it near-linear at constant degree distribution
        canon = undirected_canonical(pedges)
        r["triangles_s"], _ = timed(
            "triangles", triangle_counts(canon)
        )
        # events replicated with DISJOINT users per replica (behavior
        # per user constant, population scales — the funnel/retention
        # shuffles are user-keyed, so time must track users linearly)
        ev0 = read_table(spark, SF_DIR, "events").select(
            "event_id", "user_id", "ts", "event_type", "value"
        )
        eparts = [
            ev0.select(
                (F.col("event_id") + r_i * 10_000_000).alias("event_id"),
                (F.col("user_id") + r_i * 1_000_000).alias("user_id"),
                "ts",
                "event_type",
                "value",
            )
            for r_i in range(n_rep)
        ]
        evs = eparts[0]
        for p in eparts[1:]:
            evs = evs.unionByName(p)
        r["funnel_s"], _ = timed(
            "funnel",
            funnel_counts(evs, ["view", "click", "purchase"]),
        )
        r["retention_s"], _ = timed(
            "retention", cohort_retention(evs)
        )
        # bipartite projection user->event_type: right side is
        # low-cardinality (5 types), per-user degree bounded — the
        # distinct-collapse and pair aggregate must stay linear
        r["cooccur_s"], _ = timed(
            "cooccur",
            bipartite_project(
                evs, left_col="user_id", right_col="event_type"
            ),
        )
        # SCD2 merge: digest collapse + one full-outer join on ids —
        # constant-width rows regardless of document size
        v2 = docs.filter(F.col("doc_id") % 7 != 3).withColumn(
            "text",
            F.when(
                F.col("doc_id") % 10 == 0,
                F.concat(F.col("text"), F.lit(" v2")),
            ).otherwise(F.col("text")),
        )
        r["scd2_s"], _ = timed(
            "scd2",
            scd2_apply(
                scd2_init(docs, "doc_id", "text", version=1),
                v2,
                "doc_id",
                "text",
                version=2,
            ),
        )
        # exact-allocation stratified sample: one window shuffle on a
        # 5-value stratum key — the serialization-per-stratum risk
        strata = docs.withColumn(
            "stratum", (F.col("doc_id") % 5).cast("string")
        )
        r["stratified_s"], _ = timed(
            "stratified",
            stratified_allocate(strata, "stratum", 0.1, "doc_id"),
        )
        # --- round-3 closeout operators ---
        from lsdm_motogp_data_integration_spark.operators.dedup import (
            containment_pairs,
            shingle_sets,
        )
        from lsdm_motogp_data_integration_spark.operators.profile import (
            exact_quantiles,
        )
        from lsdm_motogp_data_integration_spark.operators.sketches import (
            hll_estimate,
            hll_sketch,
        )
        from lsdm_motogp_data_integration_spark.operators.urls import (
            filter_blocked_urls,
        )
        from lsdm_motogp_data_integration_spark.operators.ann import (
            random_projection,
        )

        # HLL: token explode + constant-key-space MAX aggregate — the
        # register relation is m rows at ANY corpus size
        r["hll_s"], _ = timed(
            "hll", hll_estimate(hll_sketch(toks, "term", m=64), m=64)
        )
        # exact global quantiles over the scaled events table: the
        # distinct-value collapse + range exchange are the shuffles
        r["quantiles_s"], _ = timed(
            "quantiles",
            # thunk: the offsets job collects eagerly
            lambda: exact_quantiles(evs, "value", [0.5, 0.9, 0.99]),
        )
        # containment: A-prefix x full-gram-index equi-join — replicas
        # are vocabulary-disjoint so candidates stay per-replica; the
        # full-index explode is the linearity-risk side
        csets = shingle_sets(docs, "text", "doc_id", k=5).persist()
        r["containment_s"], _ = timed(
            "containment",
            containment_pairs(
                docs, "text", "doc_id", k=5, threshold=0.8,
                sets_df=csets,
            ),
        )
        csets.unpersist()
        # URL blocklist: distinct-host suffix ladder vs broadcast
        # patterns, then the broadcast anti probe — distinct hosts
        # scale with the corpus here (worst case for the match side)
        bl_urls = docs.select(
            "doc_id",
            F.concat(
                F.lit("https://h"),
                (F.col("doc_id") % 997).cast("string"),
                F.when(
                    F.col("doc_id") % 3 == 0, F.lit(".blocked.example")
                ).otherwise(F.lit(".clean.example")),
                F.lit("/p/"),
                F.col("doc_id").cast("string"),
            ).alias("url"),
        )
        blp = spark.createDataFrame(
            [("blocked.example",)], "pattern string"
        )
        r["urlfilter_s"], _ = timed(
            "urlfilter", filter_blocked_urls(bl_urls, "url", blp)
        )
        # JL projection: pure Column HOF math — aggregate over one
        # component so the zip_with/aggregate chain isn't pruned
        r["rp_s"], _ = timed(
            "rp",
            random_projection(emb, "embedding", out_dim=8, dim=64)
            .select(F.element_at("proj", 1).alias("p1"))
            .agg(F.sum("p1")),
        )
        # --- closeout batch 2 ---
        from lsdm_motogp_data_integration_spark.operators.ann import (
            pq_topk,
        )
        from lsdm_motogp_data_integration_spark.operators.boilerplate import (
            dup_line_stats,
        )
        from lsdm_motogp_data_integration_spark.operators.profile import (
            winsorize,
        )
        from lsdm_motogp_data_integration_spark.operators.sketches import (
            histogram_quantile,
            histogram_sketch,
        )
        from lsdm_motogp_data_integration_spark.operators.textops import (
            badword_screen,
            char_entropy,
            token_budget_sample,
        )

        # per-char explode + doc-keyed rollups — must track total chars
        r["char_entropy_s"], _ = timed(
            "char_entropy",
            char_entropy(docs).agg(F.sum("char_entropy")),
        )
        # doc-keyed line aggregates over the synthetic lined corpus
        r["dupline_s"], _ = timed(
            "dupline",
            dup_line_stats(lined).agg(F.sum("dup_line_frac")),
        )
        # one alternation regex per row, fused into the scan
        bwcols = badword_screen("text", ("zebra", "quux", "xyzzy"))
        r["badwords_s"], _ = timed(
            "badwords",
            docs.select(bwcols["n_badwords"].alias("nb")).agg(F.sum("nb")),
        )
        # one group-keyed cumulative window over ~5 sources
        r["token_budget_s"], _ = timed(
            "token_budget",
            token_budget_sample(
                docs.withColumn(
                    "src", (F.col("doc_id") % 5).cast("string")
                ),
                "src",
                {str(i): 50_000 * n_rep for i in range(5)},
                "doc_id",
            ),
        )
        # constant-key-space bin aggregate + bounded cumulative window
        r["hist_q_s"], _ = timed(
            "hist_q",
            histogram_quantile(
                histogram_sketch(evs, "value", lo=0.0, hi=500.0, n_bins=100),
                [0.5, 0.99], lo=0.0, hi=500.0, n_bins=100,
            ),
        )
        # two-phase quantile job + fused clip projection
        r["winsorize_s"], _ = timed(
            "winsorize",
            # thunk: the bounds collect runs eagerly
            lambda: winsorize(evs, "value").agg(
                F.sum(F.col("value_clipped").cast("bigint"))
            ),
        )
        # PQ-ADC: sample-bounded training (flat) + one encode pass +
        # broadcast query scoring — must track corpus linearly
        pq_queries = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        r["pq_topk_s"], _ = timed(
            "pq_topk",
            lambda: pq_topk(
                emb, pq_queries, "embedding", "vec_id", "query_id",
                "query_vec", k=5, n_subspaces=2, n_codes=8,
                n_iters=1, train_sample=256,
            ),
        )
        # A-ES weighted sampling: per-row key + distributed TakeOrdered
        from lsdm_motogp_data_integration_spark.operators.textops import (
            weighted_sample,
        )

        r["weighted_sample_s"], _ = timed(
            "weighted_sample",
            weighted_sample(
                docs.withColumn("w", F.length("text").cast("double")),
                "w", 100, "doc_id",
            ),
        )
        # --- round-5 NB language classifier ---
        from lsdm_motogp_data_integration_spark.operators.scoring import (
            classify_lang_nb,
            lang_nb_verdict,
            train_lang_nb,
        )

        # synthetic 5-way labels (labels don't affect COST); training
        # is the closed-form count pass — must be linear in the corpus
        labeled = docs.withColumn(
            "lang",
            F.element_at(
                F.array(*[F.lit(c) for c in ("aa", "bb", "cc", "dd", "ee")]),
                (F.col("doc_id") % 5 + 1).cast("int"),
            ),
        )
        nb_model_holder = {}

        def _train_nb():
            m = train_lang_nb(labeled, "lang", "text", n_buckets=64)
            nb_model_holder["rows"] = m.collect()
            # count() target for timed(): the model relation itself
            return m

        r["nb_train_s"], _ = timed("nb_train", _train_nb)
        # join-form scoring: TF pass + broadcast grid join
        r["nb_classify_s"], _ = timed(
            "nb_classify",
            classify_lang_nb(docs, nb_model_holder["rows"]).agg(
                F.count(F.lit(1))
            ),
        )
        # plan-literal Column form: zero-shuffle per-row verdict
        r["nb_verdict_s"], _ = timed(
            "nb_verdict",
            docs.select(
                lang_nb_verdict("text", nb_model_holder["rows"]).alias("v")
            ).groupBy("v").count(),
        )
        import os

        r["loadavg_1m"] = round(os.getloadavg()[0], 2)
        results[scale] = r

    results["min_of_2_below_s"] = MIN_OF_2_BELOW_S
    base, big = results["1x"], results[f"{replicas}x"]
    print(json.dumps(results))
    print("\nscaling factors (time ratio / data ratio — 1.0 = linear):")
    # every timed *_s key present in BOTH runs — a hardcoded list
    # silently dropped the r7/r8 additions (jpeg_p, pdf_text, webp,
    # flac) from this summary even though they were measured
    for key in sorted(k for k in base if k.endswith("_s") and k in big):
        ratio = (big[key] / base[key]) / replicas
        # a sub-second 1x denominator is still mostly fixed overhead
        # even after min-of-2 — label it so a >1.0 ratio reads as the
        # noise it is, not as superlinear scaling
        note = "  [1x <1s: overhead-dominated]" if base[key] < 1.0 else ""
        print(f"  {key}: {ratio:.2f}{note}")


if __name__ == "__main__":
    main()

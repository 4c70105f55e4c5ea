"""Unit tests for custom operators: as-of join, OHLC, top-k, dedup family,
similarity. Small in-memory frames with hand-computed expectations."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from marketdb_spark.operators.asof import asof_join
from marketdb_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_fingerprints,
)
from marketdb_spark.operators.ohlc import ohlc_bars
from marketdb_spark.operators.similarity import cosine_topk
from marketdb_spark.operators.topk import top_k_per_group

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(seconds):
    return T0 + dt.timedelta(seconds=seconds)


class TestAsofJoin:
    def test_backward_inclusive(self, spark):
        left = spark.createDataFrame(
            [(1, _ts(10)), (1, _ts(20)), (1, _ts(5))], "k int, t timestamp"
        )
        right = spark.createDataFrame(
            [(1, _ts(10), 100.0), (1, _ts(18), 200.0)], "k int, t timestamp, v double"
        )
        got = {
            r.t: (r.t_right, r.v_right)
            for r in asof_join(left, right, ["k"], "t", "t").collect()
        }
        assert got[_ts(5)] == (None, None)  # nothing at-or-before
        assert got[_ts(10)] == (_ts(10), 100.0)  # inclusive: equal time matches
        assert got[_ts(20)] == (_ts(18), 200.0)  # latest at-or-before

    def test_forward_inclusive(self, spark):
        left = spark.createDataFrame(
            [(1, _ts(10)), (1, _ts(20)), (1, _ts(25))], "k int, t timestamp"
        )
        right = spark.createDataFrame(
            [(1, _ts(10), 100.0), (1, _ts(22), 200.0)], "k int, t timestamp, v double"
        )
        got = {
            r.t: (r.t_right, r.v_right)
            for r in asof_join(
                left, right, ["k"], "t", "t", direction="forward"
            ).collect()
        }
        assert got[_ts(10)] == (_ts(10), 100.0)  # inclusive at equal time
        assert got[_ts(20)] == (_ts(22), 200.0)  # earliest at-or-after
        assert got[_ts(25)] == (None, None)  # nothing after

    def test_no_cross_key_leak(self, spark):
        left = spark.createDataFrame([(1, _ts(10)), (2, _ts(10))], "k int, t timestamp")
        right = spark.createDataFrame([(1, _ts(5), 1.0)], "k int, t timestamp, v double")
        got = {r.k: r.v_right for r in asof_join(left, right, ["k"], "t", "t").collect()}
        assert got[1] == 1.0 and got[2] is None

    def test_tolerance_rejects_stale_match(self, spark):
        """merge_asof tolerance semantics: a nearest-match older than the
        tolerance yields NULL, never a fall-back to something even older."""
        left = spark.createDataFrame(
            [(1, _ts(100)), (1, _ts(200))], "k int, t timestamp"
        )
        right = spark.createDataFrame(
            [(1, _ts(95), 1.0), (1, _ts(120), 2.0)], "k int, t timestamp, v double"
        )
        got = {
            r.t: (r.t_right, r.v_right)
            for r in asof_join(
                left, right, ["k"], "t", "t", tolerance_seconds=30
            ).collect()
        }
        assert got[_ts(100)] == (_ts(95), 1.0)  # 5s stale: within tolerance
        assert got[_ts(200)] == (None, None)  # nearest is 80s stale: rejected


class TestOhlc:
    def test_bar_semantics(self, spark):
        df = spark.createDataFrame(
            [
                ("A", 1, _ts(0), 10.0),
                ("A", 2, _ts(30), 50.0),
                ("A", 3, _ts(59), 20.0),
                ("A", 4, _ts(60), 99.0),  # next minute bar
            ],
            "sec string, id long, t timestamp, px double",
        )
        bars = {
            r.bar_start: r
            for r in ohlc_bars(df, ["sec"], "t", "px", "id", bar="minute").collect()
        }
        b0 = bars[T0]
        assert (b0.open, b0.high, b0.low, b0.close) == (10.0, 50.0, 10.0, 20.0)
        assert b0.volume == 80.0 and b0.n_events == 3
        assert bars[_ts(60)].open == 99.0

    def test_tie_break_on_id(self, spark):
        df = spark.createDataFrame(
            [("A", 2, _ts(0), 7.0), ("A", 1, _ts(0), 3.0)],
            "sec string, id long, t timestamp, px double",
        )
        b = ohlc_bars(df, ["sec"], "t", "px", "id", bar="minute").collect()[0]
        assert b.open == 3.0 and b.close == 7.0  # (time, id) deterministic


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("g", i, float(i % 3)) for i in range(9)], "g string, id int, v double"
    )
    got = top_k_per_group(df, ["g"], [F.desc("v"), "id"], k=2).collect()
    assert [(r.id, r.v) for r in got] == [(2, 2.0), (5, 2.0)]


class TestDedup:
    def test_shingle_table_mode_unpinned_and_identical(self, spark, tmp_path):
        """hashed_shingled's parquet-table mode (the 100 TB sharing shape)
        must produce the same verified pairs as localCheckpoint mode and
        leave ZERO new storage-pinned RDD blocks after full evaluation."""
        from marketdb_spark.operators.dedup import verified_near_dups

        docs = spark.createDataFrame(
            [
                (i, "the quick brown fox jumps over the lazy dog " * 3
                 + ("extra tail words here" if i % 2 else ""))
                for i in range(8)
            ],
            "doc_id long, text string",
        )
        ckpt = sorted(
            (r.id_a, r.id_b, r.jaccard)
            for r in verified_near_dups(docs, threshold=0.2).collect()
        )
        jsc = spark.sparkContext._jsc.sc()
        before = jsc.getPersistentRDDs().size()
        table = sorted(
            (r.id_a, r.id_b, r.jaccard)
            for r in verified_near_dups(
                docs, threshold=0.2,
                shingle_table_path=str(tmp_path / "shh"),
            ).collect()
        )
        assert table == ckpt and len(ckpt) > 0
        assert jsc.getPersistentRDDs().size() <= before

    def test_exact_dedup_normalizes(self, spark):
        df = spark.createDataFrame(
            [(1, "Hello  World"), (2, "hello world"), (3, "different")],
            "doc_id long, text string",
        )
        got = {r.keep_id: r.n_copies for r in exact_dedup(df).collect()}
        assert got == {1: 2, 3: 1}  # case/whitespace-insensitive group

    def test_jaccard_identical_docs(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d e"), (2, "a b c d e"), (3, "x y z w q")],
            "doc_id long, text string",
        )
        pairs = {(r.id_a, r.id_b): r.jaccard for r in jaccard_pairs(df, n=2).collect()}
        assert pairs == {(1, 2): 1.0}  # identical → 1.0; disjoint → below threshold

    def test_candidate_jaccard_equals_string_jaccard(self, spark):
        """The hashed-shingle verify (candidate_jaccard) must score exactly
        what the all-pairs string-shingle kernel scores for the same pairs:
        the int64 hash sets are a faithful representation of the shingle
        sets (distinct md5-derived hashes, collision-free at test scale)."""
        from marketdb_spark.operators.dedup import candidate_jaccard

        df = spark.createDataFrame(
            [
                (1, "a b c d e f"),
                (2, "a b c d x y"),
                (3, "a b c d e f"),
                (4, "p q r s t u"),
            ],
            "doc_id long, text string",
        )
        cand = spark.createDataFrame(
            [(1, 2), (1, 3), (1, 4), (2, 3)], "id_a long, id_b long"
        )
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in candidate_jaccard(df, cand, n=2, threshold=0.0).collect()
        }
        expect = {
            (r.id_a, r.id_b): r.jaccard
            for r in jaccard_pairs(df, n=2, threshold=0.0).collect()
            if (r.id_a, r.id_b) in {(1, 2), (1, 3), (1, 4), (2, 3)}
        }
        assert got == expect
        assert got[(1, 3)] == 1.0  # identical docs
        assert got[(1, 4)] == 0.0  # disjoint docs

    def test_minhash_finds_duplicates(self, spark):
        text = "the quick brown fox jumps over the lazy dog again and again"
        df = spark.createDataFrame(
            [(1, text), (2, text), (3, "completely unrelated words here now")],
            "doc_id long, text string",
        )
        pairs = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(df).collect()}
        assert (1, 2) in pairs and (1, 3) not in pairs

    def test_simhash_near_duplicates_close(self, spark):
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        df = spark.createDataFrame(
            [(1, base), (2, base + " mu"), (3, "totally different content words")],
            "doc_id long, text string",
        )
        fp = {r.doc_id: r.simhash for r in simhash_fingerprints(df).collect()}
        ham = lambda a, b: bin(a ^ b).count("1")
        assert ham(fp[1], fp[2]) < ham(fp[1], fp[3])

    def test_simhash_bits_string_and_column_paths_agree(self, spark):
        """The SQL-string construction path (column name, one JVM parse)
        and the Column-lambda path must produce bit-identical
        fingerprints — the string path exists only to cut driver-side
        expression-building time."""
        from pyspark.sql import functions as F

        from marketdb_spark.operators.dedup import simhash_bits, tokenized
        from marketdb_spark.functions.text import token_hash64

        df = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon"),
                (2, "one two three four five six seven"),
                (3, "x"),
            ],
            "doc_id long, text string",
        )
        hashed = tokenized(df, "doc_id", "text").select(
            "id", F.transform("toks", token_hash64).alias("hs")
        )
        out = hashed.select(
            "id",
            simhash_bits("hs").alias("s_str"),
            simhash_bits(F.col("hs")).alias("s_col"),
        )
        assert out.filter(F.col("s_str") != F.col("s_col")).count() == 0

    def test_connected_components_path_and_singleton(self, spark):
        # Path 1-2-3-4-5 (diameter 4 → several propagation rounds), a
        # separate pair 10-11, and singleton 20 from the node universe.
        from marketdb_spark.operators.dedup import connected_components

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "id_a long, id_b long"
        )
        nodes = spark.createDataFrame(
            [(i,) for i in [1, 2, 3, 4, 5, 10, 11, 20]], "id long"
        )
        got = {
            r.id: r.label for r in connected_components(pairs, nodes).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 20: 20}

    def test_connected_components_one_job_per_round(self, spark):
        # Evidence for the bounded driver round-trip contract: each
        # propagation round runs exactly ONE job (the convergence count
        # materializes the lazy localCheckpoint in the same pass — see the
        # loop comment in operators.dedup.connected_components). A chain of
        # length 9 needs 8 propagation rounds + 1 confirming round; with the
        # 2 setup checkpoints (edges, initial labels) the whole call must
        # stay within rounds + 3 jobs — the old two-jobs-per-round shape
        # (eager checkpoint + separate limit(1).count()) blows past this.
        from marketdb_spark.operators.dedup import connected_components

        sc = spark.sparkContext
        chain = [(i, i + 1) for i in range(1, 9)]  # path 1-…-9, diameter 8
        pairs = spark.createDataFrame(chain, "id_a long, id_b long")
        nodes = spark.createDataFrame([(i,) for i in range(1, 10)], "id long")
        # AQE materializes each shuffle stage as its own job, which would
        # count stages, not driver round-trips; with it off, one action ==
        # one job and the assertion measures exactly what the contract says.
        prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        sc.setJobGroup("cc-job-count", "cc job count evidence")
        try:
            got = {
                r.id: r.label
                for r in connected_components(pairs, nodes).collect()
            }
        finally:
            sc._jsc.clearJobGroup()
            spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        assert got == {i: 1 for i in range(1, 10)}
        jobs = sc.statusTracker().getJobIdsForGroup("cc-job-count")
        # 8 propagation rounds + 1 confirming round = 9 count jobs (each
        # one also materializes that round's lazy checkpoint); +2 setup
        # checkpoints + 1 final collect + slack for createDataFrame
        # plumbing. The pre-fix shape (eager checkpoint + separate
        # limit(1).count()) measures ~2× this.
        assert len(jobs) <= 9 + 5, f"{len(jobs)} jobs for a 9-round CC run"


class TestKmeans:
    def test_kmeans_refine_separates_groups(self, spark):
        """Two well-separated point clouds must end up in two clusters
        after refinement, regardless of which points the hash pick seeds
        (one seed per cloud is arranged via the known hash order)."""
        from marketdb_spark.operators.similarity import kmeans_refine

        # hash order of ids 1..8 under (id*506952113) % 2^31
        h = sorted(range(1, 9), key=lambda i: ((i * 506952113) % (1 << 31), i))
        seed_a, seed_b = h[0], h[1]  # the two ids kmeans_refine will seed on
        low = {seed_a, *[i for i in range(1, 9) if i not in (seed_a, seed_b)][:3]}
        rows = [
            (i, [0.0 + i * 0.01, 1.0] if i in low else [10.0 + i * 0.01, 11.0])
            for i in range(1, 9)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = {
            r.id: r.cluster_id
            for r in kmeans_refine(df, k=2, iters=2, dims=2).collect()
        }
        low_clusters = {got[i] for i in low}
        high_clusters = {got[i] for i in range(1, 9) if i not in low}
        assert len(low_clusters) == 1 and len(high_clusters) == 1
        assert low_clusters != high_clusters

    def test_kmeans_two_level_separates_groups_and_is_deterministic(
        self, spark
    ):
        """two_level=True (coarse-quantized assignment, the r11-verdict
        quadratic fix) must still separate well-separated clouds, agree
        with itself across runs, and work through the k_frame
        (data-driven k) path — the combination dedup_semantic_pairs
        runs."""
        from pyspark.sql import functions as F

        from marketdb_spark.operators.similarity import kmeans_refine

        # 4 clouds of 8 points around distant centers, one hash seed per
        # cloud (same arrangement device as the flat-assignment test):
        # the 4 smallest-hash ids become the seeds, so cloud membership
        # is built around them
        ids = list(range(1, 33))
        h = sorted(ids, key=lambda i: ((i * 506952113) % (1 << 31), i))
        seeds, rest = h[:4], [i for i in ids if i not in h[:4]]
        clouds = [[seeds[c]] + rest[c * 7 : (c + 1) * 7] for c in range(4)]
        rows = [
            (i, [c * 100.0 + (i % 8) * 0.01, c * 100.0 + 1.0])
            for c in range(4)
            for i in clouds[c]
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        kf = df.agg(F.lit(4).cast("long").alias("k"))
        got = {
            r.id: r.cluster_id
            for r in kmeans_refine(
                df, iters=2, dims=2, k_frame=kf, two_level=True
            ).collect()
        }
        assert len(got) == 32
        # every cloud lands in exactly one cluster, clouds in distinct ones
        cloud_clusters = [{got[i] for i in clouds[c]} for c in range(4)]
        assert all(len(s) == 1 for s in cloud_clusters), got
        assert len(set.union(*cloud_clusters)) == 4
        again = {
            r.id: r.cluster_id
            for r in kmeans_refine(
                df, iters=2, dims=2, k_frame=kf, two_level=True
            ).collect()
        }
        assert got == again

    def test_centroid_update_no_int64_wrap(self, spark):
        """The centroid update accumulates 2^46-scaled int64 elements; a
        cluster whose scaled sum exceeds 2^63 (here 200 points of value
        2000: 200·2000·2^46 ≈ 2.8e19) must NOT wrap — a bigint SUM would
        return a garbage negative centroid and a wrong second-round
        assignment, silently."""
        from marketdb_spark.operators.similarity import kmeans_refine

        far_ids = list(range(1, 201))
        rows = [(i, [2000.0, 2000.0]) for i in far_ids] + [(0, [0.0, 0.0])]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = {
            r.id: r.cluster_id
            for r in kmeans_refine(df, k=2, iters=2, dims=2).collect()
        }
        # after one exact update the two centroids are ~(2000,2000) and
        # (0,0); a wrapped sum would collapse or flip the far cluster
        far_clusters = {got[i] for i in far_ids}
        assert len(far_clusters) == 1
        assert got[0] not in far_clusters


class TestSignLsh:
    def test_adaptive_width_math(self, spark):
        """bits = ceil(log2(ceil(n/target))) clamped to [4,20], computed
        integer-exactly via length(bin(x-1)) — spot values across the
        clamp range, including exact powers of two where a floating log2
        could round the wrong way."""
        from marketdb_spark.operators.similarity import adaptive_sign_bits

        cases = {1: 4, 8: 4, 128: 4, 129: 5, 500: 6, 2000: 8, 2048: 8,
                 2049: 9, 6000: 10, 8 * (1 << 20): 20, 10**12: 20}
        df = spark.createDataFrame([(n,) for n in cases], "n long")
        got = {
            r.n: r.bits
            for r in df.select(
                "n", adaptive_sign_bits(F.col("n")).alias("bits")
            ).collect()
        }
        assert got == cases

    def test_column_width_matches_int_width(self, spark):
        """The column-width fold (descending acc*2+bit) must equal the
        unrolled int-width shift sum for the same width and start."""
        from marketdb_spark.operators.similarity import sign_lsh

        rows = [
            (i, [((i >> j) & 1) * 2.0 - 1.0 for j in range(12)])
            for i in range(64)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = df.select(
            sign_lsh(F.col("embedding"), 7).alias("a"),
            sign_lsh(F.col("embedding"), F.lit(7)).alias("b"),
            sign_lsh(F.col("embedding"), 3, 5).alias("c"),
            sign_lsh(F.col("embedding"), F.lit(3), F.lit(5)).alias("d"),
        ).collect()
        for r in got:
            assert r.a == r.b and r.c == r.d

    def test_occupancy_cap_splits_hot_bucket(self, spark):
        """A skewed corpus (every vector positive in the width dims →
        ONE bucket0) must split on the extra hyperplanes: final buckets
        are disjoint from the unsplit id space, sub-keyed by the next
        dims, and the hot bucket's occupancy drops accordingly, while a
        small under-cap bucket keeps its plain bucket0 id."""
        from marketdb_spark.operators.similarity import lsh_bucketed

        # 40 hot vectors: dims 1..4 positive (bucket0=15 at the 4-bit
        # min width for n=44), dim 5 sign alternates → 2 sub-buckets.
        # 4 cold vectors: dims 1..4 negative (bucket0=0, under cap).
        rows = [
            (i, [1.0] * 4 + [1.0 if i % 2 else -1.0] + [0.5] * 3)
            for i in range(40)
        ] + [(100 + i, [-1.0] * 8) for i in range(4)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = {
            r.vec_id: r.bucket
            for r in lsh_bucketed(df, cap=16, extra_bits=4).collect()
        }
        # n=44 → ceil(44/8)=6 buckets needed → 4 bits (min clamp)
        cold = {got[100 + i] for i in range(4)}
        assert cold == {0}
        hot = {got[i] for i in range(40)}
        # split ids = 2^4 + 15*2^4 + sub = 256 + sub; sub keys on dims
        # 5..8: dim5 sign is bit 0, dims 6-8 (0.5 > 0) set bits 1-3 →
        # sub = 14 (even ids) / 15 (odd ids)
        assert hot == {270, 271}
        assert all(got[i] == (271 if i % 2 else 270) for i in range(40))

    def test_kframe_matches_int_k(self, spark):
        """kmeans_refine with a one-row k_frame must produce the exact
        assignment of the int-k path (the seed pick goes through
        TakeOrdered(max_k) + scalar-subquery filter instead of limit(k))."""
        from marketdb_spark.operators.similarity import kmeans_refine

        rows = [
            (i, [float(i % 7), float((i * 3) % 5)]) for i in range(1, 40)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        want = {
            r.id: r.cluster_id
            for r in kmeans_refine(df, k=4, iters=2, dims=2).collect()
        }
        kf = df.sparkSession.createDataFrame([(4,)], "k long")
        got = {
            r.id: r.cluster_id
            for r in kmeans_refine(df, iters=2, dims=2, k_frame=kf).collect()
        }
        assert got == want


class TestMultimodal:
    @pytest.fixture()
    def media(self, spark):
        from marketdb_spark.operators.multimodal import attach_blob

        df = spark.createDataFrame(
            [(1, "abcdefgh" * 32, "s1"), (2, "xy", "s2")],
            "doc_id long, text string, source string",
        )
        return attach_blob(df, "doc_id", "text", "application/octet-stream")

    def test_decode_features(self, media):
        from marketdb_spark.operators.multimodal import decode_media

        got = {r.media_id: r for r in decode_media(media).collect()}
        assert got[1].byte_len == 256
        assert got[2].fake_width == (ord("x") << 8) | ord("y")

    def test_real_codec_roundtrip_spark(self, spark):
        """synthesize_media writes genuine PNG/BMP/farbfeld files into the
        binary column; decode_media(real_codec=True) must recover each
        one's true dimensions from its file header."""
        from marketdb_spark.operators.multimodal import (
            _synth_params,
            decode_media,
            synthesize_media,
        )

        ids = spark.range(0, 9).select(F.col("id").alias("doc_id"))
        media = synthesize_media(ids, "doc_id")
        got = {r.media_id: r for r in decode_media(media, real_codec=True).collect()}
        assert len(got) == 9
        for mid, row in got.items():
            fmt, w, h = _synth_params(mid)
            assert (row.fmt, row.width, row.height) == (fmt, w, h)

    def test_real_codec_unparseable_blob_yields_nulls(self, media):
        """Text blobs are not image files: the real decoder surfaces them
        as null features, never as a job failure."""
        from marketdb_spark.operators.multimodal import decode_media

        rows = decode_media(media, real_codec=True).collect()
        assert len(rows) == 2
        assert all(r.fmt is None and r.width is None for r in rows)

    def test_real_resize_farbfeld_output(self, spark):
        """real_codec resize: pixel-decode a real image, nearest-neighbor
        resample, re-encode as farbfeld with the requested dimensions."""
        from marketdb_spark.functions.codecs import decode_farbfeld
        from marketdb_spark.operators.multimodal import (
            resize_media,
            synthesize_media,
        )

        ids = spark.range(0, 3).select(F.col("id").alias("doc_id"))
        media = synthesize_media(ids, "doc_id")
        got = {r.media_id: r for r in resize_media(media, 4, 2, real_codec=True).collect()}
        for r in got.values():
            w, h, _ch, _px = decode_farbfeld(bytes(r.blob))
            assert (w, h) == (4, 2)
            assert len(r.blob) == 16 + 4 * 2 * 8  # header + RGBA16 pixels

    def test_decode_features_arrow_parity(self, media):
        """mapInArrow and mapInPandas decoders must produce identical
        features (the Arrow path skips pandas materialization entirely)."""
        from marketdb_spark.operators.multimodal import (
            decode_media,
            decode_media_arrow,
        )

        pandas_rows = sorted(map(tuple, decode_media(media).collect()))
        arrow_rows = sorted(map(tuple, decode_media_arrow(media).collect()))
        assert pandas_rows == arrow_rows

    def test_resize_stride(self, media):
        from marketdb_spark.operators.multimodal import resize_media

        got = {r.media_id: r for r in resize_media(media, 4, 2).collect()}
        assert all(len(r.blob) == 8 for r in got.values())
        # nearest-neighbor of a constant-pattern blob stays in-alphabet
        assert set(bytes(got[1].blob)) <= set(b"abcdefgh")
        assert (got[1].out_w, got[1].out_h) == (4, 2)

    def test_sample_frames_even_spacing(self, media):
        from marketdb_spark.operators.multimodal import sample_frames

        rows = sample_frames(media, frame_size=64, n_frames=2).collect()
        by_id = {}
        for r in rows:
            by_id.setdefault(r.media_id, []).append(r)
        # blob 1: 256 bytes = 4 frames of 64 → sample frames 0 and 2
        assert sorted(r.frame_idx for r in by_id[1]) == [0, 2]
        assert all(len(r.frame) == 64 for r in by_id[1])
        # blob 2: shorter than one frame → single partial frame 0
        assert [r.frame_idx for r in by_id[2]] == [0]
        assert bytes(by_id[2][0].frame) == b"xy"


def test_ivf_topk_recall(spark):
    """IVF probe dial: recall grows with n_probe and reaches 1.0 when every
    cell is probed (all-cells IVF ≡ brute force)."""
    from marketdb_spark.operators.similarity import ivf_topk

    from marketdb_spark.catalog import load
    from tests.conftest import SF_SMALL

    emb = load(spark, SF_SMALL, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, q, k=5).collect()}

    def recall(n_probe):
        approx = {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(emb, q, k=5, n_cells=16, n_probe=n_probe).collect()
        }
        return len(exact & approx) / len(exact)

    assert recall(8) >= 0.8
    assert recall(16) == 1.0


def test_ivf_assign_sparse_ids_no_count(spark, monkeypatch):
    """Centroid pick is hash-based (round-2 verdict fix): non-contiguous
    ids still yield exactly n_cells centroids with dense cell_ids, and
    building the plan runs no eager count() pass over the corpus."""
    from marketdb_spark.operators.similarity import ivf_assign

    ids = [7, 17, 1001, 5003, 31337, 90001, 123457, 999983]  # gappy
    rows = [
        (i, [float((i * (d + 1)) % 13) - 6.0 for d in range(8)]) for i in ids
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def boom(self):
        raise AssertionError("ivf_assign must not run a count() job")

    monkeypatch.setattr(DataFrame, "count", boom)
    centroids, assigned = ivf_assign(df, n_cells=4)
    monkeypatch.undo()

    got = centroids.collect()
    assert sorted(r.cell_id for r in got) == [0, 1, 2, 3]
    # every vector assigned to exactly one cell, cells within range
    arows = assigned.collect()
    assert sorted(r.id for r in arows) == sorted(ids)
    assert all(0 <= r.cell_id < 4 for r in arows)


def test_cosine_topk(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 1.0]),
        (3, [-1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = cosine_topk(df, df.filter(F.col("vec_id") == 0), k=3).collect()
    order = [r.neighbor_id for r in sorted(got, key=lambda r: r.rank)]
    assert order == [1, 2, 3]  # by descending cosine
    assert got[0].cosine_sim == pytest.approx(0.9938, abs=1e-3)


def test_star_components_deep_chain(spark):
    """A 60-node path (diameter 59): the min-label loop would need 59
    rounds; the star formulation must converge within its default O(log n)
    budget and still label every node with the chain head."""
    from marketdb_spark.operators.dedup import connected_components_star

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(59)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(61)], "id long")
    got = {r.id: r.label for r in connected_components_star(pairs, nodes).collect()}
    assert all(got[i] == 0 for i in range(60))
    assert got[60] == 60  # isolated node stays a singleton


def test_star_components_early_stop_on_converged_input(spark):
    """Early termination: an input that is ALREADY a star forest (every
    edge center→leaf with center = component min) must converge within a
    single round — max_rounds=1 succeeds. The same budget on a deep chain
    must exhaust and raise, proving the early exit is the fingerprint
    fixpoint, not the round cap."""
    import pytest as _pytest

    from marketdb_spark.operators.dedup import connected_components_star

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 8)] + [(10, i) for i in range(11, 15)],
        "id_a long, id_b long",
    )
    nodes = spark.createDataFrame([(i,) for i in range(15)], "id long")
    got = {
        r.id: r.label
        for r in connected_components_star(
            star, nodes, max_rounds=1
        ).collect()
    }
    assert all(got[i] == 0 for i in range(8))
    assert all(got[i] == 10 for i in range(10, 15))
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    chain_nodes = spark.createDataFrame(
        [(i,) for i in range(31)], "id long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components_star(chain, chain_nodes, max_rounds=1)


class TestCellRangeJoin:
    """Regression for multi-unit cells: interval cells and point cells must
    share one epoch-anchored grid — a point one unit past an interval's
    start used to miss when cell='2 days'/'6 hours' stepped from each
    interval's own truncated start."""

    def _brute(self, iv, pt):
        return (
            iv.crossJoin(pt)
            .filter(
                (F.col("p") >= F.col("s")) & (F.col("p") < F.col("e"))
            )
            .select("iid", "pid")
        )

    @pytest.mark.parametrize("cell", ["2 days", "6 hours", "1 day", "90 minutes"])
    def test_matches_brute_force(self, spark, cell):
        from marketdb_spark.operators.rangejoin import cell_range_join

        iv = spark.createDataFrame(
            [
                (1, _ts(0), _ts(3 * 86400)),
                (2, _ts(86400 + 3600), _ts(86400 + 7200)),
                (3, _ts(5 * 3600), _ts(30 * 3600)),
                (4, _ts(7 * 86400), _ts(7 * 86400 + 60)),
            ],
            "iid long, s timestamp, e timestamp",
        )
        pt = spark.createDataFrame(
            [(i, _ts(v)) for i, v in enumerate(
                [0, 3599, 3600, 86400, 86400 + 3600, 2 * 86400,
                 3 * 86400 - 1, 3 * 86400, 29 * 3600, 7 * 86400 + 30]
            )],
            "pid long, p timestamp",
        )
        got = sorted(
            (r.iid, r.pid)
            for r in cell_range_join(iv, pt, "s", "e", "p", cell=cell)
            .select("iid", "pid")
            .collect()
        )
        want = sorted((r.iid, r.pid) for r in self._brute(iv, pt).collect())
        assert got == want and len(want) > 0

    def test_variable_width_unit_rejected(self, spark):
        from marketdb_spark.operators.rangejoin import cell_range_join

        iv = spark.createDataFrame([], "iid long, s timestamp, e timestamp")
        pt = spark.createDataFrame([], "pid long, p timestamp")
        with pytest.raises(ValueError, match="fixed-width"):
            cell_range_join(iv, pt, "s", "e", "p", cell="1 month")


class TestIntervalOverlapJoin:
    """interval_overlap_join must equal the brute-force overlap cross-join
    with each qualifying pair appearing EXACTLY once (the anchor-cell
    filter replaces a dedup), across cell widths that split pairs over
    1..many shared cells; half-open semantics: touching endpoints do not
    overlap."""

    def _frames(self, spark):
        a = spark.createDataFrame(
            [
                (1, _ts(0), _ts(3600)),          # 1h window
                (2, _ts(3600), _ts(7200)),       # touches #1 (no overlap)
                (3, _ts(1800), _ts(5 * 86400)),  # spans many day cells
                (4, _ts(10 * 86400), _ts(10 * 86400 + 60)),
            ],
            "a_id long, a_s timestamp, a_e timestamp",
        )
        b = spark.createDataFrame(
            [
                (10, _ts(1799), _ts(1801)),              # inside #1 and #3
                (11, _ts(3599), _ts(3601)),              # straddles 1|2
                (12, _ts(86400), _ts(2 * 86400)),        # inside #3 only
                (13, _ts(5 * 86400), _ts(6 * 86400)),    # touches #3 end
                (14, _ts(-7200), _ts(0)),                # touches #1 start
                (15, _ts(-1), _ts(20 * 86400)),          # contains all
            ],
            "b_id long, b_s timestamp, b_e timestamp",
        )
        return a, b

    def _brute(self, a, b):
        return (
            a.crossJoin(b)
            .filter(
                (F.col("a_s") < F.col("b_e")) & (F.col("b_s") < F.col("a_e"))
            )
            .select("a_id", "b_id")
        )

    @pytest.mark.parametrize("cell", ["1 day", "2 days", "1 hour", "1 week"])
    def test_matches_brute_force_exactly_once(self, spark, cell):
        from marketdb_spark.operators.rangejoin import interval_overlap_join

        a, b = self._frames(spark)
        got = sorted(
            (r.a_id, r.b_id)
            for r in interval_overlap_join(
                a, b, "a_s", "a_e", "b_s", "b_e", cell=cell
            ).select("a_id", "b_id").collect()
        )
        want = sorted((r.a_id, r.b_id) for r in self._brute(a, b).collect())
        assert got == want and len(want) > 0  # sorted ⇒ duplicates surface

    def test_variable_width_unit_rejected(self, spark):
        from marketdb_spark.operators.rangejoin import interval_overlap_join

        a = spark.createDataFrame([], "a_id long, a_s timestamp, a_e timestamp")
        b = spark.createDataFrame([], "b_id long, b_s timestamp, b_e timestamp")
        with pytest.raises(ValueError, match="fixed-width"):
            interval_overlap_join(a, b, "a_s", "a_e", "b_s", "b_e", cell="1 year")


class TestPacking:
    def test_prefix_sum_matches_naive_window(self, spark):
        """Distributed two-phase prefix sum == the single-task global
        window, on data spread across many partitions with values that
        exercise zero and large counts."""
        from pyspark.sql import Window

        from marketdb_spark.operators.packing import exclusive_prefix_sum

        rows = [(i, (i * 37) % 101) for i in range(500)]
        df = spark.createDataFrame(rows, "id long, v long").repartition(16)
        got = {
            r.id: r.offset
            for r in exclusive_prefix_sum(df, "id", "v").collect()
        }
        w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
        want = {
            r.id: r.off
            for r in df.withColumn(
                "off", F.coalesce(F.sum("v").over(w), F.lit(0))
            ).collect()
        }
        assert got == want

    def test_pack_sequences_spans(self, spark):
        from marketdb_spark.operators.packing import pack_sequences

        rows = [(0, 100), (1, 0), (2, 30), (3, 10)]
        df = spark.createDataFrame(rows, "id long, ntok long")
        got = {
            r.id: (r.offset, r.start_chunk, r.end_chunk, r.n_chunks)
            for r in pack_sequences(df, "id", "ntok", seq_len=64).collect()
        }
        # doc0: [0,100) spans chunks 0-1; doc1 empty at 100; doc2 [100,130)
        # spans chunk 1-2; doc3 [130,140) chunk 2
        assert got[0] == (0, 0, 1, 2)
        assert got[1] == (100, 1, 1, 0)
        assert got[2] == (100, 1, 2, 2)
        assert got[3] == (130, 2, 2, 1)


class TestVideoFrames:
    def test_real_frame_sampling_parses_container(self, spark):
        """synthesize_video concatenates real farbfeld frames; the real
        sampler must find frame boundaries by parsing headers and emit
        standalone decodable images."""
        from marketdb_spark.functions.codecs import decode_farbfeld
        from marketdb_spark.operators.multimodal import (
            sample_frames_real,
            synthesize_video,
        )

        ids = spark.range(0, 2).select(F.col("id").alias("doc_id"))
        video = synthesize_video(ids, "doc_id", n_frames=6, w=4, h=3)
        rows = sample_frames_real(video, n_frames=3).collect()
        by_id = {}
        for r in rows:
            by_id.setdefault(r.media_id, []).append(r)
        for mid, frames in by_id.items():
            # 6 frames sampled down to 3: indices 0, 2, 4
            assert sorted(r.frame_idx for r in frames) == [0, 2, 4]
            for r in frames:
                w, h, _ch, px = decode_farbfeld(bytes(r.frame))
                assert (w, h) == (4, 3)
                # frame content is frame-index-dependent (true boundaries):
                # pixel 0 of frame k is (mid + 17k) % 256
                assert px[0] == (mid + 17 * r.frame_idx) % 256

    def test_truncated_tail_frame_dropped(self, spark):
        from marketdb_spark.operators.multimodal import (
            sample_frames_real,
            synthesize_video,
        )
        from pyspark.sql import functions as SF

        ids = spark.range(0, 1).select(SF.col("id").alias("doc_id"))
        video = synthesize_video(ids, "doc_id", n_frames=2, w=4, h=3)
        # chop mid-way through the second frame
        clipped = video.select(
            "media_id", SF.expr("substring(blob, 1, 130)").alias("blob")
        )
        rows = sample_frames_real(clipped, n_frames=4).collect()
        assert [r.frame_idx for r in rows] == [0]


class TestResampleInterpEdgeCases:
    """The r14 single-pass rewrite of ts_resample_interp (consecutive
    observation pairs emit their bracketed hour-aligned grid points via
    lead(), replacing the union + double-window + second-scan form) must
    stay bit-identical to the DuckDB oracle on the boundary geometry the
    rewrite handles explicitly: observations exactly ON hour boundaries
    (grid point coincides with an obs → den=0 exact-value row),
    sub-second and same-second neighboring observations (den=0 via the
    seconds floor, NOT via t1==t2), single-observation users (aligned →
    one den=0 row; unaligned → no rows), pairs within one hour (no grid
    points between), and duplicate (user_id, ts) rows (deduped before
    lead, so pairs stay strictly increasing)."""

    def test_oracle_on_boundary_geometry(self, spark, tmp_path):
        from datetime import datetime

        import duckdb
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from marketdb_spark.oracle import compare
        from marketdb_spark.queries import REGISTRY

        def ts(s):
            return datetime.fromisoformat(s)

        rows = [
            # obs on an hour boundary + a same-second pair
            (1, ts("2024-01-01 10:00:00"), 5.0),
            (1, ts("2024-01-01 12:30:00.250000"), 7.5),
            (1, ts("2024-01-01 12:30:00.750000"), 9.0),
            # single obs, hour-aligned → exactly one (v1u, 1) row
            (2, ts("2024-02-01 00:00:00"), 1.0),
            # single obs, unaligned → zero rows
            (3, ts("2024-02-01 00:30:00"), 2.0),
            # two obs inside one hour, both unaligned → zero rows
            (4, ts("2024-03-01 05:10:00"), 3.0),
            (4, ts("2024-03-01 05:50:00"), 4.0),
            # same-second *seconds floor* across an hours-long gap
            (5, ts("2024-03-02 01:59:59.100000"), 1.5),
            (5, ts("2024-03-02 04:00:00"), 2.5),
            # duplicate (user_id, ts) → deduped by max(value) before lead
            (6, ts("2024-04-01 00:00:00"), 1.0),
            (6, ts("2024-04-01 00:00:00"), 3.0),
            (6, ts("2024-04-01 02:00:00"), 2.0),
        ]
        df = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
        df["event_id"] = range(len(df))
        df["event_type"] = "view"
        df["props"] = "{}"
        tbl = pa.Table.from_pandas(df)
        schema = tbl.schema.set(
            tbl.schema.get_field_index("ts"), pa.field("ts", pa.timestamp("ns"))
        )
        pq.write_table(tbl.cast(schema), str(tmp_path / "events.parquet"))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        )
        spec = REGISTRY["ts_resample_interp"]
        r = compare(
            "ts_resample_interp",
            spec.fn(spark, str(tmp_path)),
            spec.oracle,
            con,
        )
        assert r.ok, str(r)

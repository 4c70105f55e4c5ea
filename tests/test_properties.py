"""Property-based tests (hypothesis) for the invariants the oracle suite
can't sweep: order-independence of exact decimal aggregation, as-of join
equivalence to pandas merge_asof, and idempotent-ingest stability under
arbitrary redelivery. The reference has no property tests (SURVEY §5);
these pin the semantics its concurrency/mock suites pinned by hand.

Each example runs Spark jobs, so example counts are deliberately small —
the point is the random structure, not volume.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from marketdb_spark.functions.exact import dsum
from marketdb_spark.operators.asof import asof_join

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# 2-dp "prices" as floats, the shape of every money column in the testdata
prices = st.lists(
    st.integers(min_value=-10_000_00, max_value=10_000_00).map(lambda c: c / 100.0),
    min_size=1,
    max_size=40,
)


@SLOW
@given(xs=prices, seed=st.integers(min_value=0, max_value=2**31))
def test_dsum_is_order_independent_and_exact(spark, xs, seed):
    """dsum(xs) must equal the exact Decimal sum for ANY partition/order —
    the invariant that makes the DuckDB hash-compare deterministic."""
    import random

    shuffled = xs[:]
    random.Random(seed).shuffle(shuffled)
    expect = float(sum(Decimal(str(x)) for x in xs))
    for data in (xs, shuffled):
        df = spark.createDataFrame([(x,) for x in data], "v double").repartition(7)
        got = df.agg(dsum("v").alias("s")).first().s
        assert got == pytest.approx(expect, abs=0.0), (data, got, expect)


times = st.lists(
    st.integers(min_value=0, max_value=3600), min_size=1, max_size=25
)


@SLOW
@given(lt=times, rt=times)
def test_asof_join_matches_pandas_merge_asof(spark, lt, rt):
    """Backward as-of join ≡ pd.merge_asof for arbitrary event times
    (duplicates included) — the backtesting semantics of the merged
    trade←order stream (SURVEY §2B as-of row)."""
    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, t0 + dt.timedelta(seconds=s)) for s in sorted(set(lt))],
        "k int, t timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, t0 + dt.timedelta(seconds=s), float(i))
            for i, s in enumerate(sorted(set(rt)))
        ],
        "k int, t timestamp, v double",
    )
    got = {
        r.t: r.v_right
        for r in asof_join(left, right, ["k"], "t", "t").collect()
    }
    lp = pd.DataFrame({"t": [t0 + dt.timedelta(seconds=s) for s in sorted(set(lt))]})
    rp = pd.DataFrame(
        {
            "t": [t0 + dt.timedelta(seconds=s) for s in sorted(set(rt))],
            "v": [float(i) for i in range(len(set(rt)))],
        }
    )
    expect = pd.merge_asof(lp, rp, on="t", direction="backward")
    for t, v in zip(expect["t"], expect["v"]):
        g = got[t.to_pydatetime()]
        assert (g is None and pd.isna(v)) or g == v


@SLOW
@given(
    n_rows=st.integers(min_value=1, max_value=12),
    redeliver=st.lists(st.integers(min_value=0, max_value=11), max_size=12),
)
def test_idempotent_append_under_redelivery(spark, tmp_path_factory, n_rows, redeliver):
    """Appending ANY subset of already-ingested rows (the at-least-once
    redelivery space, MarketLoader.scala:119) never changes the store."""
    from marketdb_spark.sources.store import idempotent_append, read_store

    path = str(tmp_path_factory.mktemp("store") / "s")
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("RTS", "RTS-3.13", t0 + dt.timedelta(minutes=i), i, 100.0 + i)
        for i in range(n_rows)
    ]
    schema = "market string, security string, time timestamp, trade_id long, price double"
    df = spark.createDataFrame(rows, schema)
    idempotent_append(spark, df, path)
    n1 = read_store(spark, path).count()
    assert n1 == n_rows
    dup_rows = [rows[i % n_rows] for i in redeliver]
    if dup_rows:
        idempotent_append(spark, spark.createDataFrame(dup_rows, schema), path)
        assert read_store(spark, path).count() == n1


@SLOW
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ).filter(lambda e: e[0] != e[1]),
        max_size=40,
    ),
    n_nodes=st.integers(min_value=1, max_value=31),
)
def test_connected_components_matches_union_find(spark, edges, n_nodes):
    """Spark min-label propagation must agree with a driver-side union-find
    on arbitrary graphs — including chains (worst-case diameter), isolated
    nodes, parallel edges, and edges touching nodes outside the universe."""
    from marketdb_spark.operators.dedup import connected_components

    nodes = list(range(n_nodes))
    edges = [e for e in edges if e[0] < n_nodes and e[1] < n_nodes]

    parent = {i: i for i in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    # canonical label = min node id per component
    comp: dict[int, list[int]] = {}
    for i in nodes:
        comp.setdefault(find(i), []).append(i)
    expect = {i: min(members) for members in comp.values() for i in members}

    pairs_df = spark.createDataFrame(
        edges or [(0, 0)], "id_a long, id_b long"
    )
    if not edges:  # createDataFrame needs rows; a self-loop edge is a no-op
        pairs_df = pairs_df.filter("id_a != id_a")
    nodes_df = spark.createDataFrame([(i,) for i in nodes], "id long")
    got = {
        r.id: r.label
        for r in connected_components(pairs_df, nodes_df).collect()
    }
    assert got == expect


@SLOW
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ).filter(lambda e: e[0] != e[1]),
        max_size=40,
    ),
    n_nodes=st.integers(min_value=1, max_value=31),
)
def test_star_components_match_union_find(spark, edges, n_nodes):
    """The large-star/small-star formulation must agree with union-find on
    arbitrary graphs, like the min-label loop does."""
    from marketdb_spark.operators.dedup import connected_components_star

    nodes = list(range(n_nodes))
    edges = [e for e in edges if e[0] < n_nodes and e[1] < n_nodes]
    parent = {i: i for i in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    comp: dict[int, list[int]] = {}
    for i in nodes:
        comp.setdefault(find(i), []).append(i)
    expect = {i: min(members) for members in comp.values() for i in members}

    pairs_df = spark.createDataFrame(
        edges or [(0, 0)], "id_a long, id_b long"
    )
    if not edges:
        pairs_df = pairs_df.filter("id_a != id_a")
    nodes_df = spark.createDataFrame([(i,) for i in nodes], "id long")
    got = {
        r.id: r.label
        for r in connected_components_star(pairs_df, nodes_df).collect()
    }
    assert got == expect


@SLOW
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 12) - 1),
            st.integers(min_value=0, max_value=(1 << 12) - 1),
        ),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
def test_interleave_bits_matches_python_model(spark, pairs):
    """The Spark z-value expression must equal the bit-twiddling reference
    model for arbitrary in-range inputs — in particular it is injective
    (distinct (x, y) -> distinct z), which is what makes z-range scans
    decodable back to rectangles."""
    from pyspark.sql import functions as F

    from marketdb_spark.sources.zorder import interleave_bits

    def model(x, y, bits=12):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    df = spark.createDataFrame(pairs, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", interleave_bits([F.col("x"), F.col("y")], 12).alias("z")
        ).collect()
    }
    expect = {(x, y): model(x, y) for x, y in pairs}
    assert got == expect
    assert len(set(got.values())) == len(pairs)  # injective


_iv = st.tuples(
    st.integers(min_value=0, max_value=200_000),
    st.integers(min_value=1, max_value=300_000),
)  # (start_sec, width_sec) — widths from 1s to ~3.5 days


@SLOW
@given(
    a_ivs=st.lists(_iv, min_size=1, max_size=12),
    b_ivs=st.lists(_iv, min_size=1, max_size=12),
    cell=st.sampled_from(["1 hour", "6 hours", "1 day", "45 minutes"]),
)
def test_interval_overlap_join_matches_brute_force(spark, a_ivs, b_ivs, cell):
    """interval_overlap_join ≡ the brute-force overlap cross-join with
    every qualifying pair EXACTLY once, for arbitrary interval sets and
    cell widths — the anchor-cell filter must neither drop a pair whose
    shared span misses a grid line nor double-count one spanning many."""
    from marketdb_spark.operators.rangejoin import interval_overlap_join

    t0 = dt.datetime(2024, 1, 1)

    def mk(ivs, pre):
        return spark.createDataFrame(
            [
                (
                    i,
                    t0 + dt.timedelta(seconds=s),
                    t0 + dt.timedelta(seconds=s + w),
                )
                for i, (s, w) in enumerate(ivs)
            ],
            f"{pre}_id long, {pre}_s timestamp, {pre}_e timestamp",
        )

    a, b = mk(a_ivs, "a"), mk(b_ivs, "b")
    got = sorted(
        (r.a_id, r.b_id)
        for r in interval_overlap_join(
            a, b, "a_s", "a_e", "b_s", "b_e", cell=cell
        ).select("a_id", "b_id").collect()
    )
    want = sorted(
        (i, j)
        for i, (s1, w1) in enumerate(a_ivs)
        for j, (s2, w2) in enumerate(b_ivs)
        if s1 < s2 + w2 and s2 < s1 + w1
    )
    assert got == want


class TestSpoolQueueOffsetAlgebra:
    """Property: for ANY interleaving of segment creations and
    line-atomic appends, chaining read() calls consumes every complete
    line exactly once, and readBetweenOffsets replays each committed
    range bit-identically (the invariant checkpoint recovery rests on).
    Pure-driver test — no Spark session needed."""

    @given(
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(1, 4)),
            min_size=1,
            max_size=8,
        )
    )
    @settings(max_examples=30, deadline=None)
    def test_chained_reads_partition_the_journal(self, tmp_path_factory, ops):
        import json as _json

        from marketdb_spark.streaming.queuesource import (
            SpoolQueueStreamReader,
            append_segment,
        )

        spool = str(tmp_path_factory.mktemp("spool"))
        reader = SpoolQueueStreamReader({"path": spool})
        offset = reader.initialOffset()
        seen: list[tuple] = []
        offsets = [offset]
        written = 0
        for seg_i, n_lines in ops:
            append_segment(
                spool,
                f"{seg_i:04d}.ndjson",
                [{"v": written + j} for j in range(n_lines)],
            )
            written += n_lines
            rows, offset = reader.read(offsets[-1])
            seen.extend(rows)
            offsets.append(offset)
        # drain any tail
        rows, offset = reader.read(offsets[-1])
        seen.extend(rows)
        offsets.append(offset)
        # every written line exactly once (values are globally unique)
        values = sorted(_json.loads(v)["v"] for _, _, v in seen)
        assert values == list(range(written))
        # committed ranges replay bit-identically, and their concatenation
        # reproduces the full consumption in order
        replayed = []
        for a, b in zip(offsets, offsets[1:]):
            replayed.extend(reader.readBetweenOffsets(a, b))
        assert replayed == seen

    @given(
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(1, 6)),
            min_size=1,
            max_size=8,
        ),
        st.integers(1, 5),
    )
    @settings(max_examples=30, deadline=None)
    def test_capped_drain_equals_uncapped(self, tmp_path_factory, ops, cap):
        """ADMISSION CONTROL invariant (maxLinesPerTrigger): for any
        append pattern and any cap, (a) no simple-reader batch exceeds
        the cap, (b) the capped batch chain concatenates to exactly the
        uncapped journal, (c) the partitioned reader's capped
        latestOffset chain advances ≤ cap per trigger and converges to
        the same tail, with each planned range reading back the same
        lines. Pure-driver test — no Spark session needed."""
        import json as _json

        from marketdb_spark.streaming.queuesource import (
            SpoolQueuePartitionedStreamReader,
            SpoolQueueStreamReader,
            append_segment,
        )

        spool = str(tmp_path_factory.mktemp("spool"))
        written = 0
        for seg_i, n_lines in ops:
            append_segment(
                spool,
                f"{seg_i:04d}.ndjson",
                [{"v": written + j} for j in range(n_lines)],
            )
            written += n_lines

        # (a)+(b): simple reader, capped chain == uncapped journal
        capped = SpoolQueueStreamReader(
            {"path": spool, "maxLinesPerTrigger": str(cap)}
        )
        uncapped = SpoolQueueStreamReader({"path": spool})
        all_rows, _ = uncapped.read(uncapped.initialOffset())
        all_rows = list(all_rows)
        chain, pos = [], capped.initialOffset()
        for _ in range(written + 1):
            rows, pos = capped.read(pos)
            rows = list(rows)
            if not rows:
                break
            assert len(rows) <= cap
            chain.extend(rows)
        assert chain == all_rows
        values = sorted(_json.loads(v)["v"] for _, _, v in chain)
        assert values == list(range(written))

        # (c): partitioned reader's capped planning converges to the tail
        r = SpoolQueuePartitionedStreamReader(
            {"path": spool, "maxLinesPerTrigger": str(cap)}
        )
        offsets = [r.initialOffset()]
        for _ in range(written + 1):
            nxt = r.latestOffset()
            if nxt == offsets[-1]:
                break
            advanced = sum(nxt["pos"].values()) - sum(
                offsets[-1]["pos"].values()
            )
            assert 0 < advanced <= cap
            offsets.append(nxt)
        assert sum(offsets[-1]["pos"].values()) == written
        ranged = []
        for a, b in zip(offsets, offsets[1:]):
            for part in r.partitions(a, b):
                ranged.extend(r.read(part))
        assert ranged == all_rows


# ---------------------------------------------------------------------------
# Deltastream admission planner (streaming/deltasource.py): pure-Python
# property sweep — the log is virtualized (no disk, no Spark), so hypothesis
# can hammer layouts the fixture tests can't: empty commits at every
# position, caps landing exactly on unit boundaries, restarts at arbitrary
# batch boundaries, growth after catch-up. The virtual table models an
# append-only log of commits 0..n-1: the snapshot unit's file list is the
# LIVE SET at the pinned version (union of commits ≤ snap, sorted by path,
# exactly what _replay returns), tail units are their commit's adds.
# ---------------------------------------------------------------------------

from unittest.mock import patch  # noqa: E402

from marketdb_spark.streaming import deltasource as _ds  # noqa: E402

FAST = settings(max_examples=60, deadline=None)


def _fake_reader(commits, caps):
    """A DeltaStreamReader over a virtual append-only log. `commits` is
    {version: [(rel, pvals, size)...]} — the adds of each commit."""
    opts = {"path": "<fake>", "partcols": "[]"}
    opts.update(caps)
    r = _ds.DeltaStreamReader(opts, None)

    def files(unit):
        if r._snap is not None and unit == r._snap:
            return sorted(
                f for u in commits if u <= unit for f in commits[u]
            )
        return commits[unit]

    r._unit_files = files  # type: ignore[method-assign]
    return r


def _drive(r, latest, prev=None, rounds=200):
    """Run the trigger loop until the offset stabilizes; returns
    (initial_offset_if_fresh, [(end_offset, [rels...]), ...])."""
    init = None
    batches = []
    with patch.object(_ds, "_latest_version", lambda table: latest):
        for _ in range(rounds):
            end = r.latestOffset()
            if prev is None:
                init = r.initialOffset()
                prev = init
            if end == prev:
                break
            rels = [p.rel for p in r.partitions(prev, end) if p.rel]
            batches.append((end, rels))
            r.commit(end)
            prev = end
        else:  # pragma: no cover - planner failed to converge
            raise AssertionError("planner did not stabilize")
    return init, batches


@st.composite
def _layouts(draw):
    sizes = draw(st.lists(st.integers(0, 4), min_size=1, max_size=8))
    commits = {
        u: [
            (f"u{u}f{i}", {}, draw(st.integers(1, 20)))
            for i in range(n)
        ]
        for u, n in enumerate(sizes)
    }
    # the stream starts while the table is at `snap`; commits above it
    # land afterwards and are consumed as the tail
    snap = draw(st.integers(0, len(sizes) - 1))
    caps = draw(
        st.one_of(
            st.fixed_dictionaries({"maxFilesPerTrigger": st.integers(1, 7).map(str)}),
            st.fixed_dictionaries({"maxBytesPerTrigger": st.integers(1, 50).map(str)}),
            st.fixed_dictionaries(
                {
                    "maxFilesPerTrigger": st.integers(1, 7).map(str),
                    "maxBytesPerTrigger": st.integers(1, 50).map(str),
                }
            ),
        )
    )
    return commits, snap, caps


def _expected(commits, snap):
    snapshot = sorted(
        rel for u in commits if u <= snap for rel, _p, _s in commits[u]
    )
    tail = [
        rel
        for u in sorted(commits)
        if u > snap
        for rel, _p, _s in commits[u]
    ]
    return snapshot + tail


def _full_drive(commits, snap, caps):
    """Fresh query pinned while the table is at `snap`, then the rest of
    the log lands: returns (reader, init, batches) across both phases."""
    r = _fake_reader(commits, caps)
    init, batches = _drive(r, snap)  # snapshot (+ nothing above it yet)
    latest = max(commits)
    if latest > snap:
        prev = batches[-1][0] if batches else init
        _i, more = _drive(r, latest, prev=prev)
        batches = batches + more
    return r, init, batches


@FAST
@given(layout=_layouts())
def test_capped_planner_no_loss_no_dup_bounded(layout):
    """For ANY log layout, snapshot boundary and cap combination: the
    capped batch chain is exactly snapshot-live-set + tail adds (no
    loss, no dup, no reorder), every batch respects the binding budget
    (bytes are a soft cap: all but the last admitted file fit), offsets
    are monotone, and the drained planner is stable."""
    commits, snap, caps = layout
    sizes = {rel: s for u in commits.values() for rel, _p, s in u}
    r, init, batches = _full_drive(commits, snap, caps)
    got = [rel for _off, rels in batches for rel in rels]
    assert got == _expected(commits, snap)
    assert len(got) == len(set(got))
    max_files = int(caps.get("maxFilesPerTrigger", 0)) or None
    max_bytes = int(caps.get("maxBytesPerTrigger", 0)) or None
    offs = [r._norm(off) for off, _rels in batches]
    assert offs == sorted(offs)
    for _off, rels in batches:
        if max_files is not None:
            assert len(rels) <= max_files
        if max_bytes is not None and rels:
            assert sum(sizes[x] for x in rels[:-1]) < max_bytes
    # caught up: the next latestOffset is bit-identical (no empty batches)
    with patch.object(_ds, "_latest_version", lambda table: max(commits)):
        assert not batches or r.latestOffset() == batches[-1][0]


@FAST
@given(layout=_layouts(), data=st.data())
def test_capped_planner_restart_and_growth(layout, data):
    """Restart at ANY batch boundary: a fresh planner that replays the
    checkpointed batch resumes exactly (no re-snapshot, no skipped
    files), and commits landing after catch-up drain as capped tail
    batches."""
    commits, snap, caps = layout
    latest = max(commits)
    r, init, batches = _full_drive(commits, snap, caps)
    if batches:
        k = data.draw(st.integers(0, len(batches) - 1), label="restart_at")
        start = init if k == 0 else batches[k - 1][0]
        r2 = _fake_reader(commits, caps)
        with patch.object(_ds, "_latest_version", lambda table: latest):
            replay = [
                p.rel for p in r2.partitions(start, batches[k][0]) if p.rel
            ]
        assert replay == batches[k][1]  # bit-identical replay
        _i2, rest = _drive(r2, latest, prev=batches[k][0])
        tail_expect = [rel for _o, rels in batches[k + 1 :] for rel in rels]
        assert [rel for _o, rels in rest for rel in rels] == tail_expect
    # growth: new commits above latest drain capped, nothing re-emitted
    grown = dict(commits)
    for j in range(data.draw(st.integers(1, 3), label="new_units")):
        u = max(grown) + 1
        grown[u] = [
            (f"u{u}f{i}", {}, 5)
            for i in range(data.draw(st.integers(0, 3), label=f"sz{j}"))
        ]
    def grown_files(unit, _c=grown):
        if r._snap is not None and unit == r._snap:
            return sorted(f for u in _c if u <= unit for f in _c[u])
        return _c[unit]

    r._unit_files = grown_files  # type: ignore[method-assign]
    prev = batches[-1][0] if batches else init
    _i3, more = _drive(r, max(grown), prev=prev)
    new_expect = [
        rel
        for u in sorted(grown)
        if u > latest
        for rel, _p, _s in grown[u]
    ]
    assert [rel for _o, rels in more for rel in rels] == new_expect


# -- on-disk deletion-vector file framing (sources/deltadv.py) -------------


@given(
    sets=st.lists(
        st.lists(
            st.integers(min_value=0, max_value=1 << 40),
            min_size=0,
            max_size=300,
        ),
        min_size=1,
        max_size=4,
    ),
    prefix=st.sampled_from(["", "ab", "x/y"]),
    absolute=st.booleans(),
)
def test_dv_file_framing_roundtrip(tmp_path_factory, sets, prefix, absolute):
    """write_dv_file ↔ decode_dv round-trips ANY row-position sets
    through the protocol's multi-frame file layout (version byte,
    per-frame big-endian size + MAGIC-roaring payload + CRC-32), in both
    path encodings ('u' prefix+Z85-UUID and 'p' absolute), and the CRC
    guard catches a single flipped payload byte in any frame."""
    import os

    from marketdb_spark.sources.deltadv import (
        decode_dv,
        dv_file_path,
        write_dv_file,
    )

    table = str(tmp_path_factory.mktemp("dvprop"))
    rel_rows = {f"f{i}.parquet": rows for i, rows in enumerate(sets)}
    descs = write_dv_file(table, rel_rows, prefix=prefix, absolute=absolute)
    for rel, rows in rel_rows.items():
        got = decode_dv(descs[rel], table, rel)
        assert got == sorted(set(rows))
    # all frames live in ONE file
    paths = {dv_file_path(d, table) for d in descs.values()}
    assert len(paths) == 1
    [full] = paths
    # flip one payload byte of the FIRST non-empty frame: CRC must catch
    victim = next(
        (r for r in rel_rows if rel_rows[r]), None
    )
    if victim is not None:
        blob = bytearray(open(full, "rb").read())
        off = int(descs[victim]["offset"])
        blob[off + 4] ^= 0xFF
        with open(full, "wb") as f:
            f.write(bytes(blob))
        import pytest as _pytest

        with _pytest.raises(ValueError, match="CRC-32|magic|dataSize"):
            decode_dv(descs[victim], table, victim)

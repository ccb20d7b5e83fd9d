"""Salted fold (SURVEY §7.3): bit-equality against the sequential fold.

The salted decomposition must be invisible in the output: same segment rows
(including seq numbering), same relation set, for any salt count, any state,
tombstones and polygon mode included.
"""

import pandas as pd
import pytest

from linked_maps_spark import geometry as G
from linked_maps_spark.changelog import synth_change_log
from linked_maps_spark.fold import fold_key
from linked_maps_spark.saltfold import fold_key_salted


def _by_key(wal: pd.DataFrame):
    for (repo, path), sub in wal.groupby(["repo", "path"]):
        yield repo, path, sub.sort_values("commit").to_dict("records")


def _assert_equal(seq_res, salt_res, key):
    exp = {r["gid"]: r for r in seq_res.segments}
    got = {r["gid"]: r for r in salt_res.segments}
    assert set(got) == set(exp), f"gid set mismatch for {key}"
    for gid, erow in exp.items():
        grow = got[gid]
        assert set(grow) == set(erow), f"column mismatch for {erow['name']}"
        for c in erow:
            ev, gv = erow[c], grow[c]
            if c == "editions":
                ev, gv = list(ev), list(gv)
            assert gv == ev, f"{c} mismatch for {erow['name']}: {gv!r} != {ev!r}"
    assert (
        {(r["parent_gid"], r["child_gid"]) for r in salt_res.relations}
        == {(r["parent_gid"], r["child_gid"]) for r in seq_res.relations}
    )


@pytest.mark.parametrize("n_salts", [1, 2, 3, 8])
@pytest.mark.parametrize("seed,tomb", [(3, 0), (11, 0), (7, 2)])
def test_salted_equals_sequential_fresh(n_salts, seed, tomb):
    wal = synth_change_log(n_keys=3, n_commits=6, seed=seed, tombstone_every=tomb)
    for repo, path, events in _by_key(wal):
        seq_res = fold_key(repo, path, events, [])
        salt_res = fold_key_salted(repo, path, events, [], n_salts=n_salts)
        _assert_equal(seq_res, salt_res, (repo, path))


@pytest.mark.parametrize("n_salts", [2, 4])
def test_salted_equals_sequential_over_state(n_salts):
    """Fold epoch 1 sequentially, then epoch 2 salted-vs-sequential over the
    surviving leaf state — the production shape (resume state from the lake)."""
    wal = synth_change_log(n_keys=3, n_commits=8, seed=23)
    commits = sorted(wal["commit"].unique())
    cut = commits[3]
    for repo, path, events in _by_key(wal):
        ev1 = [e for e in events if e["commit"] <= cut]
        ev2 = [e for e in events if e["commit"] > cut]
        first = fold_key(repo, path, ev1, [])
        leaves = [r for r in first.segments if r["is_leaf"] and not r["retired"]]
        seq_res = fold_key(repo, path, ev2, leaves)
        salt_res = fold_key_salted(repo, path, ev2, leaves, n_salts=n_salts)
        _assert_equal(seq_res, salt_res, (repo, path))


def test_salted_polygon_mode():
    wal = synth_change_log(n_keys=2, n_commits=5, seed=17, geom_type=G.POLYGON)
    for repo, path, events in _by_key(wal):
        seq_res = fold_key(repo, path, events, [], geom_type=G.POLYGON)
        salt_res = fold_key_salted(repo, path, events, [], n_salts=3, geom_type=G.POLYGON)
        _assert_equal(seq_res, salt_res, (repo, path))


def _skewed_wal(n_cold_keys: int = 8, n_commits: int = 6) -> pd.DataFrame:
    """FIXTURES.md §6 ``skewed_log`` shape: one key whose lattice dwarfs the
    rest (a dense urban sheet): the hot key carries ~6× the geometry, so its
    per-epoch fold work dominates a uniform key's."""
    cold = synth_change_log(n_keys=n_cold_keys, n_commits=n_commits, seed=41)
    hot = synth_change_log(
        n_keys=1, n_commits=n_commits, seed=42, n_walks=36, walk_len=10, grid=120
    )
    hot["path"] = "railroads/hot"
    hot["repo"] = "region_hot"
    return pd.concat([cold, hot], ignore_index=True)


def test_skewed_engine_digest_and_balance(spark, tmp_path):
    """End-to-end through the Spark wiring: ingesting the skewed log with the
    salted fold enabled must produce the identical warehouse digest as the
    plain sequential fold, and the hot key's work must split across slices
    with no straggler slice >2× the median (work units = created nodes,
    deterministic — wall-time evidence lives in the metrics table)."""
    from linked_maps_spark.ingest import CdcEngine
    from linked_maps_spark.changelog import to_spark
    from linked_maps_spark.saltfold import fold_slice
    from linked_maps_spark.util import table_digest

    wal = _skewed_wal()
    wal_sdf = to_spark(spark, wal)

    plain = CdcEngine(spark, str(tmp_path / "plain"), n_buckets=4, n_salts=1)
    plain.create_tables(overwrite=True)
    plain.ingest(wal_sdf, commits_per_epoch=2)

    salted = CdcEngine(
        spark, str(tmp_path / "salted"), n_buckets=4, n_salts=4, salt_leaf_threshold=8
    )
    salted.create_tables(overwrite=True)
    salted.ingest(wal_sdf, commits_per_epoch=2)

    cols = [
        "repo", "path", "gid", "name", "seq", "wkt", "content_sha256",
        "editions", "is_leaf", "retired",
    ]
    assert table_digest(salted.current_segments(), cols) == table_digest(
        plain.current_segments(), cols
    )
    assert table_digest(salted.relations.read()) == table_digest(plain.relations.read())
    # the hot key actually went down the salted path (metrics carry the
    # coordinator stage's offset partition ids)
    assert salted.metrics.read().filter("partition_id >= 20000").count() > 0

    # slice balance on the hot key's final state: fold one more edition over
    # its leaves, sliced the way the engine slices them
    leaves = [
        r.asDict()
        for r in salted.current_leaves().filter("path = 'railroads/hot'").collect()
    ]
    assert len(leaves) >= 8
    events = [
        {"repo": "region_hot", "path": "railroads/hot",
         "commit": "1990c", "lang": "wkt",
         "content": leaves[0]["wkt"]}
    ]
    n_salts = 4
    slices = [[] for _ in range(n_salts)]
    for r in leaves:
        slices[int(r["seq"]) % n_salts].append(r)
    work = [
        len(fold_slice("region_hot", "railroads/hot", events, s).metas)
        for s in slices
    ]
    work = [max(w, 1) for w in work]
    med = sorted(work)[len(work) // 2]
    assert max(work) <= 2 * med, f"straggler slice: {work}"


def test_salted_with_duplicate_events():
    """Replicated event streams must collapse identically in every slice."""
    wal = synth_change_log(n_keys=2, n_commits=5, seed=9)
    for repo, path, events in _by_key(wal):
        dup = events + events[::-1]
        seq_res = fold_key(repo, path, events, [])
        salt_res = fold_key_salted(repo, path, dup, [], n_salts=4)
        _assert_equal(seq_res, salt_res, (repo, path))


# ------------------------------------------------------- hypothesis fuzzing

from hypothesis import given, settings, strategies as hst


def _wkt_from_cells(cells):
    """Tiny grid multiline from (x, y, dir) triples (axis/diag unit edges)."""
    import numpy as np

    from linked_maps_spark import geometry as G

    ids = []
    for x, y, d in cells:
        ux, uy = G._DIRS[d]
        if not (0 <= x + ux < 40 and 0 <= y + uy < 40):
            continue
        p = x * G._P + y
        q = (x + ux) * G._P + (y + uy)
        ids.append(min(p, q) * G._E + max(p, q))
    if not ids:
        return ""  # degenerate → tombstone-shaped content
    import numpy as np

    return G.to_wkt(np.unique(np.array(ids, dtype=np.int64)), G.LINE)


_events_strategy = hst.lists(
    hst.tuples(
        hst.integers(0, 5),  # commit index
        hst.one_of(
            hst.just("TOMB"),
            hst.lists(
                hst.tuples(hst.integers(0, 38), hst.integers(0, 38), hst.integers(0, 3)),
                min_size=0,
                max_size=12,
            ),
        ),
    ),
    min_size=1,
    max_size=10,
)


@settings(max_examples=60, deadline=None)
@given(_events_strategy, hst.integers(1, 5))
def test_salted_equals_sequential_fuzzed(raw_events, n_salts):
    """Any event sequence — duplicate commits, tombstones, empty and
    overlapping geometries — folds bit-identically salted vs sequential."""
    events = []
    for ci, payload in raw_events:
        content = "" if payload == "TOMB" else _wkt_from_cells(payload)
        events.append(
            {"repo": "r", "path": "p", "commit": f"{1950 + ci:04d}c",
             "lang": "wkt", "content": content}
        )
    seq_res = fold_key("r", "p", events, [])
    salt_res = fold_key_salted("r", "p", events, [], n_salts=n_salts)
    _assert_equal(seq_res, salt_res, ("r", "p"))
    # and again over the surviving state (steady-state epoch shape)
    leaves = [r for r in seq_res.segments if r["is_leaf"] and not r["retired"]]
    more = [
        {"repo": "r", "path": "p", "commit": "1980c", "lang": "wkt",
         "content": _wkt_from_cells([(5, 5, 0), (6, 5, 0), (7, 7, 2)])}
    ]
    _assert_equal(
        fold_key("r", "p", more, leaves),
        fold_key_salted("r", "p", more, leaves, n_salts=n_salts),
        ("r", "p", "epoch2"),
    )


def test_salted_quarantine_equals_plain_quarantine(spark, tmp_path):
    """A poisoned skewed WAL under on_error='quarantine': the salted engine
    must converge to the same state AND the same dead rows as the plain
    engine (slices drop poison identically; the coordinator emits it once)."""
    from linked_maps_spark.changelog import to_spark
    from linked_maps_spark.ingest import CdcEngine
    from linked_maps_spark.util import table_digest

    wal = _skewed_wal()
    # poison one hot-key event in a late epoch (the hot key is salted by
    # then) and one cold-key event
    hot_idx = wal.index[(wal["path"] == "railroads/hot")][-1]
    cold_idx = wal.index[(wal["path"] != "railroads/hot")][-1]
    wal.loc[hot_idx, "content"] = "MULTILINESTRING ((0.005 0.00, 0.01 0.00))"
    wal.loc[cold_idx, "content"] = "garbage (("
    wal_sdf = to_spark(spark, wal)

    plain = CdcEngine(spark, str(tmp_path / "plainq"), n_buckets=4, n_salts=1,
                      on_error="quarantine")
    plain.create_tables(overwrite=True)
    plain.ingest(wal_sdf, commits_per_epoch=2)

    salted = CdcEngine(spark, str(tmp_path / "saltedq"), n_buckets=4, n_salts=4,
                       salt_leaf_threshold=8, on_error="quarantine")
    salted.create_tables(overwrite=True)
    salted.ingest(wal_sdf, commits_per_epoch=2)

    cols = [
        "repo", "path", "gid", "name", "seq", "wkt", "content_sha256",
        "editions", "is_leaf", "retired",
    ]
    assert table_digest(salted.current_segments(), cols) == table_digest(
        plain.current_segments(), cols
    )
    # the hot key went down the salted path in the salted engine
    assert salted.metrics.read().filter("partition_id >= 20000").count() > 0
    dead_cols = ["repo", "path", "commit", "error", "content"]
    assert table_digest(salted.read_dead_letter(), dead_cols) == table_digest(
        plain.read_dead_letter(), dead_cols
    )
    assert salted.read_dead_letter().count() == 2

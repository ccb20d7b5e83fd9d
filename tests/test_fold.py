"""Cross-check the engine fold (fold.py) against the literal oracle
(oracle_ref.py) and verify the reference's structural invariants
(SURVEY.md §5.2 item 4)."""

import numpy as np
import pytest

from linked_maps_spark import geometry as G
from linked_maps_spark.changelog import commit_label, synth_change_log
from linked_maps_spark.fold import edition_years, fold_key, make_gid

from .oracle_ref import OracleGraph


def _events_for_key(pdf, repo, path):
    sub = pdf[(pdf.repo == repo) & (pdf.path == path)].sort_values("commit")
    return sub.to_dict("records")


def _run_both(events, geom_type=G.LINE):
    res = fold_key("r", "p", events, leaves_in=[], geom_type=geom_type)
    oracle = OracleGraph(geom_type)
    for ev in sorted(events, key=lambda e: e["commit"]):
        if (ev.get("content") or "").strip() == "":
            continue  # oracle has no tombstone concept; engine covers it separately
        oracle.add_edition(ev["commit"], ev["content"])
    return res, oracle


@pytest.mark.parametrize("geom_type", [G.LINE, G.POLYGON])
def test_fold_matches_oracle_synthetic(geom_type):
    pdf = synth_change_log(n_keys=6, n_commits=5, seed=11, geom_type=geom_type)
    keys = pdf[["repo", "path"]].drop_duplicates().values.tolist()
    for repo, path in keys:
        events = _events_for_key(pdf, repo, path)
        res, oracle = _run_both(events, geom_type)
        got = {r["name"]: r for r in res.segments}
        exp = {r["name"]: r for r in oracle.segments()}
        assert set(got) == set(exp), f"node sets differ for {repo}/{path}"
        for name, erow in exp.items():
            grow = got[name]
            assert grow["wkt"] == erow["wkt"], f"wkt mismatch at {name}"
            assert grow["seq"] == erow["seq"], f"seq mismatch at {name}"
            assert grow["is_leaf"] == erow["is_leaf"], f"leaf flag mismatch at {name}"
        got_rel = {(r["parent_gid"], r["child_gid"]) for r in res.relations}
        exp_rel = {
            (make_gid("r", "p", r["parent_name"]), make_gid("r", "p", r["child_name"]))
            for r in oracle.relations()
        }
        assert got_rel == exp_rel
        # transitive date propagation (generate_graph.py:73-75)
        exp_dates = oracle.editions_transitive()
        for name, grow in got.items():
            assert sorted(grow["editions"]) == sorted(exp_dates[name]), name


def test_incremental_equals_batch():
    """Replaying the log in two epochs from persisted leaf state must equal a
    single-shot fold — the core CDC resume invariant."""
    pdf = synth_change_log(n_keys=3, n_commits=6, seed=3)
    for (repo, path), sub in pdf.groupby(["repo", "path"]):
        events = sub.sort_values("commit").to_dict("records")
        full = fold_key(repo, path, events, leaves_in=[])
        first = fold_key(repo, path, events[:3], leaves_in=[])
        leaves = [r for r in first.segments if r["is_leaf"] and not r["retired"]]
        second = fold_key(repo, path, events[3:], leaves_in=leaves)
        # merge-by-gid of the two incremental outputs == batch output
        merged = {r["gid"]: r for r in first.segments}
        merged.update({r["gid"]: r for r in second.segments})
        batch = {r["gid"]: r for r in full.segments}
        assert merged == batch
        rel_inc = {(r["parent_gid"], r["child_gid"]) for r in first.relations + second.relations}
        rel_full = {(r["parent_gid"], r["child_gid"]) for r in full.relations}
        assert rel_inc == rel_full


def test_partition_invariant():
    """Leaves partition the accumulated geometry (SURVEY.md §2.5 postcondition)."""
    pdf = synth_change_log(n_keys=2, n_commits=5, seed=5)
    for (repo, path), sub in pdf.groupby(["repo", "path"]):
        events = sub.sort_values("commit").to_dict("records")
        res = fold_key(repo, path, events, leaves_in=[])
        leaves = [r for r in res.segments if r["is_leaf"]]
        leaf_sets = [G.parse_wkt(r["wkt"]) for r in leaves]
        # pairwise disjoint
        for i in range(len(leaf_sets)):
            for j in range(i + 1, len(leaf_sets)):
                assert G.intersect(leaf_sets[i], leaf_sets[j]).size == 0
        # union of leaves covers the union of all editions
        editions = [G.parse_wkt(e["content"]) for e in events]
        assert np.array_equal(G.union_all(leaf_sets), G.union_all(editions))


def test_dag_shape():
    """i_* nodes have 2 parents; m_*/mu_* have 1 (segment.py:88-114)."""
    pdf = synth_change_log(n_keys=2, n_commits=4, seed=9)
    for (repo, path), sub in pdf.groupby(["repo", "path"]):
        events = sub.sort_values("commit").to_dict("records")
        res = fold_key(repo, path, events, leaves_in=[])
        by_gid = {r["gid"]: r for r in res.segments}
        parents: dict[str, int] = {}
        for rel in res.relations:
            parents[rel["child_gid"]] = parents.get(rel["child_gid"], 0) + 1
        for gid, n in parents.items():
            name = by_gid[gid]["name"]
            if name.startswith("i_"):
                assert n == 2, name
            else:
                assert n == 1, name


def test_tombstone_retires_key():
    wkt = "MULTILINESTRING ((0.00 0.00, 0.03 0.00))"
    events = [
        {"commit": commit_label(0), "content": wkt},
        {"commit": commit_label(1), "content": ""},
        {"commit": commit_label(2), "content": wkt},
    ]
    res = fold_key("r", "p", events, leaves_in=[])
    retired = [r for r in res.segments if r["retired"]]
    alive_leaves = [r for r in res.segments if r["is_leaf"] and not r["retired"]]
    assert {r["name"] for r in retired} == {commit_label(0)}
    assert {r["name"] for r in alive_leaves} == {commit_label(2)}


def test_edition_years_rule():
    assert edition_years("1962c") == ["1962"]
    assert edition_years("i_abcdef") == []


def test_deterministic_gids():
    assert make_gid("a", "b", "c") == make_gid("a", "b", "c")
    assert make_gid("a", "b", "c") != make_gid("a", "b", "d")

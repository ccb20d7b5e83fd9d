"""Hot-key salted fold — SURVEY.md §7.3's commit-range/leaf-slice
decomposition of the sequential edition fold.

The fold (``fold.fold_key``, semantics from ``/root/reference/main.py:85-131``)
is sequential per ``(repo, path)`` key: round *r*'s leaf set feeds round
*r+1*.  A Zipf-head key therefore serializes its whole lattice into one task
(round-1 skew gap).  This module parallelizes the one dimension that IS
independent without changing a single output bit:

* Within a round, each leaf's ``I = L ∩ E`` / ``M = L \\ I`` pair depends on
  that leaf alone, and the children stay in the same lineage — so the leaf
  set can be **sliced across salts** and each slice folds the *entire* commit
  sequence over only its leaves (``fold_slice``).
* The only cross-slice values per round are (a) the union of all I-geometries
  (the ``mu`` subtrahend, ``main.py:111-118``) and (b) the "any intersection"
  bit (edition leaf fate).  Both are unions — associative — so each slice
  reports a per-round partial and a per-key **coordinator** (``fold_coord``)
  folds the edition/mu lineage with those partials mixed in.
* ``seq`` is the one output that depends on global creation order.  Names /
  gids / geometry / editions don't (gid = hash of name; names derive from
  parent names + commit), so a final metadata-only ``renumber`` pass replays
  the sequential assignment: per round — edition node, then per leaf in
  final-seq order its I then M, then mu.

``fold_key_salted`` composes the three phases in-process and is
property-tested for bit-equality against ``fold_key``; the Spark wiring in
``ingest`` runs slices as ``(repo, path, salt)`` groups and coordinators as
``(repo, path)`` groups.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import geometry as G
from .fold import (
    FoldResult,
    _Node,
    dedup_events,
    edition_years,
    gid_factory,
    leaves_from_rows,
    md5_hex,
    rows_from_nodes,
)


@dataclass
class SliceResult:
    """Phase-1 output of one leaf slice."""

    segments: list[dict]  # rows with PROVISIONAL seq (patched by renumber)
    relations: list[dict]
    partials: list[dict]  # per round: {commit, ids: list[int], any_i: bool}
    metas: list[dict]  # per created node: {name, kind, commit, parent_name}
    initial_seqs: dict[str, int]  # leaf name -> real seq of the input state


def fold_slice(
    repo: str,
    path: str,
    events: list[dict],
    leaves_in: list[dict],
    geom_type: str = G.LINE,
) -> SliceResult:
    """Fold the full commit sequence over ONE leaf slice.

    Mirrors ``fold_key``'s leaf loop exactly, minus everything the
    coordinator owns: no edition node is emitted (its gid is derivable for
    relation wiring), no ``mu`` is computed — instead each round reports the
    union of this slice's intersection geometries."""
    leaves = leaves_from_rows(leaves_in, geom_type)
    initial_seqs = {l.name: l.seq for l in leaves}
    next_seq = max((l.seq for l in leaves), default=-1) + 1
    created: list[_Node] = []
    touched: dict[str, _Node] = {}
    relations: list[dict] = []
    partials: list[dict] = []
    metas: list[dict] = []

    _gid = gid_factory(repo, path)

    def _new(name, ids, editions, commit, parent_name, kind) -> _Node:
        nonlocal next_seq
        node = _Node(
            seq=next_seq, gid=_gid(name), name=name,
            ids=ids, editions=editions, commit_created=commit,
        )
        next_seq += 1
        created.append(node)
        touched[node.gid] = node
        metas.append({"name": name, "kind": kind, "commit": commit, "parent_name": parent_name})
        return node

    def _link(parent: _Node, child: _Node) -> None:
        relations.append(
            {"repo": repo, "path": path, "parent_gid": parent.gid, "child_gid": child.gid}
        )
        if parent.is_leaf:
            parent.is_leaf = False
            parent.dirty = True
            touched[parent.gid] = parent

    for ev in dedup_events(events):
        n_created_before = len(created)
        commit = ev["commit"]
        content = ev.get("content") or ""
        if content.strip() == "":
            for leaf in leaves:
                leaf.retired = True
                leaf.dirty = True
                touched[leaf.gid] = leaf
            leaves = []
            continue

        e_ids = G.parse_wkt(content, geom_type)
        e_gid = _gid(commit)  # edition emitted by the coordinator
        e_editions = tuple(edition_years(commit))

        round_union: np.ndarray | None = None
        for leaf in leaves:
            i_ids = G.intersect(leaf.ids, e_ids)
            if G.is_multi(i_ids):
                i_name = "i_" + md5_hex(f"i_{leaf.name}_{commit}")
                i_node = _new(
                    i_name, i_ids,
                    tuple(dict.fromkeys(leaf.editions + e_editions)),
                    commit, leaf.name, "i",
                )
                _link(leaf, i_node)
                relations.append(
                    {"repo": repo, "path": path, "parent_gid": e_gid, "child_gid": i_node.gid}
                )
                round_union = (
                    i_ids if round_union is None else G.union_all([round_union, i_ids])
                )
                m_ids = G.difference(leaf.ids, i_ids)
                if G.is_multi(m_ids):
                    m_name = "m_" + md5_hex(f"m_{leaf.name}_{i_node.name}")
                    m_node = _new(m_name, m_ids, leaf.editions, commit, leaf.name, "m")
                    _link(leaf, m_node)

        partials.append(
            {
                "commit": commit,
                "ids": [] if round_union is None else [int(x) for x in round_union],
                "any_i": round_union is not None,
            }
        )
        # incremental next-leaves (same derivation as fold.fold_key: one-way
        # is_leaf/retired transitions + monotonic seq ⇒ no pool, no sort)
        leaves = [n for n in leaves if n.is_leaf and not n.retired] + [
            n for n in created[n_created_before:] if n.is_leaf and not n.retired
        ]

    segments = rows_from_nodes(
        repo, path, sorted(touched.values(), key=lambda n: n.seq), geom_type
    )
    return SliceResult(segments, relations, partials, metas, initial_seqs)


def fold_coord(
    repo: str,
    path: str,
    events: list[dict],
    ext_partials: dict[str, tuple[list[int], bool]],
    geom_type: str = G.LINE,
) -> SliceResult:
    """Phase 2: fold the edition / ``mu`` lineage for one key.

    Starts with no leaves (state leaves all live in slices); per round it
    creates the edition node, intersects its OWN lineage leaves (editions and
    mu nodes from earlier rounds of this epoch), and computes ``mu`` from the
    union of its own intersections and every slice's reported partial."""
    leaves: list[_Node] = []
    next_seq = 0
    created: list[_Node] = []
    touched: dict[str, _Node] = {}
    relations: list[dict] = []
    metas: list[dict] = []

    _gid = gid_factory(repo, path)

    def _new(name, ids, editions, commit, parent_name, kind, extras=None) -> _Node:
        nonlocal next_seq
        node = _Node(
            seq=next_seq, gid=_gid(name), name=name,
            ids=ids, editions=editions, commit_created=commit, extras=extras or {},
        )
        next_seq += 1
        created.append(node)
        touched[node.gid] = node
        metas.append({"name": name, "kind": kind, "commit": commit, "parent_name": parent_name})
        return node

    def _link(parent: _Node, child: _Node) -> None:
        relations.append(
            {"repo": repo, "path": path, "parent_gid": parent.gid, "child_gid": child.gid}
        )
        if parent.is_leaf:
            parent.is_leaf = False
            parent.dirty = True
            touched[parent.gid] = parent

    for ev in dedup_events(events):
        n_created_before = len(created)
        commit = ev["commit"]
        content = ev.get("content") or ""
        extras = {
            k: v for k, v in ev.items() if k not in ("repo", "path", "commit", "content")
        }
        if content.strip() == "":
            for leaf in leaves:
                leaf.retired = True
                leaf.dirty = True
                touched[leaf.gid] = leaf
            leaves = []
            continue

        e_ids = G.parse_wkt(content, geom_type)
        e_node = _new(commit, e_ids, tuple(edition_years(commit)), commit, None, "e", extras)

        own_unions: list[np.ndarray] = []
        for leaf in leaves:
            i_ids = G.intersect(leaf.ids, e_ids)
            if G.is_multi(i_ids):
                i_name = "i_" + md5_hex(f"i_{leaf.name}_{e_node.name}")
                i_node = _new(
                    i_name, i_ids,
                    tuple(dict.fromkeys(leaf.editions + e_node.editions)),
                    commit, leaf.name, "i",
                )
                _link(leaf, i_node)
                _link(e_node, i_node)
                own_unions.append(i_ids)
                m_ids = G.difference(leaf.ids, i_ids)
                if G.is_multi(m_ids):
                    m_name = "m_" + md5_hex(f"m_{leaf.name}_{i_node.name}")
                    m_node = _new(m_name, m_ids, leaf.editions, commit, leaf.name, "m")
                    _link(leaf, m_node)

        ext_ids, ext_any = ext_partials.get(commit, ([], False))
        any_i = bool(own_unions) or ext_any
        if any_i:
            if e_node.is_leaf:  # external slices' I nodes are its children too
                e_node.is_leaf = False
            subtrahend = G.union_all(
                own_unions + ([np.asarray(ext_ids, dtype=np.int64)] if len(ext_ids) else [])
            )
            r_ids = G.difference(e_ids, subtrahend)
            if G.is_multi(r_ids):
                mu_name = "mu_" + md5_hex(f"mu_{e_node.name}_UL")
                mu_node = _new(mu_name, r_ids, e_node.editions, commit, None, "mu")
                _link(e_node, mu_node)

        # incremental next-leaves (same derivation as fold.fold_key)
        leaves = [n for n in leaves if n.is_leaf and not n.retired] + [
            n for n in created[n_created_before:] if n.is_leaf and not n.retired
        ]

    segments = rows_from_nodes(
        repo, path, sorted(touched.values(), key=lambda n: n.seq), geom_type
    )
    return SliceResult(segments, relations, [], metas, {})


_KIND_RANK = {"i": 0, "m": 1}


def renumber(initial_seqs: dict[str, int], metas: list[dict]) -> dict[str, int]:
    """Replay the sequential fold's seq assignment from creation metadata
    alone: per commit round — edition first, then I/M pairs ordered by their
    parent leaf's (already final) seq with I before M, then mu."""
    seqmap = dict(initial_seqs)
    nxt = max(seqmap.values(), default=-1) + 1
    by_commit: dict[str, list[dict]] = {}
    for m in metas:
        by_commit.setdefault(m["commit"], []).append(m)
    for commit in sorted(by_commit):
        ms = by_commit[commit]
        for m in ms:
            if m["kind"] == "e":
                seqmap[m["name"]] = nxt
                nxt += 1
        ims = [m for m in ms if m["kind"] in _KIND_RANK]
        ims.sort(key=lambda m: (seqmap[m["parent_name"]], _KIND_RANK[m["kind"]]))
        for m in ims:
            seqmap[m["name"]] = nxt
            nxt += 1
        for m in ms:
            if m["kind"] == "mu":
                seqmap[m["name"]] = nxt
                nxt += 1
    return seqmap


def merge_partials(slice_partials: list[list[dict]]) -> dict[str, tuple[list[int], bool]]:
    """Union per-round partials across slices (union is associative, so
    slice order is irrelevant)."""
    merged: dict[str, tuple[list[int], bool]] = {}
    for partials in slice_partials:
        for p in partials:
            ids, any_i = merged.get(p["commit"], ([], False))
            if p["any_i"]:
                u = G.union_all(
                    [np.asarray(ids, dtype=np.int64), np.asarray(p["ids"], dtype=np.int64)]
                )
                merged[p["commit"]] = ([int(x) for x in u], True)
            elif p["commit"] not in merged:
                merged[p["commit"]] = (ids, any_i)
    return merged


def combine(
    slice_results: list[SliceResult], coord: SliceResult
) -> tuple[list[dict], list[dict]]:
    """Phase 3: patch provisional seqs with the renumber map and concatenate
    slice + coordinator output."""
    initial: dict[str, int] = {}
    metas: list[dict] = []
    for sr in slice_results:
        initial.update(sr.initial_seqs)
        metas.extend(sr.metas)
    metas.extend(coord.metas)
    seqmap = renumber(initial, metas)
    segments: list[dict] = []
    for sr in [*slice_results, coord]:
        for row in sr.segments:
            row = dict(row)
            row["seq"] = seqmap[row["name"]]
            segments.append(row)
    segments.sort(key=lambda r: r["seq"])
    relations = [r for sr in [*slice_results, coord] for r in sr.relations]
    return segments, relations


def fold_key_salted(
    repo: str,
    path: str,
    events: list[dict],
    leaves_in: list[dict],
    n_salts: int = 4,
    geom_type: str = G.LINE,
) -> FoldResult:
    """In-process composition of the three phases — the executable spec the
    Spark wiring follows, property-tested bit-equal to ``fold_key``."""
    slices: list[list[dict]] = [[] for _ in range(n_salts)]
    for r in leaves_in:
        slices[int(r["seq"]) % n_salts].append(r)
    slice_results = [
        fold_slice(repo, path, events, s, geom_type) for s in slices
    ]
    ext = merge_partials([sr.partials for sr in slice_results])
    coord = fold_coord(repo, path, events, ext, geom_type)
    segments, relations = combine(slice_results, coord)
    return FoldResult(
        segments=segments,
        relations=relations,
        n_events=len(events),
        n_nodes_created=sum(len(sr.metas) for sr in slice_results) + len(coord.metas),
    )

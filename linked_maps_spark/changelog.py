"""Deterministic synthetic change-log (WAL) generator — FIXTURES.md §1/§2.

Shape is exactly the ``input_hint`` of BASELINE.json:

    change_log(repo: string, path: string, commit: string,
               lang: string, content: string)

One row = one change event for entity key ``(repo, path)``; ``commit`` is the
monotone edition label (the reference's year-named shapefile stem,
main.py:144/66-67 — so labels look like ``1950c`` and carry the year in their
first four characters); ``content`` is the WKT of a grid-aligned edition
geometry (geometry.py).  A later commit with different geometry is a *modify*,
``content = ''`` is a *retire* tombstone.

Everything is a pure function of ``(seed, shape params)`` — no wall clock, no
unseeded RNG (the reference's nondeterminism at generate_graph.py:48 and
linked_maps_to_osm.py:107 is deliberately not reproduced).

Skew: repos are assigned by a Zipf-like weight so a few "dense urban sheet"
repos hold a large share of keys/events (exercises salting + AQE paths).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import geometry as G

CHANGE_LOG_SCHEMA = "repo string, path string, commit string, lang string, content string"


def _rng(seed: int, *streams: int) -> np.random.Generator:
    return np.random.default_rng([seed, *streams])


def _random_walk_ids(rng: np.random.Generator, grid: int, n_walks: int, walk_len: int) -> np.ndarray:
    """A seeded multiline on the grid: n short runs of unit steps."""
    ids = []
    for _ in range(n_walks):
        x = int(rng.integers(walk_len + 1, grid - walk_len - 1))
        y = int(rng.integers(walk_len + 1, grid - walk_len - 1))
        ux, uy = G._DIRS[int(rng.integers(0, len(G._DIRS)))]
        k = np.arange(walk_len, dtype=np.int64)
        p = (x + k * ux).astype(np.int64) * G._P + (y + k * uy)
        q = (x + (k + 1) * ux).astype(np.int64) * G._P + (y + (k + 1) * uy)
        ids.append(np.minimum(p, q) * G._E + np.maximum(p, q))
    return np.unique(np.concatenate(ids))


def _random_cells(rng: np.random.Generator, grid: int, n_rects: int, max_side: int) -> np.ndarray:
    cells = []
    for _ in range(n_rects):
        w = int(rng.integers(1, max_side + 1))
        h = int(rng.integers(1, max_side + 1))
        x = int(rng.integers(0, grid - w))
        y = int(rng.integers(0, grid - h))
        gx, gy = np.meshgrid(np.arange(x, x + w, dtype=np.int64), np.arange(y, y + h, dtype=np.int64))
        cells.append(gx.ravel() * G._P + gy.ravel())
    return np.unique(np.concatenate(cells))


def _mutate(rng: np.random.Generator, ids: np.ndarray, fresh: np.ndarray, keep: float = 0.7) -> np.ndarray:
    """Per-commit edition mutation: keep a seeded subset, add fresh features."""
    mask = rng.random(ids.size) < keep
    return np.unique(np.concatenate([ids[mask], fresh]))


def _zipf_weights(n: int, s: float = 1.2) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** s
    return w / w.sum()


def commit_label(epoch: int) -> str:
    """Edition label: year-style, no '_', first 4 chars = year (main.py:66-67)."""
    return f"{1950 + epoch:04d}c"


def synth_change_log(
    n_keys: int = 100,
    n_commits: int = 5,
    seed: int = 7,
    geom_type: str = G.LINE,
    grid: int = 60,
    n_walks: int = 6,
    walk_len: int = 8,
    n_repos: int = 8,
    zipf_s: float = 1.2,
    tombstone_every: int = 0,
    attrs_from_epoch: int | None = None,
) -> pd.DataFrame:
    """Generate the WAL as a pandas frame (callers lift it into Spark).

    ``tombstone_every``: every k-th key gets a retire tombstone mid-history.
    ``attrs_from_epoch``: if set, rows with epoch ≥ value carry an extra
    ``attrs`` string column (the schema-evolution fixture, FIXTURES.md §6).
    """
    weights = _zipf_weights(n_repos, zipf_s)
    repo_of_key = _rng(seed, 0).choice(n_repos, size=n_keys, p=weights)
    rows: list[dict] = []
    for k in range(n_keys):
        repo = f"region_{int(repo_of_key[k]):03d}"
        fc = "railroads" if geom_type == G.LINE else "wetlands"
        path = f"{fc}/{k:04d}"
        rng = _rng(seed, 1, k)
        if geom_type == G.LINE:
            ids = _random_walk_ids(rng, grid, n_walks, walk_len)
        else:
            ids = _random_cells(rng, grid, n_walks, walk_len)
        tomb_at = (n_commits // 2) if (tombstone_every and k % tombstone_every == 0) else -1
        for e in range(n_commits):
            commit = commit_label(e)
            if e > 0:
                fresh = (
                    _random_walk_ids(rng, grid, max(1, n_walks // 3), walk_len)
                    if geom_type == G.LINE
                    else _random_cells(rng, grid, max(1, n_walks // 3), walk_len)
                )
                ids = _mutate(rng, ids, fresh)
            content = "" if e == tomb_at else G.to_wkt(ids, geom_type)
            row = {
                "repo": repo,
                "path": path,
                "commit": commit,
                "lang": "wkt",
                "content": content,
            }
            if attrs_from_epoch is not None and e >= attrs_from_epoch:
                row["attrs"] = f"rev={e}"
            rows.append(row)
    df = pd.DataFrame(rows)
    if attrs_from_epoch is not None:
        df["attrs"] = df.get("attrs")
    return df


def to_spark(spark, pdf: pd.DataFrame):
    schema = CHANGE_LOG_SCHEMA + (", attrs string" if "attrs" in pdf.columns else "")
    return spark.createDataFrame(pdf, schema=schema)

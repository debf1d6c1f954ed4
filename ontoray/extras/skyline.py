"""Pareto-skyline operator (2-D maximize/maximize, exact integers).

The skyline (Börzsönyi et al. 2001) of a set of points keeps every point no
other point dominates (>= on both axes, > on at least one) — the "best
trade-offs" query (spend vs frequency, quality vs length, ...).

Scale shape: skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B)), so each
batch computes its LOCAL skyline (sort + linear walk) and only those
survivors — typically O(sqrt(n)) of a random batch — reach the driver for
the final merge.  The corpus never shuffles; the reduction is the same
local-prune + tiny-global-merge pattern as the ANN top-k.

Tie contract (mirrored exactly by the SQL NOT EXISTS form): points equal on
BOTH axes do not dominate each other — all rows carrying a skyline (x, y)
pair are kept.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _skyline_mask(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean mask of non-dominated points (maximize both)."""
    n = len(x)
    if n == 0:
        return np.zeros(0, dtype=bool)
    # Sort by x desc, then y desc.  A point is dominated iff some point with
    # strictly greater x has y >= its y, or an equal-x point has strictly
    # greater y.  Walking in sorted order: track best y among strictly
    # greater x (per distinct x prefix) — within an x-group only the group
    # max-y survives (plus its ties), and only if it beats that running best.
    order = np.lexsort((-y, -x))
    xs, ys = x[order], y[order]
    keep = np.zeros(n, dtype=bool)
    best_y = -np.inf          # max y among points with strictly greater x
    i = 0
    while i < n:
        j = i
        while j < n and xs[j] == xs[i]:
            j += 1
        gmax = ys[i]          # first in group = max y (sorted desc)
        # keep needs gmax STRICTLY above the best y at greater x: an equal y
        # there dominates via its greater x.  Within the group only the
        # max-y rows survive (equal-on-both-axes ties all kept).
        if gmax > best_y:
            keep[order[i:j]] = ys[i:j] == gmax
            best_y = gmax
        i = j
    return keep


def skyline(ds, key_col: str, x_col: str, y_col: str):
    """(key, x, y) rows forming the exact 2-D max/max skyline of ``ds``."""

    def local(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        m = _skyline_mask(x, y)
        pam = pa.array(m)
        return pa.table({key_col: batch.column(key_col).filter(pam),
                         x_col: batch.column(x_col).filter(pam),
                         y_col: batch.column(y_col).filter(pam)})

    cand = ds.map_batches(local, batch_format="pyarrow").take_all()
    if not cand:
        return pa.table({key_col: pa.array([], pa.int64()),
                         x_col: pa.array([], pa.int64()),
                         y_col: pa.array([], pa.int64())})
    x = np.array([r[x_col] for r in cand], dtype=np.int64)
    y = np.array([r[y_col] for r in cand], dtype=np.int64)
    m = _skyline_mask(x, y)
    return pa.table({
        key_col: pa.array([r[key_col] for i, r in enumerate(cand) if m[i]],
                          pa.int64()),
        x_col: pa.array(x[m], pa.int64()),
        y_col: pa.array(y[m], pa.int64()),
    })

"""Margin audits for the cross-engine differential oracles that rank by
floating-point scores.

The Spark side of the ANN/k-means gates computes cosines with numpy (BLAS
summation order), the SQL oracle with a sequential fold — the two can
differ by ~1e-15 relative (ulp noise). The gates only stay deterministic
if no ranking decision sits inside that noise band. These tests MEASURE
the decision margins on the gate datasets and assert they are orders of
magnitude above ulp noise, turning "empirically matched twice" into an
audited property. If a regenerated dataset ever reds a gate, run these
first: a collapsed margin here explains the mismatch as oracle
data-dependence, not an engine bug.
"""

from __future__ import annotations

import glob

import numpy as np
import pyarrow.parquet as pq
import pytest

MARGIN_FLOOR = 1e-9          # >> 1e-15 ulp noise, << real data gaps
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]


def _embeddings(sf_dir):
    f = glob.glob(f"{sf_dir}/embeddings.parquet")[0]
    t = pq.read_table(f).to_pydict()
    ids = np.asarray(t["vec_id"], dtype=np.int64)
    V = np.asarray([list(v) for v in t["embedding"]], dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], V[order]


def _kmeans_centroids(ids, V, n_lists, iters):
    """Reference reimplementation of similarity.kmeans_refine's arithmetic
    (stride seeds, argmax-cosine assignment, floor(x*2^24) fixed-point
    means, carry-over) — numpy-only so the audit is independent of Spark."""
    stride = max(1, len(ids) // n_lists)
    seed_idx = [i for i, v in enumerate(ids) if v % stride == 0][:n_lists]
    cent = {int(ids[i]): V[i].copy() for i in seed_idx}
    for _ in range(iters):
        ks = sorted(cent)
        C = np.asarray([cent[k] for k in ks])
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        S = (V / np.linalg.norm(V, axis=1, keepdims=True)) @ Cn.T
        assign = np.argmax(S, axis=1)          # stable: first max wins
        for j, k in enumerate(ks):
            members = V[assign == j]
            if len(members):
                q = np.floor(members * 16777216.0).astype(np.int64)
                cent[k] = q.sum(axis=0) / (len(members) * 16777216.0)
    ks = sorted(cent)
    return np.asarray([cent[k] for k in ks])


def _top2_gap(V, C):
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    S = (V / np.linalg.norm(V, axis=1, keepdims=True)) @ Cn.T
    S.sort(axis=1)
    return float(np.min(S[:, -1] - S[:, -2]))


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("n_lists,iters", [(16, 0), (16, 2), (8, 2)])
def test_centroid_assignment_margins(sf_dir, n_lists, iters):
    """Every vector's best-vs-second-best centroid cosine gap must clear
    MARGIN_FLOOR for the seeded (iters=0) and refined configurations the
    gates use (embed_ivf_topk 16/0, embed_ivf_kmeans_topk 16/2,
    semantic_dedup 8/2)."""
    ids, V = _embeddings(sf_dir)
    C = _kmeans_centroids(ids, V, n_lists, iters)
    gap = _top2_gap(V, C)
    assert gap > MARGIN_FLOOR, (
        f"argmax margin {gap:.3e} within float-noise band — the "
        f"{n_lists}/{iters} assignment oracle is data-fragile here")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_lsh_projection_sign_margins(sf_dir):
    """embed_lsh_topk's oracle claims the >=0 projection sign is
    summation-order-stable; audit: the smallest |projection| over every
    (vector, hyperplane) pair must clear MARGIN_FLOOR."""
    from bqetl_spark.functions.similarity import _hyperplane

    _ids, V = _embeddings(sf_dir)
    planes = np.asarray([_hyperplane(64, t, b)
                         for t in range(8) for b in range(6)])
    m = float(np.min(np.abs(V @ planes.T)))
    assert m > MARGIN_FLOOR, f"LSH sign margin {m:.3e} in the noise band"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_topk_rank_margins(sf_dir):
    """The rank orderings the ANN/brute-force gates hash-check: for the 10
    gate query vectors, adjacent top-6 neighbor scores must differ by more
    than MARGIN_FLOOR unless exactly tied (ties are broken by neighbor_id
    identically in both engines, so exact ties are safe)."""
    ids, V = _embeddings(sf_dir)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn[:10] @ Vn.T
    np.fill_diagonal(S[:, :10], -np.inf)       # self-match excluded
    S.sort(axis=1)
    top = S[:, -6:]
    diffs = np.diff(top, axis=1).ravel()
    risky = diffs[(diffs != 0.0) & (diffs < MARGIN_FLOOR)]
    assert risky.size == 0, (
        f"{risky.size} near-tie score gaps below {MARGIN_FLOOR:.0e}")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_robust_outliers_cents_round_margins(sf_dir):
    """robust_outliers (r8) integerizes events.value with
    CAST(round(value*100) AS BIGINT), NEAREST integer. This audit is
    what rejected the first (floor) formulation: cent-like doubles put
    value*100 within ~1e-15 of integer boundaries, so floor's decision
    lived in the float-noise band. Round-to-nearest's decision boundary
    is the HALF-integer; audit: every product must clear it by far more
    than the multiply's error (~1e-13 at this magnitude) — which also
    proves no engine tie convention (HALF_UP vs half-even vs
    away-from-zero) can ever matter on this data."""
    f = glob.glob(f"{sf_dir}/events.parquet")[0]
    vals = pq.read_table(f, columns=["value"]).column("value").to_numpy()
    vals = vals[~np.isnan(vals)]
    p = vals * 100.0
    frac = p - np.floor(p)
    m = float(np.min(np.abs(frac - 0.5)))
    assert m > 1e-6, (
        f"round(value*100) margin {m:.3e} from the half-integer "
        "boundary — the cents integerization is data-fragile here")

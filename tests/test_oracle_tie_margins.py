"""Tie-margin guarantee for the fitted-literal / distance oracles.

The engine computes squared distances and cosines with numpy (pairwise /
SIMD summation: ``np.einsum`` in models.py / similarity.py) while the
DuckDB oracles fold sequentially (``list_sum`` / ``list_cosine_similarity``).
Both operate on identical float64 inputs, so results agree to ~n*ulp
(measured < 2e-15 absolute here) — but an argmin / top-k decision sitting
on a near-tie tighter than that could flip between engine and oracle and
turn a parity row flaky (round-2 advisory).

These tests prove the decision margins in the sf0.01 oracle data are
8-11 orders of magnitude wider than the summation-order error, so every
argmin (kmeans assignment), top-n_probe routing (IVF), and cosine top-k
ordering (knn_*) is the SAME under any summation order.  If a fixture or
fit change ever lands a near-tie, this fails loudly instead of the driver
board going intermittently red.

Pure numpy over the parquet files — no SparkSession needed.
"""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from dagli_spark.oracle_literals import (
    IVF_CENTERS,
    KMEANS_CENTERS,
    ORACLE_SF_DIR,
)

# measured fold-vs-einsum divergence is < 2e-15 absolute (64 dims); demand
# decision margins at least a million times wider
DIST_REL_GAP = 1e-9
COS_ABS_GAP = 1e-9


@pytest.fixture(scope="module")
def corpus():
    path = os.path.join(ORACLE_SF_DIR, "embeddings.parquet")
    if not os.path.isdir(ORACLE_SF_DIR) and not os.path.exists(path):
        pytest.skip(f"{ORACLE_SF_DIR} not present")
    df = pq.read_table(path).to_pandas()
    emb = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return df["vec_id"].to_numpy(), emb


def _sq_dists(emb, centers):
    c = np.asarray(centers, dtype=np.float64)
    diff = emb[:, None, :] - c[None, :, :]
    return np.einsum("nkd,nkd->nk", diff, diff)


def _fold_dists(emb, centers):
    """Sequential per-dimension accumulation — DuckDB list_sum order."""
    c = np.asarray(centers, dtype=np.float64)
    acc = np.zeros((emb.shape[0], c.shape[0]))
    for d in range(emb.shape[1]):
        dd = emb[:, d : d + 1] - c[None, :, d]
        acc += dd * dd
    return acc


def _min_adjacent_rel_gap(dists, topn):
    s = np.sort(dists, axis=1)
    gaps = np.diff(s[:, : topn + 1], axis=1)
    return (gaps / np.maximum(s[:, :topn], 1e-300)).min()


def test_kmeans_assignment_margin(corpus):
    _, emb = corpus
    d = _sq_dists(emb, KMEANS_CENTERS)
    assert _min_adjacent_rel_gap(d, 1) > DIST_REL_GAP


def test_ivf_routing_margin(corpus):
    # knn_ivf routes to the top-3 of 8 lists and assigns by argmin: the
    # orderings at positions 1|2, 2|3, 3|4 (and 4|5 for safety) must all
    # have healthy margins
    _, emb = corpus
    d = _sq_dists(emb, IVF_CENTERS)
    assert _min_adjacent_rel_gap(d, 4) > DIST_REL_GAP


def test_fold_order_cannot_flip_decisions(corpus):
    """Direct check: the oracle's summation order reaches the exact same
    argmin and probe routing as the engine's einsum."""
    _, emb = corpus
    for centers, topn in ((KMEANS_CENTERS, 1), (IVF_CENTERS, 3)):
        de = _sq_dists(emb, centers)
        df_ = _fold_dists(emb, centers)
        assert np.abs(de - df_).max() < 1e-12
        assert (de.argmin(axis=1) == df_.argmin(axis=1)).all()
        order_e = np.argsort(de, axis=1, kind="stable")[:, :topn]
        order_f = np.argsort(df_, axis=1, kind="stable")[:, :topn]
        assert (order_e == order_f).all()


def test_knn_cosine_ordering_margin(corpus):
    """Every knn_* query probes vec_id < 10 with k=3 and breaks ties by
    neighbor_id.  A rank flip needs two DISTINCT neighbors within the
    cross-engine cosine error (~1e-15); the tightest adjacent gap in any
    probe's full corpus ordering is > 1e-7, so no candidate subset
    (brute-force, LSH bucket, or IVF list) can reorder."""
    ids, emb = corpus
    probes = emb[ids < 10]
    pid = ids[ids < 10]
    n_emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    n_pr = probes / np.linalg.norm(probes, axis=1, keepdims=True)
    cos = n_pr @ n_emb.T
    min_gap = np.inf
    for i in range(cos.shape[0]):
        row = cos[i][ids != pid[i]]
        row.sort()
        min_gap = min(min_gap, np.diff(row).min())
    assert min_gap > COS_ABS_GAP

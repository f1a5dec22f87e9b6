import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from simvg_tpu.ops import hungarian_assign


def _total(cost, rows, cols):
    return float(cost[rows, cols].sum())


def test_square_matches_scipy_cost():
    rng = np.random.default_rng(0)
    for n in [1, 2, 3, 5, 8, 10, 16]:
        for _ in range(10):
            cost = rng.uniform(-5, 5, (n, n)).astype(np.float32)
            col4row, row4col = jax.jit(hungarian_assign)(jnp.asarray(cost))
            col4row = np.asarray(col4row)
            assert (col4row >= 0).all()
            assert sorted(col4row.tolist()) == list(range(n))
            r, c = linear_sum_assignment(cost)
            ours = _total(cost, np.arange(n), col4row)
            theirs = _total(cost, r, c)
            np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-4)


def test_rectangular_more_rows():
    """Q queries > T targets: every target matched, extra rows unmatched."""
    rng = np.random.default_rng(1)
    for q, t in [(10, 1), (10, 4), (5, 5), (3, 1), (1, 1)]:
        for _ in range(10):
            cost = rng.uniform(0, 10, (q, t)).astype(np.float32)
            col4row, row4col = hungarian_assign(jnp.asarray(cost))
            col4row = np.asarray(col4row)
            matched = col4row >= 0
            assert matched.sum() == t
            assert sorted(col4row[matched].tolist()) == list(range(t))
            r, c = linear_sum_assignment(cost)
            ours = cost[np.arange(q)[matched], col4row[matched]].sum()
            np.testing.assert_allclose(ours, cost[r, c].sum(), rtol=1e-5,
                                       atol=1e-4)


def test_column_validity_mask():
    """Invalid (padded) targets are never matched; valid ones all are."""
    rng = np.random.default_rng(2)
    q, t = 10, 6
    for n_valid in [0, 1, 3, 6]:
        cost = rng.uniform(0, 10, (q, t)).astype(np.float32)
        valid = np.zeros(t, bool)
        valid[:n_valid] = True
        col4row, _ = hungarian_assign(jnp.asarray(cost), jnp.asarray(valid))
        col4row = np.asarray(col4row)
        matched = col4row >= 0
        assert matched.sum() == n_valid
        if n_valid:
            assert sorted(col4row[matched].tolist()) == list(range(n_valid))
            r, c = linear_sum_assignment(cost[:, :n_valid])
            ours = cost[np.arange(q)[matched], col4row[matched]].sum()
            np.testing.assert_allclose(ours, cost[r, c].sum(), rtol=1e-5,
                                       atol=1e-4)


def test_vmap_batch():
    rng = np.random.default_rng(3)
    costs = rng.uniform(0, 1, (8, 10, 10)).astype(np.float32)
    col4row, _ = jax.vmap(hungarian_assign)(jnp.asarray(costs))
    col4row = np.asarray(col4row)
    for b in range(8):
        r, c = linear_sum_assignment(costs[b])
        ours = costs[b][np.arange(10), col4row[b]].sum()
        np.testing.assert_allclose(ours, costs[b][r, c].sum(), rtol=1e-5,
                                   atol=1e-4)


def test_adversarial_ties_and_duplicates():
    cost = np.zeros((4, 4), np.float32)  # all ties
    col4row, _ = hungarian_assign(jnp.asarray(cost))
    assert sorted(np.asarray(col4row).tolist()) == [0, 1, 2, 3]

    cost = np.asarray(
        [[1.0, 1.0, 1.0], [1.0, 1.0, 1.0], [0.0, 0.0, 5.0]], np.float32
    )
    col4row, _ = hungarian_assign(jnp.asarray(cost))
    r, c = linear_sum_assignment(cost)
    ours = cost[np.arange(3), np.asarray(col4row)].sum()
    np.testing.assert_allclose(ours, cost[r, c].sum(), atol=1e-5)

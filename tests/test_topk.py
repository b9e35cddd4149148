"""Tests for the differentiable top-k and hard top-k selection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visionselector_tpu.kernels.topk import (
    _find_ts,
    hard_topk_indices,
    hard_topk_mask,
    soft_topk,
)


class TestSoftTopK:
    def test_mass_sums_to_k(self):
        rng = np.random.RandomState(0)
        xs = jnp.asarray(rng.randn(3, 50) * 4)
        for k in [1, 5, 25, 49]:
            ps = soft_topk(xs, k)
            np.testing.assert_allclose(np.asarray(ps.sum(1)), k, rtol=1e-5)

    def test_mask_orders_by_score(self):
        xs = jnp.asarray([[0.0, 10.0, -10.0, 5.0]])
        ps = np.asarray(soft_topk(xs, 2))[0]
        assert ps[1] > ps[3] > ps[0] > ps[2]
        assert ps[1] > 0.9 and ps[2] < 0.1

    def test_gradient_matches_finite_differences(self):
        rng = np.random.RandomState(1)
        xs = rng.randn(2, 12).astype(np.float32)
        k = 4
        cot = rng.randn(2, 12).astype(np.float32)

        f = lambda x: jnp.vdot(soft_topk(x, k), cot)
        grad = np.asarray(jax.grad(f)(jnp.asarray(xs)))

        eps = 1e-3
        fd = np.zeros_like(xs)
        for i in range(2):
            for j in range(12):
                xp, xm = xs.copy(), xs.copy()
                xp[i, j] += eps
                xm[i, j] -= eps
                fd[i, j] = (float(f(jnp.asarray(xp))) - float(f(jnp.asarray(xm)))) / (
                    2 * eps
                )
        np.testing.assert_allclose(grad, fd, atol=5e-3)

    def test_analytic_jacobian_structure(self):
        """J = -vv^T/s + diag(v) with v = sigmoid'(x+t): check one full row."""
        xs = jnp.asarray(np.random.RandomState(2).randn(1, 8).astype(np.float32))
        k = 3
        ts = _find_ts(xs, k)
        sig = jax.nn.sigmoid(xs + ts)
        v = np.asarray(sig * (1 - sig))[0]
        s = v.sum()
        expected_jac = -np.outer(v, v) / s + np.diag(v)
        jac = np.asarray(
            jax.jacrev(lambda x: soft_topk(x, k)[0])(xs)[:, 0, :]
        )
        np.testing.assert_allclose(jac, expected_jac, atol=1e-5)

    def test_jit_and_grad_under_jit(self):
        xs = jnp.asarray(np.random.RandomState(3).randn(2, 20))
        f = jax.jit(lambda x: soft_topk(x, 5).sum())
        g = jax.jit(jax.grad(lambda x: (soft_topk(x, 5) ** 2).sum()))
        assert np.isfinite(float(f(xs)))
        assert np.isfinite(np.asarray(g(xs))).all()


class TestHardTopK:
    def test_sorted_ascending_golden(self):
        scores = jnp.asarray([0.1, 0.9, 0.5, 0.7, 0.3, 0.8])
        idx, valid = hard_topk_indices(scores, 3, 3)
        np.testing.assert_array_equal(np.asarray(idx), [1, 3, 5])
        assert np.asarray(valid).all()

    def test_tie_break_lower_index_first(self):
        """Equal scores at the k-boundary: torch.topk keeps the lower index."""
        scores = jnp.asarray([0.5, 0.5, 0.5, 0.5, 0.1])
        idx, valid = hard_topk_indices(scores, 2, 2)
        np.testing.assert_array_equal(np.asarray(idx), [0, 1])

    def test_static_kmax_with_dynamic_k(self):
        scores = jnp.asarray([0.1, 0.9, 0.5, 0.7, 0.3, 0.8])
        idx, valid = hard_topk_indices(scores, jnp.asarray(2), 4)
        np.testing.assert_array_equal(np.asarray(valid), [True, True, False, False])
        np.testing.assert_array_equal(np.asarray(idx[:2]), [1, 5])
        # sentinel indices sort to the end
        assert (np.asarray(idx[2:]) == 6).all()

    def test_valid_len_excludes_padding(self):
        scores = jnp.asarray([0.1, 0.2, 0.3, 99.0, 99.0])
        idx, valid = hard_topk_indices(scores, 2, 2, valid_len=jnp.asarray(3))
        np.testing.assert_array_equal(np.asarray(idx), [1, 2])

    def test_mask(self):
        scores = jnp.asarray([0.1, 0.9, 0.5, 0.7])
        mask = hard_topk_mask(scores, 2, 2)
        np.testing.assert_array_equal(np.asarray(mask), [0.0, 1.0, 0.0, 1.0])

    def test_matches_numpy_argsort(self):
        rng = np.random.RandomState(7)
        for _ in range(10):
            scores = rng.randn(37).astype(np.float32)
            k = rng.randint(1, 36)
            idx, valid = hard_topk_indices(jnp.asarray(scores), k, k)
            want = np.sort(np.argsort(-scores, kind="stable")[:k])
            np.testing.assert_array_equal(np.asarray(idx), want)

    def test_jit_dynamic_k(self):
        f = jax.jit(lambda s, k: hard_topk_indices(s, k, 8))
        scores = jnp.asarray(np.random.RandomState(9).randn(20))
        for k in [1, 4, 8]:
            idx, valid = f(scores, k)
            assert int(valid.sum()) == k

"""Fused one-hot-matmul gather: exactness + VJP vs native gather."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physically_based_renderer_tpu.ops.gather import take_rows


@pytest.mark.parametrize("t,w", [(36, 8), (64, 52), (513, 16)])
def test_forward_exact(t, w):
    key = jax.random.key(0)
    table = jax.random.normal(key, (t, w), jnp.float32) * 1e3
    idx = jax.random.randint(jax.random.key(1), (1000,), 0, t)
    out = take_rows(table, idx, force="interpret")
    ref = np.asarray(table)[np.asarray(idx)]
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_out_of_range_zeros():
    table = jnp.arange(12.0).reshape(4, 3)
    idx = jnp.array([-1, 0, 3, 4, 100, -7], jnp.int32)
    out = np.asarray(take_rows(table, idx, force="interpret"))
    ref = np.asarray(take_rows(table, idx, force="native"))
    np.testing.assert_array_equal(out, ref)
    assert (out[0] == 0).all() and (out[3] == 0).all()


def test_vjp_matches_native():
    t, w, n = 40, 8, 300
    table = jax.random.normal(jax.random.key(0), (t, w), jnp.float32)
    idx = jax.random.randint(jax.random.key(1), (n,), -2, t)
    wgt = jax.random.normal(jax.random.key(2), (n, w), jnp.float32)

    def loss(tab, force):
        return jnp.sum(take_rows(tab, idx, force=force) * wgt)

    g_p = jax.grad(lambda tab: loss(tab, "interpret"))(table)
    g_n = jax.grad(lambda tab: loss(tab, "native"))(table)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_n),
                               rtol=1e-6, atol=1e-6)

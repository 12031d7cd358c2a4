"""Row gather/scatter kernel tests (die_e_tpu/ops/rows.py).

On CPU these exercise the masked-reduction/where fallbacks; on a TPU
backend (DIE_E_TEST_TPU=1) the pallas DMA kernels run and must agree with
the fallbacks bit-for-bit.
"""

import jax
import jax.numpy as jnp
import numpy as np

from die_e_tpu.ops.rows import (
    _gather_rows_reduce,
    _scatter_rows_where,
    gather_rows,
    pad_actions,
    scatter_rows,
)


def _mk(b=16, n=11, r=8, c=128, seed=0):
    key = jax.random.PRNGKey(seed)
    src = jax.random.normal(key, (b, n, r, c), jnp.float32)
    idx = jax.random.randint(jax.random.fold_in(key, 1), (b,), 0, n, jnp.int32)
    return src, idx


def test_pad_actions():
    assert pad_actions(1352) == 2048
    assert pad_actions(9) == 1024
    assert pad_actions(1024) == 1024
    assert pad_actions(2048) == 2048


def test_gather_rows_matches_indexing():
    src, idx = _mk()
    out = gather_rows(src, idx)
    ref = src[jnp.arange(src.shape[0]), idx]
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_gather_rows_reduce_matches_indexing():
    src, idx = _mk(seed=3)
    out = _gather_rows_reduce(src, idx)
    ref = src[jnp.arange(src.shape[0]), idx]
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_scatter_rows_masked():
    src, idx = _mk(seed=5)
    b = src.shape[0]
    rows = jax.random.normal(jax.random.PRNGKey(9), src[:, 0].shape)
    mask = jnp.arange(b) % 2 == 0
    out = scatter_rows(src, idx, rows, mask)
    ref = _scatter_rows_where(src, idx, rows, mask)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # masked-off games unchanged
    keep = np.asarray(~mask)
    np.testing.assert_array_equal(
        np.asarray(out)[keep], np.asarray(src)[keep]
    )


def test_scatter_then_gather_roundtrip():
    src, idx = _mk(seed=7)
    rows = jnp.full_like(src[:, 0], 0.5)
    mask = jnp.ones((src.shape[0],), bool)
    out = scatter_rows(src, idx, rows, mask)
    back = gather_rows(out, idx)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(rows))

"""Rank-major Pallas segment reduction vs the XLA scatter-add oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wast3d_tpu.ops.rasterizer.grad_reduce import segment_reduce_by_rank


def _oracle(d, ranks, n1):
    out = np.zeros((n1, d.shape[1]), np.float64)
    np.add.at(out, np.asarray(ranks), np.asarray(d, np.float64))
    return out.astype(np.float32)


@pytest.mark.parametrize("k,n1", [(64, 40), (1000, 300), (4096, 513),
                                  (5000, 4000)])
def test_matches_scatter(k, n1):
    rng = np.random.default_rng(k)
    d = rng.normal(size=(k, 10)).astype(np.float32)
    ranks = rng.integers(0, n1, size=k).astype(np.int32)
    got = segment_reduce_by_rank(
        jnp.asarray(d), jnp.asarray(ranks), n1, interpret=True
    )
    want = _oracle(d, ranks, n1)
    # split-bf16 accumulation: ~2^-16 relative.
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_single_giant_segment():
    # One rank receiving every duplicate (screen-filling splat): the ring
    # never flushes until the drain.
    k, n1 = 2000, 100
    d = np.ones((k, 10), np.float32)
    ranks = np.full(k, 7, np.int32)
    got = segment_reduce_by_rank(
        jnp.asarray(d), jnp.asarray(ranks), n1, interpret=True
    )
    want = _oracle(d, ranks, n1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4)


def test_sparse_ranks_with_giant_jumps():
    # Mostly-absent ranks: windows must advance across multi-block jumps
    # inside a single chunk without dropping or double-counting.
    rng = np.random.default_rng(0)
    k, n1 = 512, 100_000
    d = rng.normal(size=(k, 10)).astype(np.float32)
    ranks = np.sort(rng.choice(n1, size=k, replace=False)).astype(np.int32)
    rng.shuffle(ranks)  # unsorted input, like the tile-major stream
    got = segment_reduce_by_rank(
        jnp.asarray(d), jnp.asarray(ranks), n1, interpret=True
    )
    want = _oracle(d, ranks, n1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_boundary_rank_n1_multiple_of_128():
    # n1 exactly a 128 multiple exercises the sentinel bump.
    k, n1 = 300, 256
    rng = np.random.default_rng(1)
    d = rng.normal(size=(k, 10)).astype(np.float32)
    ranks = rng.integers(0, n1, size=k).astype(np.int32)
    got = segment_reduce_by_rank(
        jnp.asarray(d), jnp.asarray(ranks), n1, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), _oracle(d, ranks, n1),
                               rtol=2e-4, atol=2e-4)


def test_gradients_match_scatter_mode_end_to_end():
    # Full pallas render path: grads under grad_reduce="segsum" must match
    # grad_reduce="scatter" (both in interpret mode on CPU).
    from tests.test_train import _mini_scene
    from wast3d_tpu.core.camera import look_at_camera
    from wast3d_tpu.ops.rasterizer import api

    scene = _mini_scene(n=300, cap=512)
    cam = look_at_camera(eye=[0, 0, -4], target=[0, 0, 0], up=[0, -1, 0],
                         fovx=0.9, fovy=0.9, width=64, height=64)
    bg = jnp.zeros(3)

    def loss(xyz, mode):
        s = scene.replace(xyz=xyz)
        st = api.RasterizeSettings(renderer="pallas", pallas_interpret=True,
                                   dup_capacity=1 << 13, grad_reduce=mode)
        out = api.render(cam, s, bg, settings=st)
        return jnp.sum(out["render"] ** 2) + jnp.sum(out["depth"])

    g_scatter = jax.grad(lambda x: loss(x, "scatter"))(scene.xyz)
    g_segsum = jax.grad(lambda x: loss(x, "segsum"))(scene.xyz)
    np.testing.assert_allclose(np.asarray(g_segsum), np.asarray(g_scatter),
                               rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize("k,n1", [(1000, 300), (5000, 700), (4096, 513)])
def test_sortpayload_matches_scatter(k, n1):
    from wast3d_tpu.ops.rasterizer.grad_reduce import (
        segment_reduce_by_rank_sortpayload,
    )

    rng = np.random.default_rng(k + 1)
    d = rng.normal(size=(k, 10)).astype(np.float32)
    ranks = rng.integers(0, n1, size=k).astype(np.int32)
    got = segment_reduce_by_rank_sortpayload(
        jnp.asarray(d), jnp.asarray(ranks), n1, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), _oracle(d, ranks, n1),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("k,n1", [(1000, 300), (5000, 700), (4097, 513)])
def test_sortpacked_matches_scatter(k, n1):
    # Per-duplicate payloads are quantized to bf16 (~2^-9 relative)
    # before the f32 summation; tolerance reflects that bound times the
    # worst-case duplicate count per rank.
    from wast3d_tpu.ops.rasterizer.grad_reduce import (
        segment_reduce_by_rank_sortpacked,
    )

    rng = np.random.default_rng(k + 2)
    d = rng.normal(size=(k, 10)).astype(np.float32)
    ranks = rng.integers(0, n1, size=k).astype(np.int32)
    got = segment_reduce_by_rank_sortpacked(
        jnp.asarray(d), jnp.asarray(ranks), n1, interpret=True
    )
    want = _oracle(d, ranks, n1)
    bf16 = np.asarray(
        jnp.asarray(d).astype(jnp.bfloat16).astype(jnp.float32)
    )
    want_q = _oracle(bf16, ranks, n1)
    # Matches the bf16-quantized oracle tightly...
    np.testing.assert_allclose(np.asarray(got), want_q, rtol=2e-4, atol=2e-4)
    # ...and the f32 oracle within the quantization bound.
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-2, atol=2e-2)

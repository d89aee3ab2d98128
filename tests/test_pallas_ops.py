"""Pallas kernel tests (interpret mode on CPU): sorted segment sum + SAGE
aggregation equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.models.sage import segment_mean_aggregate
from tpufem.ops.gather_scatter import gather_mean_aggregate, sorted_segment_sum_pallas
import pytest


def test_sorted_segment_sum_matches_reference():
    rng = np.random.default_rng(0)
    E, C, N = 1000, 16, 73
    seg = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
    msgs = rng.normal(size=(E, C)).astype(np.float32)
    out = np.asarray(
        sorted_segment_sum_pallas(jnp.asarray(msgs), jnp.asarray(seg), N, True)
    )
    ref = np.zeros((N, C), dtype=np.float64)
    np.add.at(ref, seg, msgs.astype(np.float64))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_sorted_segment_sum_with_gaps_and_padding():
    # segments with large id gaps and rows in the dump segment
    seg = np.array([0, 0, 5, 5, 5, 60, 61, 61], dtype=np.int32)
    msgs = np.arange(8, dtype=np.float32).reshape(-1, 1) + 1
    N = 64
    out = np.asarray(
        sorted_segment_sum_pallas(jnp.asarray(msgs), jnp.asarray(seg), N, True)
    )
    assert out[0, 0] == 3.0  # 1+2
    assert out[5, 0] == 12.0  # 3+4+5
    assert out[60, 0] == 6.0
    assert out[61, 0] == 15.0  # 7+8
    assert out[1:5].sum() == 0 and out[62:].sum() == 0


def test_gather_mean_matches_segment_mean():
    rng = np.random.default_rng(1)
    N, E, C = 50, 400, 8
    h = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
    ei = jnp.asarray(rng.integers(0, N, size=(2, E)).astype(np.int32))
    em = jnp.asarray((rng.uniform(size=E) > 0.2).astype(np.float32))
    ref = np.asarray(segment_mean_aggregate(h, ei, em, N))
    out = np.asarray(gather_mean_aggregate(h, ei, em, N))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_sage_pallas_impl_forward():
    from tpufem.models.sage import GraphSAGE, SAGEConfig

    rng = np.random.default_rng(2)
    N, E = 60, 300
    x = jnp.asarray(rng.normal(size=(N, 10)).astype(np.float32))
    ei = jnp.asarray(rng.integers(0, N, size=(2, E)).astype(np.int32))
    em = jnp.ones(E, dtype=jnp.float32)
    cfg_a = SAGEConfig(hidden=16, encoder_hidden=8, decoder_hidden=8, num_layers=1,
                       aggregate_impl="segment")
    cfg_b = SAGEConfig(hidden=16, encoder_hidden=8, decoder_hidden=8, num_layers=1,
                       aggregate_impl="pallas")
    params = GraphSAGE(cfg_a).init(jax.random.PRNGKey(0), x, ei, em)
    out_a = np.asarray(GraphSAGE(cfg_a).apply(params, x, ei, em))
    out_b = np.asarray(GraphSAGE(cfg_b).apply(params, x, ei, em))
    np.testing.assert_allclose(out_b, out_a, rtol=2e-4, atol=2e-4)

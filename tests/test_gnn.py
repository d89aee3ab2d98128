"""Surrogate tests: graph building, SAGE shapes/gradients, padding equivalence,
masked loss semantics, metric scale handling, checkpoint round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.models.graph import GraphData, build_graph, faces_to_edges, pad_graph
from tpufem.models.metrics import compute_metrics, masked_mse
from tpufem.models.sage import GraphSAGE, SAGEConfig, segment_mean_aggregate
from tpufem.models.train import TrainConfig, Trainer, stack_graphs


def tiny_surface(n=40, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, 1, size=(n, 3))
    return {
        "node_id": np.arange(n, dtype=np.int64),
        "pos": pos.astype(np.float32),
        "normal": np.tile(np.array([0, 0, 1.0], dtype=np.float32), (n, 1)),
        "stress_vm": rng.uniform(1e5, 1e7, size=n).astype(np.float32),
        "disp": rng.normal(size=(n, 3)).astype(np.float32),
        "loss_mask": pos[:, 1] > 0.05,
    }


def tiny_faces(n=40, seed=0):
    rng = np.random.default_rng(seed + 1)
    f = rng.integers(0, n, size=(3 * n, 3))
    f = f[(f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])]
    return f


PARAMS = {"span_m": 1.2, "chord_m": 0.35, "sweep_deg": 15.0, "thickness_ratio": 0.10}


@pytest.fixture
def graph():
    return build_graph(tiny_surface(), tiny_faces(), PARAMS)


def test_faces_to_edges_bidirectional_dedup():
    faces = np.array([[0, 1, 2], [1, 2, 3]])
    e = faces_to_edges(faces, np.arange(4))
    assert e.shape[0] == 2
    # 5 undirected edges -> 10 directed
    assert e.shape[1] == 10
    s = set(map(tuple, e.T))
    assert all((b, a) in s for a, b in s)


def test_graph_features(graph):
    assert graph.x.shape == (40, 10)
    assert graph.x.dtype == np.float32
    # params block constant across nodes and in [0,1]
    p = graph.x[:, 6:]
    assert (p == p[0]).all()
    assert (0 <= p).all() and (p <= 1).all()
    # log1p target
    np.testing.assert_allclose(
        graph.y, np.log1p(graph.stress_vm), rtol=1e-6
    )


@pytest.mark.slow
def test_model_forward_and_grads(graph):
    cfg = SAGEConfig(hidden=32, encoder_hidden=16, decoder_hidden=16, num_layers=2)
    model = GraphSAGE(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(graph.x),
        jnp.asarray(graph.edge_index),
        jnp.asarray(graph.edge_mask),
    )
    pred = model.apply(
        params,
        jnp.asarray(graph.x),
        jnp.asarray(graph.edge_index),
        jnp.asarray(graph.edge_mask),
    )
    assert pred.shape == (graph.num_nodes,)
    assert np.isfinite(np.asarray(pred)).all()

    def loss(p):
        out = model.apply(
            p, jnp.asarray(graph.x), jnp.asarray(graph.edge_index), jnp.asarray(graph.edge_mask)
        )
        return masked_mse(out, jnp.asarray(graph.y), jnp.asarray(graph.loss_mask))

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_padding_equivalence(graph):
    """Padded forward == unpadded forward on real nodes (hard part 3)."""
    cfg = SAGEConfig(hidden=32, encoder_hidden=16, decoder_hidden=16, num_layers=2)
    model = GraphSAGE(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(graph.x),
        jnp.asarray(graph.edge_index),
        jnp.asarray(graph.edge_mask),
    )
    padded = pad_graph(graph, graph.num_nodes + 17, graph.num_edges + 33)
    out_a = model.apply(
        params, jnp.asarray(graph.x), jnp.asarray(graph.edge_index), jnp.asarray(graph.edge_mask)
    )
    out_b = model.apply(
        params, jnp.asarray(padded.x), jnp.asarray(padded.edge_index), jnp.asarray(padded.edge_mask)
    )
    np.testing.assert_allclose(
        np.asarray(out_b)[: graph.num_nodes], np.asarray(out_a), rtol=1e-6, atol=1e-6
    )


def test_segment_mean_aggregate_correct():
    h = jnp.asarray(np.arange(12, dtype=np.float64).reshape(4, 3))
    # edges into node 0 from nodes 1 and 2; node 3 isolated
    ei = jnp.asarray(np.array([[1, 2], [0, 0]], dtype=np.int32))
    em = jnp.ones(2)
    out = segment_mean_aggregate(h, ei, em, 4)
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray((h[1] + h[2]) / 2))
    np.testing.assert_allclose(np.asarray(out)[3], 0.0)


def test_masked_mse_empty_mask():
    p = jnp.ones(5)
    t = jnp.zeros(5)
    assert float(masked_mse(p, t, jnp.zeros(5))) == 0.0
    assert float(masked_mse(p, t, jnp.ones(5))) == pytest.approx(1.0)


def test_metrics_pa_scale(graph):
    # perfect prediction in log space -> zero error in Pa
    m = compute_metrics(graph.y.astype(np.float64), graph.stress_vm, graph.loss_mask)
    # float32 log1p/expm1 round-trip noise at 1e7 Pa is a few Pa — far below
    # the 0.79 MPa MAE target, but not zero.
    assert m["masked_nodes"]["mae_pa"] < 20.0
    assert m["all_nodes"]["rel_mae"] < 1e-5


def test_trainer_overfits_tiny_dataset(tmp_path):
    """Training sanity: loss decreases by >10x overfitting two tiny graphs."""
    raw = [
        build_graph(tiny_surface(seed=s), tiny_faces(seed=s), PARAMS) for s in range(2)
    ]
    n_max = max(g.num_nodes for g in raw)
    e_max = max(g.num_edges for g in raw)
    graphs = [pad_graph(g, n_max, e_max) for g in raw]
    cfg = TrainConfig(
        lr=3e-3,
        batch_size=2,
        max_epochs=60,
        early_stop_patience=60,
        model=SAGEConfig(hidden=32, encoder_hidden=16, decoder_hidden=16, num_layers=2),
    )
    tr = Trainer(cfg)
    summary = tr.fit(graphs, graphs, tmp_path, verbose=False)
    losses = [r["train_loss"] for r in summary["log"]]
    assert losses[-1] < losses[0] / 10


def test_trainer_ema_checkpoints_averaged_params(tmp_path):
    """With ema_decay>0 the best checkpoint holds the EMA iterate (differs
    from the raw params) and training still converges on a tiny overfit."""
    raw = [
        build_graph(tiny_surface(seed=s), tiny_faces(seed=s), PARAMS) for s in range(2)
    ]
    n_max = max(g.num_nodes for g in raw)
    e_max = max(g.num_edges for g in raw)
    graphs = [pad_graph(g, n_max, e_max) for g in raw]
    cfg = TrainConfig(
        lr=3e-3,
        batch_size=2,
        max_epochs=60,
        early_stop_patience=60,
        ema_decay=0.9,
        model=SAGEConfig(hidden=32, encoder_hidden=16, decoder_hidden=16, num_layers=2),
    )
    tr = Trainer(cfg)
    summary = tr.fit(graphs, graphs, tmp_path, verbose=False)
    losses = [r["train_loss"] for r in summary["log"]]
    assert losses[-1] < losses[0] / 10
    # the checkpointed (EMA) params evaluate close to the logged val loss,
    # i.e. model selection really used the averaged iterate
    params, _ = Trainer.load_checkpoint(tmp_path / "best_model.msgpack", graphs[0])
    ev = tr.evaluate(params, graphs)
    assert ev["loss"] <= summary["best_val_loss"] * 1.5 + 1e-9


def test_checkpoint_roundtrip(tmp_path, graph):
    cfg = TrainConfig(
        model=SAGEConfig(hidden=32, encoder_hidden=16, decoder_hidden=16, num_layers=2)
    )
    tr = Trainer(cfg)
    params, _ = tr.init(graph)
    tr.save_checkpoint(tmp_path / "ck.msgpack", params, epoch=3, val_loss=0.5)
    params2, cfg2 = Trainer.load_checkpoint(tmp_path / "ck.msgpack", graph)
    assert cfg2.hidden == 32
    p1 = tr.predict(params, graph)
    p2 = tr.predict(params2, graph)
    np.testing.assert_allclose(p1, p2, atol=1e-7)


def test_stack_graphs_shapes(graph):
    n_pad = graph.num_nodes + 24
    e_pad = graph.num_edges + 100
    padded = [pad_graph(graph, n_pad, e_pad) for _ in range(3)]
    b = stack_graphs(padded)
    assert b.x.shape == (3, n_pad, 10)
    assert b.edge_index.shape == (3, 2, e_pad)

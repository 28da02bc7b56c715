import jax
import numpy as np
import pytest

from depthmap_tpu.parallel.mesh import make_mesh, tree_pspecs
from jax.sharding import PartitionSpec as P


def test_make_mesh_shapes():
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2
    mesh = make_mesh(8)
    assert mesh.shape["data"] == 8


def test_param_pspecs_policy():
    params = {"params": {"block_0": {
        "attn": {"qkv": {"kernel": np.zeros((8, 24)),
                         "bias": np.zeros((24,))},
                 "proj": {"kernel": np.zeros((8, 8))}},
        "mlp": {"fc1": {"kernel": np.zeros((8, 32))},
                "fc2": {"kernel": np.zeros((32, 8))}}}}}
    specs = tree_pspecs(params)
    inner = specs["params"]["block_0"]
    assert inner["attn"]["qkv"]["kernel"] == P(None, "model")
    assert inner["attn"]["proj"]["kernel"] == P("model", None)
    assert inner["mlp"]["fc1"]["kernel"] == P(None, "model")
    assert inner["mlp"]["fc2"]["kernel"] == P("model", None)
    assert inner["attn"]["qkv"]["bias"] == P()


def test_sharded_predict_batch_matches_single(rng):
    """8 virtual devices: batch split on the data axis must match the
    unsharded single-image path."""
    from depthmap_tpu.pipeline.depth import DepthPredictor
    assert len(jax.devices()) == 8
    pred = DepthPredictor(6)
    frames = rng.random((8, 64, 64, 3)).astype(np.float32)
    batch_out = pred.predict_batch(frames, 64, 64)
    single = pred.predict(frames[0], 64, 64)
    assert batch_out.shape == (8, 64, 64)
    np.testing.assert_allclose(batch_out[0], single, atol=5e-3)


def test_predict_batch_stream_matches_predict_batch(rng):
    """The pipelined stream (one chunk in flight) yields bit-identical
    results to serial predict_batch calls — same compiled program, same
    chunk shapes, only the dispatch/download interleaving differs."""
    from depthmap_tpu.pipeline.depth import DepthPredictor
    pred = DepthPredictor(6)
    chunks = [rng.random((2, 64, 64, 3)).astype(np.float32)
              for _ in range(3)]
    streamed = list(pred.predict_batch_stream(iter(chunks), 64, 64))
    assert len(streamed) == 3
    for got, blk in zip(streamed, chunks):
        np.testing.assert_array_equal(got, pred.predict_batch(blk, 64, 64))


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)

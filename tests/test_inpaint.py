import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from depthmap_tpu.pipeline import inpaint_mesh as IM
from depthmap_tpu.pipeline import inpaint_video as IV


def _scene(rng, h=40, w=52):
    img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    depth = np.full((h, w), 4.0, np.float32)
    depth[10:28, 14:36] = 1.5   # foreground box -> sharp discontinuity
    return img, depth


def test_bilateral_filtering_smooths(rng):
    img, depth = _scene(rng)
    noisy = depth + rng.normal(size=depth.shape).astype(np.float32) * 0.01
    _imgs, depths = IM.sparse_bilateral_filtering(
        noisy, img, [7, 7, 5, 5, 5], 0.04, num_iter=5)
    assert len(depths) == 6
    out = depths[-1]
    # interior smoothness improved near the discontinuity, shape preserved
    assert out.shape == depth.shape
    assert np.isfinite(out).all()


def test_build_ldi_and_roundtrip(rng, tmp_path):
    img, depth = _scene(rng)
    int_mtx = np.array([[52, 0, 26], [0, 52, 20], [0, 0, 1]], np.float32)
    int_mtx[0] /= 52
    int_mtx[1] /= 40
    cfg = {"depth_threshold": 0.04, "save_obj": True, "save_ply": True,
           "ply_fmt": "bin"}
    path = str(tmp_path / "mesh.obj")
    IM.write_mesh(img, depth, int_mtx, path, cfg)
    assert os.path.exists(path)
    assert os.path.exists(str(tmp_path / "mesh.ply"))

    verts, colors, faces, H, W, hfov, vfov, mld = IM.read_mesh(path)
    assert H == 40 and W == 52
    assert verts.shape[0] > 40 * 52          # fg + bg layers
    assert faces.max() < verts.shape[0]
    assert (verts[:, 2] <= 0).all()          # z negative (camera forward)
    v2, c2, f2, *_ = IM.read_mesh(str(tmp_path / "mesh.ply"))
    assert v2.shape[0] == verts.shape[0]
    np.testing.assert_allclose(v2[:10], verts[:10], atol=1e-5)


def test_path_planning_shapes():
    xs, ys, zs = IV.path_planning(30, 0.03, 0.01, -0.05,
                                  "double-straight-line")
    assert len(xs) == 30
    xs, ys, zs = IV.path_planning(30, 0.03, 0.01, -0.05, "circle")
    assert len(xs) == 30
    xs, ys, zs = IV.path_planning(30, 0.03, 0.0, 0.0, "straight-line")
    assert abs(xs[-1] - 0.03) < 1e-9


def test_render_and_makevideo(rng, tmp_path):
    img, depth = _scene(rng)
    int_mtx = np.array([[1.0, 0, 0.5], [0, 1.3, 0.5], [0, 0, 1]], np.float32)
    cfg = {"depth_threshold": 0.04, "save_obj": True}
    path = str(tmp_path / "m.obj")
    IM.write_mesh(img, depth, int_mtx, path, cfg)
    out, _, _ = IV.run_makevideo(path, 6, 10, 0, "0.03,0.0,-0.05",
                                 "0.0,0.0,0.0,0.0", False, "mp4", 1,
                                 outpath=str(tmp_path))
    assert os.path.exists(out)


def test_inpaint_nets_forward(rng):
    from depthmap_tpu.models.inpaint_nets import (InpaintColorNet,
                                                  InpaintDepthNet,
                                                  InpaintEdgeNet)
    h = w = 128
    depth = jnp.asarray(rng.random((1, h, w, 1)), dtype=jnp.float32)
    edge = jnp.asarray(rng.random((1, h, w, 1)), dtype=jnp.float32)
    ctx = jnp.ones((1, h, w, 1))
    mask = jnp.zeros((1, h, w, 1))
    dn = InpaintDepthNet()
    v = dn.init(jax.random.PRNGKey(0), depth, edge, ctx, mask)
    out = dn.apply(v, depth, edge, ctx, mask)
    assert out.shape == (1, h, w, 1)

    rgb = jnp.asarray(rng.random((1, h, w, 3)), dtype=jnp.float32)
    cn = InpaintColorNet()
    v = cn.init(jax.random.PRNGKey(0), rgb, edge, ctx, mask)
    out = cn.apply(v, rgb, edge, ctx, mask)
    assert out.shape == (1, h, w, 3)
    assert float(out.min()) >= 0 and float(out.max()) <= 1

    en = InpaintEdgeNet()
    x7 = jnp.concatenate([rgb, depth, edge, ctx, mask], axis=-1)
    v = en.init(jax.random.PRNGKey(0), x7)
    out = en.apply(v, x7)
    assert out.shape == (1, h, w, 1)
    assert float(out.min()) >= 0 and float(out.max()) <= 1


def test_funnel_inpainted_mesh(rng, tmp_path):
    from PIL import Image
    from depthmap_tpu.options import GenerationOptions
    from depthmap_tpu.pipeline.core import core_generation_funnel
    img = Image.fromarray((rng.random((64, 64, 3)) * 255).astype(np.uint8))
    inp = GenerationOptions(model_type=6, net_width=64, net_height=64,
                            gen_inpainted_mesh=True)
    results = list(core_generation_funnel(str(tmp_path), [img], None,
                                          ["thing"], inp))
    types = [t for _, t, _ in results]
    assert "inpainted_mesh" in types
    mesh_fi = [r for _, t, r in results if t == "inpainted_mesh"][0]
    assert os.path.exists(mesh_fi)

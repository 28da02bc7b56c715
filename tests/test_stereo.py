import numpy as np
import jax.numpy as jnp
import pytest

from depthmap_tpu.ops import stereo
from tests import oracles


def _mk(rng, h=24, w=32):
    img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    depth = rng.random((h, w)).astype(np.float64)
    nd = (depth - depth.min()) / (depth.max() - depth.min())
    return img, nd


@pytest.mark.parametrize("div", [2.5, -2.5, 7.0])
@pytest.mark.parametrize("sep", [0.0, 1.0])
@pytest.mark.parametrize("exp", [1.0, 2.0])
def test_warp_none_matches_oracle(rng, div, sep, exp):
    img, nd = _mk(rng)
    div_px = div / 100.0 * img.shape[1]
    sep_px = sep / 100.0 * img.shape[1]
    got = np.asarray(stereo.apply_stereo_divergence_naive(
        jnp.asarray(img), jnp.asarray(nd, dtype=jnp.float32),
        div_px, sep_px, exp, "none"))
    want = oracles.stereo_warp_naive(img, nd, div_px, sep_px, exp, "none")
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("div", [2.5, -4.0, 10.0])
def test_warp_naive_fill_matches_oracle(rng, div):
    img, nd = _mk(rng)
    div_px = div / 100.0 * img.shape[1]
    got = np.asarray(stereo.apply_stereo_divergence_naive(
        jnp.asarray(img), jnp.asarray(nd, dtype=jnp.float32),
        div_px, 0.0, 1.0, "naive"))
    want = oracles.stereo_warp_naive(img, nd, div_px, 0.0, 1.0, "naive")
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("div", [2.5, -4.0, 10.0])
def test_warp_interpolating_fill_matches_oracle(rng, div):
    img, nd = _mk(rng)
    div_px = div / 100.0 * img.shape[1]
    got = np.asarray(stereo.apply_stereo_divergence_naive(
        jnp.asarray(img), jnp.asarray(nd, dtype=jnp.float32),
        div_px, 0.0, 1.0, "naive_interpolating"))
    want = oracles.stereo_warp_naive(img, nd, div_px, 0.0, 1.0,
                                     "naive_interpolating")
    np.testing.assert_array_equal(got, want)


def test_anaglyph(rng):
    a = (rng.random((8, 8, 3)) * 255).astype(np.uint8)
    b = (rng.random((8, 8, 3)) * 255).astype(np.uint8)
    got = np.asarray(stereo.overlap_red_cyan(jnp.asarray(a), jnp.asarray(b)))
    assert (got[..., 0] == a[..., 0]).all()
    assert (got[..., 1] == b[..., 1]).all()
    assert (got[..., 2] == b[..., 2]).all()


def test_create_stereoimages_modes(rng):
    img, nd = _mk(rng, 16, 20)
    depth = (nd * 65535).astype(np.uint16)
    res = stereo.create_stereoimages(
        img, depth, 2.5, modes=["left-right", "top-bottom",
                                "red-cyan-anaglyph", "left-only"],
        fill_technique="naive")
    assert res[0].shape == (16, 40, 3)
    assert res[1].shape == (32, 20, 3)
    assert res[2].shape == (16, 20, 3)
    assert res[3].shape == (16, 20, 3)


def test_balance_extremes(rng):
    img, nd = _mk(rng, 16, 20)
    depth = (nd * 65535).astype(np.uint16)
    # balance=-1 -> left eye is the unmodified image
    res = stereo.create_stereoimages(img, depth, 2.5, modes=["left-only"],
                                     stereo_balance=-1.0,
                                     fill_technique="naive")
    np.testing.assert_array_equal(res[0], img)


@pytest.mark.parametrize("div", [4.0, -6.0])
def test_native_interpolating_fill_exact_adversarial(rng, div):
    """The exact sequential host fill must match the canonical numba-path
    oracle bit-for-bit even on adversarial near-black images, where the
    in-place sweep RE-PROCESSES just-written exact-black pixels (re-entrant
    semantics a single vectorized pass cannot reproduce)."""
    from depthmap_tpu.ops.polylines import fill_naive_interpolating_native
    for trial in range(40):
        h, w = 8, 48
        # tiny channel values make interpolated exact-black pixels likely
        img = (rng.random((h, w, 3)) * 3).astype(np.uint8)
        nd = rng.random((h, w))
        div_px = div / 100.0 * w * 10
        want = oracles.stereo_warp_naive(img, nd, div_px, 0.0, 1.0,
                                         "naive_interpolating")
        derived, filled = stereo._warp_jit(
            jnp.asarray(img), jnp.asarray(nd, jnp.float32),
            float(div_px), 0.0, 1.0)
        got = fill_naive_interpolating_native(np.asarray(derived),
                                              np.asarray(filled))
        if got is None:
            pytest.skip("native lib unavailable")
        np.testing.assert_array_equal(got, want)


def test_host_interpolating_path_fuzz(rng):
    """Public apply_stereo_divergence with naive_interpolating (device warp
    + exact host fill) vs the oracle over random natural images."""
    for trial in range(25):
        img = (rng.random((10, 40, 3)) * 255).astype(np.uint8)
        d16 = (rng.random((10, 40)) * 65535).astype(np.uint16)
        nd = np.asarray(stereo.normalize_depth(jnp.asarray(d16)))
        div = float(rng.uniform(-8, 8))
        div_px = div / 100.0 * 40
        got = np.asarray(stereo.apply_stereo_divergence(
            img, d16, div, 0.0, 1.0, "naive_interpolating"))
        want = oracles.stereo_warp_naive(img, nd, div_px, 0.0, 1.0,
                                         "naive_interpolating")
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("fill", ["none", "naive"])
def test_warp_naive_fuzz(rng, fill):
    """Broad fuzz of the device warp + naive fill against the oracle:
    random sizes, divergences (incl. negative), separations, exponents."""
    for trial in range(25):
        h = int(rng.integers(4, 16))
        w = int(rng.integers(16, 48))
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        nd = rng.random((h, w))
        div_px = float(rng.uniform(-8, 8))
        sep_px = float(rng.choice([0.0, rng.uniform(-2, 2)]))
        expo = float(rng.choice([1.0, 2.0]))
        got = np.asarray(stereo.apply_stereo_divergence_naive(
            jnp.asarray(img), jnp.asarray(nd, jnp.float32),
            div_px, sep_px, expo, fill))
        want = oracles.stereo_warp_naive(img, nd, div_px, sep_px, expo, fill)
        np.testing.assert_array_equal(
            got, want, err_msg=f"trial={trial} h={h} w={w} div={div_px} "
                               f"sep={sep_px} exp={expo}")


def test_batched_interpolating_matches_canonical_adversarial(rng):
    """VERDICT r4 #9: pin the batched device `naive_interpolating`
    (_fill_naive_interpolating — the video fast path) against the canonical
    sequential semantics on adversarial inputs.

    The fill's docstring long hedged that a single vectorized pass cannot
    reproduce "re-entrant" pixels (an interpolated pixel landing on exact
    black and being re-processed by the in-place sweep).  That case is in
    fact unreachable: an interpolated channel with nonzero left border
    l_c > 0 takes values l_c + trunc(-k*l_c/total) >= ceil(l_c/total) >= 1
    (trunc toward zero, k < total), a zero/zero channel stays zero, and a
    run whose both borders are black writes black over black — so an
    interpolant is exact black only when it is unobservably rewriting
    black.  Hence the single-pass device fill is byte-equal to the
    canonical sweep, including on near-black images engineered to maximize
    black interpolants.  This test pins that equality (it is the batched
    path's correctness contract); if it ever fires, the device video path
    has genuinely diverged from the reference numba semantics."""
    h, w = 6, 48
    for trial in range(30):
        # near-black images maximize zero-sum pixels and black borders
        scale = [1, 2, 3, 255][trial % 4]
        imgs = (rng.random((2, h, w, 3)) * scale).astype(np.uint8)
        nds = rng.random((2, h, w)).astype(np.float32)
        div_px = [20.0, -20.0, 40.0][trial % 3]
        left, right = stereo.stereo_pair_batch(
            jnp.asarray(imgs), jnp.asarray(nds), div_px, -div_px, 0.0,
            0.0, 1.0, "naive_interpolating")
        for i in range(2):
            want_l = oracles.stereo_warp_naive(
                imgs[i], nds[i], div_px, 0.0, 1.0, "naive_interpolating")
            want_r = oracles.stereo_warp_naive(
                imgs[i], nds[i], -div_px, 0.0, 1.0, "naive_interpolating")
            np.testing.assert_array_equal(np.asarray(left[i]), want_l)
            np.testing.assert_array_equal(np.asarray(right[i]), want_r)

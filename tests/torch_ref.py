"""Scaffolding for end-to-end converter/forward parity tests against the
*vendored reference torch code* at /root/reference.

The reference tree is importable (read-only) but some of its third-party
deps (torchvision, timm, diffusers, xformers) are not installed in this
environment.  torchvision is only used for `transforms.Compose/Normalize`
imports in module headers, so a minimal stub unlocks those modules; the
timm-backed families get hand-written torch oracles instead (see
tests/torch_oracles.py) — independent reimplementations of the documented
reference math that reproduce the *checkpoint key layout*, so the real
converters are exercised end-to-end.
"""
from __future__ import annotations

import sys
import types

import numpy as np

REFERENCE = "/root/reference"


def add_reference_path():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)


def stub_torchvision():
    """Minimal torchvision.transforms: the vendored model modules import
    Compose/Normalize at module scope but the forward paths under test never
    call them."""
    if "torchvision" in sys.modules:
        return

    class Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    class Normalize:
        """Real channel normalization on (N, C, H, W) tensors — MidasCore's
        PrepForMidas uses it in the zoe forward path."""
        def __init__(self, mean, std):
            self.mean, self.std = mean, std

        def __call__(self, x):
            import torch as _torch
            mean = _torch.as_tensor(self.mean, dtype=x.dtype,
                                    device=x.device).view(1, -1, 1, 1)
            std = _torch.as_tensor(self.std, dtype=x.dtype,
                                   device=x.device).view(1, -1, 1, 1)
            return (x - mean) / std

    class ToTensor:
        """Real torchvision semantics for the inputs the reference feeds
        it: HWC numpy -> CHW tensor, scaled by 1/255 only for uint8 (LeReS'
        scale_torch calls this on float32, depthmap_generation.py:436)."""
        def __call__(self, x):
            import torch as _torch
            if isinstance(x, np.ndarray):
                if x.ndim == 2:
                    x = x[:, :, None]
                t = _torch.from_numpy(np.ascontiguousarray(
                    x.transpose(2, 0, 1)))
                if t.dtype == _torch.uint8:
                    t = t.float().div(255)
                return t
            return x

    class _ChannelNormalize:
        """transforms.Normalize on CHW tensors (LeReS scale_torch path)."""
        def __init__(self, mean, std, inplace=False):
            self.mean, self.std = mean, std

        def __call__(self, x):
            import torch as _torch
            mean = _torch.as_tensor(self.mean, dtype=x.dtype,
                                    device=x.device).view(-1, 1, 1)
            std = _torch.as_tensor(self.std, dtype=x.dtype,
                                   device=x.device).view(-1, 1, 1)
            return (x - mean) / std

    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    # `from torchvision.transforms import transforms` resolves to the inner
    # torchvision.transforms.transforms submodule (depthmap_generation.py:10)
    tvtt = types.ModuleType("torchvision.transforms.transforms")
    tvt.Compose, tvt.Normalize, tvt.ToTensor = Compose, Normalize, ToTensor
    tvtt.Compose, tvtt.ToTensor = Compose, ToTensor
    tvtt.Normalize = _ChannelNormalize
    tvt.transforms = tvtt
    tv.transforms = tvt
    # importlib.util.find_spec("torchvision") (transformers' availability
    # probe) raises on a sys.modules entry with __spec__ = None
    import importlib.machinery
    for _n, _m in (("torchvision", tv), ("torchvision.transforms", tvt),
                   ("torchvision.transforms.transforms", tvtt)):
        _m.__spec__ = importlib.machinery.ModuleSpec(_n, loader=None)
    tv.__version__ = "0.0.0-stub"
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tvt
    sys.modules["torchvision.transforms.transforms"] = tvtt


def randomize_(torch_model, seed: int = 0, scale: float = 0.05):
    """Give every float parameter AND buffer (incl. batchnorm running stats)
    a reproducible non-trivial value so parity tests can't pass by
    accident."""
    import torch
    g = np.random.default_rng(seed)
    with torch.no_grad():
        for name, p in torch_model.named_parameters():
            if "mask_conv" in name:
                continue   # PartialConv's constant all-ones mask kernel
            vals = g.normal(scale=scale, size=tuple(p.shape))
            p.copy_(torch.from_numpy(vals).to(p.dtype))
        for name, b in torch_model.named_buffers():
            if not torch.is_floating_point(b):
                continue
            if "log_binomial_transform" in name:
                continue   # constant k-index tables, not weights
            if name.endswith("running_var"):
                vals = 1.0 + 0.1 * g.random(tuple(b.shape))
            elif name.endswith("running_mean"):
                vals = g.normal(scale=0.02, size=tuple(b.shape))
            else:
                vals = g.normal(scale=scale, size=tuple(b.shape))
            b.copy_(torch.from_numpy(vals).to(b.dtype))
    return torch_model


def assert_close(torch_out, flax_out, atol=2e-4, rtol=1e-3, tag=""):
    t = np.asarray(torch_out.detach().cpu().numpy()
                   if hasattr(torch_out, "detach") else torch_out)
    f = np.asarray(flax_out)
    if t.ndim == 4 and f.ndim == 4 and t.shape[1] == f.shape[-1]:
        t = np.transpose(t, (0, 2, 3, 1))   # NCHW -> NHWC
    assert t.shape == f.shape, f"{tag}: {t.shape} vs {f.shape}"
    np.testing.assert_allclose(t, f, atol=atol, rtol=rtol,
                               err_msg=f"parity mismatch: {tag}")

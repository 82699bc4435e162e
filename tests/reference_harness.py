"""Import-and-drive harness for the ACTUAL reference implementation.

VERDICT.md (round 1) item #1: the round-1 parity suite re-implemented the
reference math in torch fixtures, so a misreading of the reference would hide
in both sides.  This harness imports the real modules from /root/reference
(they run on stock CPU torch) so the parity tests exercise the reference's own
code:

  * ``models/nerf.py`` (Embedding, NeRF)
  * ``models/camera.py`` (Camera PPC)
  * ``models/efficient_shadow_mapping.py`` / ``models/shadow_mapping_utils.py``
  * ``models/rendering.py`` / ``models/rendering_shadows.py`` /
    ``models/rendering_rgb_sm.py`` (render_rays, efficient_sm, shadow_mapping,
    get_K, sample_pdf)
  * ``losses.py``, ``metrics.py`` (psnr/mse), ``utils/__init__.py`` factories,
    ``utils/optimizers.py`` (RAdam/Ranger), ``utils/warmup_scheduler.py``

Missing native/GPU-only deps are stubbed with faithful pure-torch shims BEFORE
the reference imports resolve:
  * ``torchsearchsorted.searchsorted(a, v, side)`` -> stock
    ``torch.searchsorted`` (the upstream kernel's documented contract; the
    reference itself uses the stock call at ``models/rendering_shadows.py:41``).
  * ``kornia.create_meshgrid`` -> the (1, H, W, 2) xy grid it documents.
  * ``kornia.losses.ssim`` -> verbatim port of kornia==0.2.0's
    ``losses.ssim`` (the reference's pin), so ``metrics.ssim`` parity runs
    against the reference's own ``1 - 2*dssim`` through the real formula.
  * ``torchvision.transforms.ToTensor`` / ``cv2`` -> import-time-only shims so
    ``utils/__init__.py`` (which pulls in visualization) can load; the parity
    tests never render colormaps through them.
"""
from __future__ import annotations

import importlib
import importlib.util
import sys
import types

import numpy as np
import torch

REFERENCE_ROOT = "/root/reference"


# ---------------------------------------------------------------------------
# dependency stubs (installed once, before reference imports)
# ---------------------------------------------------------------------------
def _install_stubs():
    if "torchsearchsorted" not in sys.modules:
        tss = types.ModuleType("torchsearchsorted")
        tss.searchsorted = lambda a, v, side="right": torch.searchsorted(
            a, v, right=(side == "right")
        )
        sys.modules["torchsearchsorted"] = tss

    if "kornia" not in sys.modules:
        kornia = types.ModuleType("kornia")

        def create_meshgrid(H, W, normalized_coordinates=True, device=None,
                            dtype=None):
            xs = torch.arange(W, dtype=torch.float32)
            ys = torch.arange(H, dtype=torch.float32)
            if normalized_coordinates:
                xs = 2.0 * xs / max(W - 1, 1) - 1.0
                ys = 2.0 * ys / max(H - 1, 1) - 1.0
            grid_x, grid_y = torch.meshgrid(xs, ys, indexing="xy")
            return torch.stack([grid_x, grid_y], dim=-1)[None]  # (1, H, W, 2)

        kornia.create_meshgrid = create_meshgrid
        losses_mod = types.ModuleType("kornia.losses")

        def _kornia_ssim(img1, img2, window_size, reduction="none",
                         max_val=1.0):
            """kornia==0.2.0 ``losses.ssim`` (the reference's pin,
            requirements.txt:5), ported verbatim from its
            ``kornia/losses/ssim.py``: gaussian window sigma 1.5 (1-D
            kernels normalized then outer-product), zero padding
            ``(window_size-1)//2``, per-channel grouped conv, and the
            per-pixel ``clamp((1-ssim)/2, 0, 1)`` dissimilarity before
            reduction.

            PROVENANCE CAVEAT (advisor round 3): this environment has no
            network, so the port cannot be anchored against an installed
            kornia==0.2.0 — parity tests that use this shim verify our
            ``metrics.ssim`` against THIS port, not against the pinned
            library itself.  If a CI environment with pip access ever
            exists, pin-install kornia==0.2.0 once and assert this function
            matches ``kornia.losses.ssim`` bit-for-bit to close the loop
            (kernel-construction details — even/odd window centering, kernel
            normalization order — are where a port would plausibly diverge).
            """
            import torch.nn.functional as F

            def gauss1d(ws, sig):
                x = torch.arange(ws, dtype=torch.float32) - ws // 2
                if ws % 2 == 0:
                    x = x + 0.5
                g = torch.exp(-(x ** 2) / (2.0 * sig ** 2))
                return g / g.sum()

            k1 = gauss1d(window_size, 1.5)
            kern2d = torch.matmul(k1[:, None], k1[None, :])
            b, c, h, w = img1.shape
            kernel = kern2d.to(img1.dtype)[None, None].repeat(c, 1, 1, 1)
            pad = (window_size - 1) // 2

            def filt(x):
                return F.conv2d(x, kernel, padding=pad, stride=1, groups=c)

            C1 = (0.01 * max_val) ** 2
            C2 = (0.03 * max_val) ** 2
            mu1, mu2 = filt(img1), filt(img2)
            mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
            s1 = filt(img1 * img1) - mu1_sq
            s2 = filt(img2 * img2) - mu2_sq
            s12 = filt(img1 * img2) - mu1_mu2
            ssim_map = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / (
                (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
            )
            loss = torch.clamp(-ssim_map + 1.0, min=0, max=1) / 2.0
            if reduction == "mean":
                return torch.mean(loss)
            if reduction == "sum":
                return torch.sum(loss)
            return loss

        losses_mod.ssim = _kornia_ssim
        kornia.losses = losses_mod
        sys.modules["kornia"] = kornia
        sys.modules["kornia.losses"] = losses_mod

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        transforms = types.ModuleType("torchvision.transforms")

        class ToTensor:
            def __call__(self, pic):
                arr = np.asarray(pic, dtype=np.float32) / 255.0
                if arr.ndim == 2:  # 'L' images -> (1, H, W)
                    arr = arr[None]
                else:
                    arr = arr.transpose(2, 0, 1)
                return torch.from_numpy(arr.copy())

        transforms.ToTensor = ToTensor
        tv.transforms = transforms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = transforms

    if "cv2" not in sys.modules:
        cv2 = types.ModuleType("cv2")
        cv2.COLORMAP_JET = 2

        def applyColorMap(*a, **k):
            raise NotImplementedError("cv2 stub: visualization parity is "
                                      "covered by test_tools.py")

        cv2.applyColorMap = applyColorMap
        cv2.__getattr__ = lambda name: (_ for _ in ()).throw(
            AttributeError(name)
        )
        sys.modules["cv2"] = cv2


_NS = None


def load_reference():
    """Import the reference modules (cached); returns a namespace."""
    global _NS
    if _NS is not None:
        return _NS
    _install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    ns = types.SimpleNamespace()
    ns.nerf = importlib.import_module("models.nerf")
    ns.camera = importlib.import_module("models.camera")
    ns.eff_sm = importlib.import_module("models.efficient_shadow_mapping")
    ns.sm_utils = importlib.import_module("models.shadow_mapping_utils")
    ns.rendering = importlib.import_module("models.rendering")
    ns.rendering_shadows = importlib.import_module("models.rendering_shadows")
    ns.rendering_rgb_sm = importlib.import_module("models.rendering_rgb_sm")
    ns.losses = importlib.import_module("losses")
    ns.metrics = importlib.import_module("metrics")
    ns.ray_utils = importlib.import_module("datasets.ray_utils")
    ns.utils = importlib.import_module("utils")
    ns.optimizers = importlib.import_module("utils.optimizers")
    ns.warmup_scheduler = importlib.import_module("utils.warmup_scheduler")
    _NS = ns
    return ns


# ---------------------------------------------------------------------------
# weight transfer: our pure pytree -> the reference nn.Module
# ---------------------------------------------------------------------------
def params_to_ref_nerf(params, ref_nerf_cls, requires_grad=False):
    """Build a reference ``NeRF`` module carrying OUR pytree's weights.

    Our layers store ``w`` as (fan_in, fan_out); torch ``nn.Linear.weight``
    is (fan_out, fan_in) — transpose on copy.  Architecture hyper-params are
    inferred from the pytree shapes the same way ``nerf_apply`` does.
    """
    layers = params["xyz_layers"]
    D = len(layers)
    cx = int(layers[0]["w"].shape[0])
    W = int(layers[0]["w"].shape[1])
    skips = [i for i in range(1, D) if layers[i]["w"].shape[0] == W + cx]
    cdir = int(params["dir_layer"]["w"].shape[0]) - W
    model = ref_nerf_cls(D=D, W=W, in_channels_xyz=cx, in_channels_dir=cdir,
                         skips=skips)
    sd = {}

    def put(name, leaf, transpose):
        a = np.asarray(leaf)
        sd[name] = torch.from_numpy(a.T.copy() if transpose else a.copy())

    for i, layer in enumerate(layers):
        put(f"xyz_encoding_{i + 1}.0.weight", layer["w"], True)
        put(f"xyz_encoding_{i + 1}.0.bias", layer["b"], False)
    put("xyz_encoding_final.weight", params["xyz_final"]["w"], True)
    put("xyz_encoding_final.bias", params["xyz_final"]["b"], False)
    put("dir_encoding.0.weight", params["dir_layer"]["w"], True)
    put("dir_encoding.0.bias", params["dir_layer"]["b"], False)
    put("sigma.weight", params["sigma"]["w"], True)
    put("sigma.bias", params["sigma"]["b"], False)
    put("rgb.0.weight", params["rgb"]["w"], True)
    put("rgb.0.bias", params["rgb"]["b"], False)
    model.load_state_dict(sd)
    for p in model.parameters():
        p.requires_grad_(requires_grad)
    return model


def ref_nerf_param_grads(model):
    """Collect the reference module's grads into OUR pytree layout.

    Heads unreachable from the loss (e.g. rgb/dir through a sigma-only
    render) have ``grad is None`` in torch; report zeros, matching jax.
    """
    sd = {n: (p.grad if p.grad is not None else torch.zeros_like(p))
          for n, p in model.named_parameters()}

    def get(name, transpose):
        a = sd[name].detach().numpy()
        return a.T.copy() if transpose else a.copy()

    D = len([n for n in sd if n.startswith("xyz_encoding_")
             and n.endswith(".0.weight")])
    return {
        "xyz_layers": [
            {"w": get(f"xyz_encoding_{i + 1}.0.weight", True),
             "b": get(f"xyz_encoding_{i + 1}.0.bias", False)}
            for i in range(D)
        ],
        "xyz_final": {"w": get("xyz_encoding_final.weight", True),
                      "b": get("xyz_encoding_final.bias", False)},
        "dir_layer": {"w": get("dir_encoding.0.weight", True),
                      "b": get("dir_encoding.0.bias", False)},
        "sigma": {"w": get("sigma.weight", True),
                  "b": get("sigma.bias", False)},
        "rgb": {"w": get("rgb.0.weight", True),
                "b": get("rgb.0.bias", False)},
    }


# ---------------------------------------------------------------------------
# randomness injection: feed the reference's torch.rand/randn from a queue
# ---------------------------------------------------------------------------
class InjectRandom:
    """Context manager replacing ``torch.rand``/``torch.rand_like``/
    ``torch.randn`` with a FIFO of pre-drawn arrays, so the reference consumes
    exactly the randomness we also hand to our renderer via ``overrides``.

    The queue is order-sensitive; entries are (kind, array) with kind in
    {"rand", "rand_like", "randn"} asserted against the intercepted call.
    """

    def __init__(self, queue):
        self.queue = list(queue)

    def _pop(self, kind, shape):
        assert self.queue, f"reference drew more randomness than injected ({kind} {shape})"
        k, arr = self.queue.pop(0)
        assert k == kind, f"draw-order mismatch: expected {k}, reference asked for {kind}"
        t = torch.from_numpy(np.asarray(arr, dtype=np.float32))
        assert tuple(t.shape) == tuple(shape), (
            f"shape mismatch for {kind}: injected {tuple(t.shape)}, "
            f"reference asked for {tuple(shape)}"
        )
        return t

    @staticmethod
    def _shape_of(args):
        if len(args) == 1 and not isinstance(args[0], int):
            return tuple(args[0])
        return tuple(args)

    def __enter__(self):
        self._rand, self._rand_like, self._randn = (
            torch.rand, torch.rand_like, torch.randn
        )
        torch.rand = lambda *a, **k: self._pop("rand", self._shape_of(a))
        torch.rand_like = lambda t, **k: self._pop("rand_like", t.shape)
        torch.randn = lambda *a, **k: self._pop("randn", self._shape_of(a))
        return self

    def __exit__(self, *exc):
        torch.rand, torch.rand_like, torch.randn = (
            self._rand, self._rand_like, self._randn
        )
        if exc[0] is None:
            assert not self.queue, (
                f"{len(self.queue)} injected draws were never consumed"
            )
        return False

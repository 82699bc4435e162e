"""Import a reference (PyTorch / PyTorch-Lightning) checkpoint.

Reference users carry ``.ckpt`` files written by the Lightning trainers
(``train.py:154-158``) whose ``state_dict`` maps ``nerf_coarse.*`` /
``nerf_fine.*`` to torch tensors, with module attribute names from the
reference NeRF (``models/nerf.py:41-123``: ``xyz_encoding_{1..D}.0``,
``xyz_encoding_final``, ``dir_encoding.0``, ``sigma``, ``rgb.0``), or
bare-prefix weight files produced by the reference's
``utils/save_weights_only.py``.  This tool converts either into this
framework's msgpack weights-only artifact so ``--ckpt_path``, the eval
tool and the mesh tool load a reference-trained scene directly.

Layout notes: torch ``nn.Linear`` stores ``weight`` as ``(out, in)``;
our ``_dense`` right-multiplies, so weights transpose to ``(in, out)``.
``Embedding`` and the losses are parameter-free, so the MLPs are the whole
state.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


def _to_np(t: Any) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def nerf_params_from_torch_state(
    sd: Dict[str, Any], prefix: str = ""
) -> Dict[str, Any]:
    """Reference NeRF ``state_dict`` entries under ``prefix`` → our param
    pytree (``models/nerf.py::init_nerf`` structure)."""

    def get(name: str) -> np.ndarray:
        return _to_np(sd[prefix + name])

    layers = []
    i = 1
    while f"{prefix}xyz_encoding_{i}.0.weight" in sd:
        layers.append(
            {
                "w": get(f"xyz_encoding_{i}.0.weight").T,
                "b": get(f"xyz_encoding_{i}.0.bias"),
            }
        )
        i += 1
    if not layers:
        raise KeyError(
            f"no '{prefix}xyz_encoding_1.0.weight' in checkpoint — not a "
            "reference NeRF state_dict"
        )
    return {
        "xyz_layers": layers,
        "xyz_final": {
            "w": get("xyz_encoding_final.weight").T,
            "b": get("xyz_encoding_final.bias"),
        },
        "dir_layer": {
            "w": get("dir_encoding.0.weight").T,
            "b": get("dir_encoding.0.bias"),
        },
        "sigma": {"w": get("sigma.weight").T, "b": get("sigma.bias")},
        "rgb": {"w": get("rgb.0.weight").T, "b": get("rgb.0.bias")},
    }


def params_from_torch_checkpoint(
    ckpt: Dict[str, Any],
    coarse_name: str = "nerf_coarse",
    fine_name: str = "nerf_fine",
) -> Dict[str, Any]:
    """Full Lightning checkpoint (``{'state_dict': …}``) or bare
    ``state_dict`` → ``{"coarse": …[, "fine": …]}``.

    A bare single-model state_dict (no ``nerf_*`` prefixes — e.g. one model
    re-saved by hand) imports as coarse-only.
    """
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    params: Dict[str, Any] = {}
    if any(k.startswith(coarse_name + ".") for k in sd):
        params["coarse"] = nerf_params_from_torch_state(sd, coarse_name + ".")
    if any(k.startswith(fine_name + ".") for k in sd):
        params["fine"] = nerf_params_from_torch_state(sd, fine_name + ".")
    if not params:
        params["coarse"] = nerf_params_from_torch_state(sd)
    return params


def import_torch_checkpoint(
    in_path: str,
    out_path: str,
    coarse_name: str = "nerf_coarse",
    fine_name: str = "nerf_fine",
) -> Dict[str, Any]:
    """Convert a torch ``.ckpt`` file into our weights-only msgpack artifact
    (same shape as ``save_weights_only.py`` output: ``{"params": …}``)."""
    import torch

    from ..training.checkpoints import save_checkpoint

    ckpt = torch.load(in_path, map_location="cpu", weights_only=False)
    params = params_from_torch_checkpoint(ckpt, coarse_name, fine_name)
    save_checkpoint(out_path, {"params": params})
    return params


def torch_state_from_nerf_params(
    params: Dict[str, Any], prefix: str = ""
) -> Dict[str, Any]:
    """Our param pytree → reference NeRF ``state_dict`` entries (the exact
    inverse of ``nerf_params_from_torch_state``)."""
    import torch

    def put(out, name, leaf, transpose):
        a = np.asarray(leaf, dtype=np.float32)
        out[prefix + name] = torch.from_numpy(a.T.copy() if transpose else a.copy())

    sd: Dict[str, Any] = {}
    for i, layer in enumerate(params["xyz_layers"]):
        put(sd, f"xyz_encoding_{i + 1}.0.weight", layer["w"], True)
        put(sd, f"xyz_encoding_{i + 1}.0.bias", layer["b"], False)
    put(sd, "xyz_encoding_final.weight", params["xyz_final"]["w"], True)
    put(sd, "xyz_encoding_final.bias", params["xyz_final"]["b"], False)
    put(sd, "dir_encoding.0.weight", params["dir_layer"]["w"], True)
    put(sd, "dir_encoding.0.bias", params["dir_layer"]["b"], False)
    put(sd, "sigma.weight", params["sigma"]["w"], True)
    put(sd, "sigma.bias", params["sigma"]["b"], False)
    put(sd, "rgb.0.weight", params["rgb"]["w"], True)
    put(sd, "rgb.0.bias", params["rgb"]["b"], False)
    return sd


def export_torch_checkpoint(
    in_path: str,
    out_path: str,
    coarse_name: str = "nerf_coarse",
    fine_name: str = "nerf_fine",
) -> None:
    """Convert one of our checkpoints (full or weights-only) into a
    Lightning-style ``{'state_dict': …}`` torch file the reference's
    ``load_ckpt`` (``utils/__init__.py:72-76``) restores directly."""
    import torch

    from ..training.checkpoints import load_checkpoint

    state = load_checkpoint(in_path)
    params = state.get("params", state)
    # msgpack round-trips lists as {"0": …} dicts — renumber back
    def delist(t):
        if isinstance(t, dict) and t and all(k.isdigit() for k in t):
            return [delist(t[k]) for k in sorted(t, key=int)]
        if isinstance(t, dict):
            return {k: delist(v) for k, v in t.items()}
        return t

    params = delist(params)
    sd: Dict[str, Any] = {}
    names = {"coarse": coarse_name, "fine": fine_name}
    for ours, theirs in names.items():
        if ours in params:
            sd.update(torch_state_from_nerf_params(params[ours], theirs + "."))
    if not sd:
        raise KeyError(f"{in_path} holds no coarse/fine NeRF params")
    torch.save({"state_dict": sd}, out_path)


def main(argv: Optional[list] = None) -> None:
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ckpt_path", type=str, required=True,
                        help="input checkpoint (torch .ckpt, or ours with "
                             "--export)")
    parser.add_argument("--out_path", type=str, required=True,
                        help="output checkpoint")
    parser.add_argument("--coarse_name", type=str, default="nerf_coarse")
    parser.add_argument("--fine_name", type=str, default="nerf_fine")
    parser.add_argument("--export", action="store_true",
                        help="reverse direction: our msgpack ckpt -> "
                             "reference-loadable torch state_dict")
    args = parser.parse_args(argv)
    if args.export:
        export_torch_checkpoint(
            args.ckpt_path, args.out_path, args.coarse_name, args.fine_name
        )
        print(f"wrote {args.out_path}")
        return
    params = import_torch_checkpoint(
        args.ckpt_path, args.out_path, args.coarse_name, args.fine_name
    )
    from ..models.nerf import num_params

    for name, p in params.items():
        print(f"imported {name}: {num_params(p):,} params")
    print(f"wrote {args.out_path}")


if __name__ == "__main__":
    main()

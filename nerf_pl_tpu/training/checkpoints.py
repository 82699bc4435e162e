"""Checkpoint save/restore.

One msgpack file holds ``{params, opt_state, step, epoch}`` (the reference
splits this across Lightning's ckpt format, ``utils/__init__.py:55-76`` and
``utils/save_weights_only.py``).  Features mirrored from the reference:

  * non-strict, prefix-filtered partial restore (``load_ckpt`` /
    ``extract_model_state_dict``, ``utils/__init__.py:55-76``): keys are
    flattened to ``coarse/xyz_layers/0/w`` style paths, filtered by
    ``prefixes_to_ignore``, and merged into the live pytree;
  * weights-only export (``utils/save_weights_only.py``) — the "portable
    scene" ~5 MB artifact (``README.md:181-184``);
  * multi-host safety: arrays are pulled to host with
    ``jax.device_get`` (fully-replicated params → identical bytes on every
    host; only process 0 should write).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from flax import serialization


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        items = tree.items()
    elif isinstance(tree, (list, tuple)):
        items = ((str(i), v) for i, v in enumerate(tree))
    else:
        out[prefix.rstrip("/")] = tree
        return out
    for k, v in items:
        out.update(_flatten(v, f"{prefix}{k}/"))
    return out


def save_checkpoint(path: str, state: Any) -> None:
    # multi-host: state is fully replicated, so every process holds identical
    # bytes — but N processes racing os.replace on one shared path can
    # publish a torn file. Only process 0 writes.
    if jax.process_index() != 0:
        return
    state = jax.device_get(state)
    data = serialization.msgpack_serialize(
        serialization.to_state_dict(state), in_place=True
    )
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    state_dict = serialization.msgpack_restore(data)
    if target is None:
        return state_dict
    return serialization.from_state_dict(target, state_dict)


def extract_model_state_dict(
    ckpt_path: str,
    model_name: str = "params",
    prefixes_to_ignore: Sequence[str] = (),
) -> Dict[str, np.ndarray]:
    """Flattened ``{path: array}`` for keys under ``model_name``, with the
    prefix stripped and ``prefixes_to_ignore`` dropped
    (reference ``utils/__init__.py:55-70``)."""
    raw = load_checkpoint(ckpt_path)
    if "params" in raw and model_name != "params" and model_name in raw.get("params", {}):
        raw = raw["params"]
    flat = _flatten(raw)
    out = {}
    pre = model_name + "/"
    for k, v in flat.items():
        if not k.startswith(pre):
            continue
        k = k[len(pre):]
        if any(k.startswith(p) for p in prefixes_to_ignore):
            continue
        out[k] = v
    return out


def load_ckpt_into(
    params: Any,
    ckpt_path: str,
    model_name: str = "coarse",
    prefixes_to_ignore: Sequence[str] = (),
    loaded: Optional[Dict[str, np.ndarray]] = None,
) -> Any:
    """Non-strict merge of a checkpoint's ``model_name`` weights into a live
    param pytree (reference ``load_ckpt``, ``utils/__init__.py:72-76``).

    ``loaded`` short-circuits the file read with an already-extracted flat
    state dict (callers that inspected the checkpoint first — e.g. width
    inference in ``tools.evaluate.load_models`` — avoid re-parsing the
    whole msgpack per model)."""
    if loaded is None:
        loaded = extract_model_state_dict(
            ckpt_path, model_name, prefixes_to_ignore
        )

    def merge(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: merge(v, f"{prefix}{k}/") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            t = [merge(v, f"{prefix}{i}/") for i, v in enumerate(tree)]
            return type(tree)(t) if isinstance(tree, tuple) else t
        key = prefix.rstrip("/")
        if key in loaded:
            new = np.asarray(loaded[key])
            assert new.shape == tree.shape, (key, new.shape, tree.shape)
            return jax.numpy.asarray(new, dtype=tree.dtype)
        return tree

    return merge(params)

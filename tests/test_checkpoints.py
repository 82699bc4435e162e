import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerf_pl_tpu.models.nerf import init_nerf
from nerf_pl_tpu.training.checkpoints import (
    extract_model_state_dict,
    load_checkpoint,
    load_ckpt_into,
    save_checkpoint,
)


def _state():
    params = {"coarse": init_nerf(jax.random.PRNGKey(0)),
              "fine": init_nerf(jax.random.PRNGKey(1))}
    opt = optax.adam(1e-3)
    return {"params": params, "opt_state": opt.init(params), "epoch": 3}


def test_roundtrip(tmp_path):
    state = _state()
    path = str(tmp_path / "ckpt.ckpt")
    save_checkpoint(path, state)
    restored = load_checkpoint(path, state)
    for a, b in zip(jax.tree_util.tree_leaves(state["params"]),
                    jax.tree_util.tree_leaves(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored["epoch"]) == 3


def test_extract_model_state_dict_prefix_filter(tmp_path):
    state = _state()
    path = str(tmp_path / "ckpt.ckpt")
    save_checkpoint(path, state)
    flat = extract_model_state_dict(path, "coarse")
    assert "sigma/w" in flat and "xyz_layers/0/w" in flat
    filt = extract_model_state_dict(path, "coarse", prefixes_to_ignore=("sigma",))
    assert "sigma/w" not in filt and "xyz_layers/0/w" in filt


def test_load_ckpt_into_partial_merge(tmp_path):
    state = _state()
    path = str(tmp_path / "ckpt.ckpt")
    save_checkpoint(path, state)
    fresh = init_nerf(jax.random.PRNGKey(42))
    merged = load_ckpt_into(fresh, path, "coarse")
    np.testing.assert_array_equal(
        np.asarray(merged["sigma"]["w"]),
        np.asarray(state["params"]["coarse"]["sigma"]["w"]),
    )
    # ignored prefix keeps the fresh init
    merged2 = load_ckpt_into(fresh, path, "coarse", prefixes_to_ignore=("sigma",))
    np.testing.assert_array_equal(
        np.asarray(merged2["sigma"]["w"]), np.asarray(fresh["sigma"]["w"])
    )
    assert not np.array_equal(
        np.asarray(merged2["sigma"]["w"]),
        np.asarray(state["params"]["coarse"]["sigma"]["w"]),
    )


def test_atomic_write(tmp_path):
    state = _state()
    path = str(tmp_path / "x.ckpt")
    save_checkpoint(path, state)
    assert os.path.exists(path) and not os.path.exists(path + ".tmp")

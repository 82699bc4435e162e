"""Reference experiment-grid mapping (docs/recipes.md + launchers/recipes.sh).

The reference encodes its research grid in ~70 root-level SLURM scripts;
VERDICT r3 requires every one accounted for.  These tests pin the checked-in
artifacts to the actual /root/reference contents and drive one translated
recipe end-to-end.
"""
import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


def _reference_scripts():
    return sorted(
        f[:-3] for f in os.listdir(REF) if f.endswith(".sh")
    )


def test_recipes_cover_every_reference_script():
    names = _reference_scripts()
    assert len(names) >= 60  # the grid VERDICT r3 describes

    with open(os.path.join(REPO, "docs", "recipes.md")) as f:
        doc = f.read()
    doc_rows = re.findall(r"^\| `([^`]+)` \|", doc, re.M)
    assert sorted(doc_rows) == names, (
        "docs/recipes.md out of sync with /root/reference/*.sh — rerun "
        "scripts/map_reference_recipes.py"
    )

    with open(os.path.join(REPO, "launchers", "recipes.sh")) as f:
        sh = f.read()
    sh_cases = re.findall(r"^  (\S+)\)$", sh, re.M)
    sh_cases = [c for c in sh_cases if c != "*"]
    assert sorted(sh_cases) == names, (
        "launchers/recipes.sh out of sync — rerun "
        "scripts/map_reference_recipes.py"
    )


def test_recipe_rows_preserve_reference_hparams():
    """Spot-check that the translation keeps the reference's exact hparams
    (lr, Light_N, blur, shadow_method) for a known script."""
    with open(os.path.join(REPO, "launchers", "recipes.sh")) as f:
        sh = f.read()
    block = re.search(r"submit_sm2\)\n(.*?);;", sh, re.S).group(1)
    assert "train_efficient_sm.py" in block
    for frag in ["--lr 0.00001", "--Light_N_importance 32",
                 "--shadow_method shadow_method_2", "--blur 2",
                 "--grad_on_light", "--batch_size 4096",
                 '--root_dir "$DATA_DIR"']:
        assert frag in block, frag
    # cluster-local flags must NOT leak through
    assert "num_gpus" not in block
    assert "gridsan" not in sh and "/home/" not in sh


def test_recipe_dispatcher_requires_data_dir():
    r = subprocess.run(
        [os.path.join(REPO, "launchers", "recipes.sh"), "submit_sm2",
         "--num_epochs", "0"],
        capture_output=True, text=True,
        env={k: v for k, v in os.environ.items() if k != "DATA_DIR"},
    )
    assert r.returncode != 0
    assert "DATA_DIR" in (r.stderr + r.stdout)

    r = subprocess.run(
        [os.path.join(REPO, "launchers", "recipes.sh"), "no_such_recipe"],
        capture_output=True, text=True,
    )
    assert r.returncode == 2
    assert "unknown recipe" in r.stderr


@pytest.mark.slow
def test_recipe_dispatcher_trains_tiny(shadow_root, tmp_path):
    """Drive the translated ``submit_sm2`` recipe (efficient_sm +
    shadow_method_2 + blur 2 + grad_on_light) on the tiny synthetic shadow
    scene with size overrides appended — proving trailing flags override
    the recipe's and the mapped command actually trains."""
    env = dict(
        os.environ,
        DATA_DIR=shadow_root,
        JAX_PLATFORMS="cpu",
        PYTHONPATH="",
    )
    env.pop("XLA_FLAGS", None)  # single CPU device is enough here
    r = subprocess.run(
        [os.path.join(REPO, "launchers", "recipes.sh"), "submit_sm2",
         "--img_wh", "8", "8", "--N_samples", "4", "--N_importance", "0",
         "--Light_N_importance", "0", "--batch_size", "16",
         "--num_epochs", "1", "--chunk", "64", "--lr", "1e-3",
         "--exp_name", "recipe_smoke",
         "--log_dir", str(tmp_path / "logs"),
         "--ckpt_dir", str(tmp_path / "ckpts")],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "epoch 0" in r.stdout
    assert (tmp_path / "ckpts" / "recipe_smoke").exists()

"""Render server: real HTTP requests against a live server thread."""
import io
import json
import threading
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    import jax

    from nerf_pl_tpu.models.nerf import init_nerf
    from nerf_pl_tpu.tools.serve import build_server, get_opts
    from nerf_pl_tpu.training.checkpoints import save_checkpoint

    ckpt = str(tmp_path_factory.mktemp("serve") / "m.ckpt")
    save_checkpoint(
        ckpt,
        {"params": {"coarse": init_nerf(jax.random.PRNGKey(0)),
                    "fine": init_nerf(jax.random.PRNGKey(1))}},
    )
    args = get_opts(
        ["--ckpt_path", ckpt, "--port", "0", "--img_wh", "8",
         "--N_samples", "4", "--N_importance", "4"]
    )
    srv = build_server(args)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_healthz(server):
    with urllib.request.urlopen(f"{server}/healthz", timeout=60) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"


def test_get_render_png(server):
    from PIL import Image

    with urllib.request.urlopen(
        f"{server}/render?theta=0.5&radius=4&img_wh=8", timeout=300
    ) as r:
        assert r.headers["Content-Type"] == "image/png"
        img = Image.open(io.BytesIO(r.read()))
    assert img.size == (8, 8)


def test_post_render_npy(server):
    req = urllib.request.Request(
        f"{server}/render",
        data=json.dumps(
            {"eye": [4, 1, 0], "img_wh": 8, "format": "npy"}
        ).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        arr = np.load(io.BytesIO(r.read()))
    assert arr.shape == (8, 8, 3)
    assert np.isfinite(arr).all()


def test_bad_request_and_404(server):
    req = urllib.request.Request(
        f"{server}/render", data=b"{}",
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e2:
        urllib.request.urlopen(f"{server}/nope", timeout=60)
    assert e2.value.code == 404


def test_malformed_query_param_is_400(server):
    """Non-numeric query values must produce a 400 response, not an
    unhandled handler exception (which drops the connection)."""
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(f"{server}/render?theta=abc", timeout=60)
    assert ei.value.code == 400
    assert b"bad query param" in ei.value.read()


def test_unwarmed_img_wh_rejected_fast(server):
    """A request-supplied size that wasn't warm-compiled at startup must be
    rejected with 400, not compile a fresh program under the device lock."""
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(f"{server}/render?img_wh=33", timeout=60)
    assert ei.value.code == 400
    assert b"not warmed" in ei.value.read()

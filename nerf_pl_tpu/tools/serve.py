"""Minimal production render server: load a checkpoint once, serve novel
views over HTTP.

The reference has no serving story (offline ``eval.py`` only); for a
framework "intended for large-scale production deployment and serving"
this provides the missing piece: a warm, jit-compiled render path behind a
plain HTTP API (no external web framework — stdlib ``http.server`` with a
threading mixin; the device work itself is serialized through a lock since
one process owns the chip).

API:
  GET  /healthz               -> {"status": "ok", "renders": N}
  POST /render                body: {"eye": [x,y,z], "look_at": [x,y,z]?,
                                     "img_wh": int?, "format": "png"|"npy"}
                              -> image bytes (image/png) or raw float32
  GET  /render?theta=..&radius=..&height=..   orbit-parameterized GET

Start:
  python serve.py --ckpt_path ckpts/exp/epoch=15.ckpt --port 8000 \
      --img_wh 64 --near 2 --far 6
"""
from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import jax
import jax.numpy as jnp
import numpy as np


class RenderService:
    """Owns the params + compiled render path; thread-safe."""

    def __init__(self, ckpt_path: str, img_wh: int = 64, n_samples: int = 64,
                 n_importance: int = 64, near: float = 2.0, far: float = 6.0,
                 camera_angle_x: float = 0.8, white_back: bool = True):
        from .evaluate import load_models

        self.params = load_models(ckpt_path)
        if "fine" not in self.params and n_importance > 0:
            # coarse-only checkpoint: downgrade instead of crashing at warm()
            # (same fallback as tools/evaluate.py)
            print("[serve] checkpoint has no fine model — serving coarse-only")
            n_importance = 0
        self.img_wh = img_wh
        self.near, self.far = near, far
        self.camera_angle_x = camera_angle_x
        self._img_key = "rgb_fine" if n_importance > 0 else "rgb_coarse"
        self.rkw = dict(
            N_samples=n_samples, N_importance=n_importance, perturb=0.0,
            noise_std=0.0, white_back=white_back, test_time=True,
            use_fused=jax.default_backend() == "tpu",
        )
        self._lock = threading.Lock()
        self.renders = 0
        # request-supplied sizes recompile the jitted path (minutes on a
        # remote-tunneled TPU) while holding the device lock; only sizes
        # warmed at startup are accepted
        self.allowed_wh = {img_wh}

    def warm(self):
        """Compile the render path for every allowed size before serving
        (the docstring's 'warm, jit-compiled render path' promise — without
        this the first request per size eats the full XLA compile)."""
        for wh in sorted(self.allowed_wh):
            self.render([0.0, 0.5, 4.0], wh=wh)
        self.renders = 0

    def _rays_for(self, eye, look_at, wh):
        from ..models.camera import c2w_from_lookat
        from ..ops.ray_utils import get_ray_directions, get_rays

        focal = 0.5 * 800 / np.tan(0.5 * self.camera_angle_x) * wh / 800
        c2w = c2w_from_lookat(
            np.asarray(eye, np.float32), np.asarray(look_at, np.float32)
        )[:3, :4]
        o, d = get_rays(get_ray_directions(wh, wh, focal), c2w)
        nf = np.ones_like(o[:, :1])
        return np.concatenate(
            [o, d, self.near * nf, self.far * nf], 1
        ).astype(np.float32)

    def render(self, eye, look_at=(0.0, 0.0, 0.0), wh=None) -> np.ndarray:
        from .render import render_image

        wh = wh or self.img_wh
        if wh not in self.allowed_wh:
            raise ValueError(
                f"img_wh {wh} not warmed at startup (allowed: "
                f"{sorted(self.allowed_wh)}) — each new size would compile "
                f"a fresh device program while blocking all requests"
            )
        rays = self._rays_for(eye, look_at, wh)
        with self._lock:  # one chip, one request at a time on-device
            out = render_image(
                self.params, jnp.asarray(rays), jax.random.PRNGKey(0),
                **self.rkw,
            )
            jax.block_until_ready(out)
            self.renders += 1
        return np.clip(
            np.asarray(out[self._img_key]).reshape(wh, wh, 3), 0, 1
        )


def make_handler(service: RenderService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _send(self, code, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_image(self, img: np.ndarray, fmt: str):
            if fmt == "npy":
                buf = io.BytesIO()
                np.save(buf, img.astype(np.float32))
                self._send(200, buf.getvalue(), "application/octet-stream")
                return
            from PIL import Image

            buf = io.BytesIO()
            Image.fromarray((img * 255).astype(np.uint8)).save(buf, "PNG")
            self._send(200, buf.getvalue(), "image/png")

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/healthz":
                self._send(
                    200,
                    json.dumps(
                        {"status": "ok", "renders": service.renders}
                    ).encode(),
                    "application/json",
                )
                return
            if url.path == "/render":
                q = parse_qs(url.query)
                try:
                    theta = float(q.get("theta", ["0"])[0])
                    radius = float(q.get("radius", ["4.0"])[0])
                    height = float(q.get("height", ["0.5"])[0])
                    wh = int(q.get("img_wh", [service.img_wh])[0])
                except ValueError as e:
                    # a malformed numeric param must be a 400, not an
                    # unhandled handler exception (dropped connection)
                    self._send(400, f"bad query param: {e}".encode(),
                               "text/plain")
                    return
                fmt = q.get("format", ["png"])[0]
                eye = [
                    radius * np.sin(theta), height, radius * np.cos(theta)
                ]
                try:
                    img = service.render(eye, wh=wh)
                except ValueError as e:
                    self._send(400, str(e).encode(), "text/plain")
                    return
                except Exception as e:  # noqa: BLE001
                    self._send(500, str(e).encode(), "text/plain")
                    return
                self._send_image(img, fmt)
                return
            self._send(404, b"not found", "text/plain")

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/render":
                self._send(404, b"not found", "text/plain")
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n) or b"{}")
                eye = req["eye"]
                look_at = req.get("look_at", [0.0, 0.0, 0.0])
                wh = int(req.get("img_wh", service.img_wh))
                fmt = req.get("format", "png")
            except (KeyError, TypeError, ValueError, json.JSONDecodeError) as e:
                self._send(400, f"bad request: {e}".encode(), "text/plain")
                return
            try:
                img = service.render(eye, look_at, wh)
            except ValueError as e:
                self._send(400, str(e).encode(), "text/plain")
                return
            except Exception as e:  # noqa: BLE001
                self._send(500, str(e).encode(), "text/plain")
                return
            self._send_image(img, fmt)

    return Handler


def get_opts(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_path", required=True)
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--img_wh", type=int, default=64)
    ap.add_argument("--extra_img_wh", type=int, nargs="*", default=None,
                    help="additional request sizes to warm-compile and allow")
    ap.add_argument("--N_samples", type=int, default=64)
    ap.add_argument("--N_importance", type=int, default=64)
    ap.add_argument("--near", type=float, default=2.0)
    ap.add_argument("--far", type=float, default=6.0)
    ap.add_argument("--camera_angle_x", type=float, default=0.8)
    ap.add_argument("--white_back", type=lambda s: s.lower() == "true",
                    default=True)
    return ap.parse_args(argv)


def build_server(args, warm: bool = True) -> ThreadingHTTPServer:
    service = RenderService(
        args.ckpt_path, args.img_wh, args.N_samples, args.N_importance,
        args.near, args.far, args.camera_angle_x, args.white_back,
    )
    service.allowed_wh.update(args.extra_img_wh or [])
    if warm:
        service.warm()
    return ThreadingHTTPServer(
        (args.host, args.port), make_handler(service)
    )


def main(argv=None):
    args = get_opts(argv)
    server = build_server(args)
    print(f"serving renders on http://{args.host}:{args.port}", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()

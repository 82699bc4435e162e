"""Validate a mesh extracted from the analytic synthetic scene.

The generator's geometry is known exactly (``data/synthetic.py``: unit
sphere at SPHERE_C, lambertian position-coloring ``0.5 + 0.5*normal``), so
a mesh extracted from a NeRF trained on that scene can be checked
quantitatively: vertex distances to the sphere center should concentrate
at radius 1, and vertex colors should correlate with the analytic
position-color. This is the hardware acceptance check for the colored-mesh
tool (reference ``extract_color_mesh.py`` has no such oracle — it was
validated by eye in notebooks).

Usage: python scripts/validate_mesh.py mesh.ply
"""
import sys

import numpy as np

sys.path.insert(0, ".")
from nerf_pl_tpu.data.synthetic import SPHERE_C  # noqa: E402
from nerf_pl_tpu.tools.mesh_utils import read_ply  # noqa: E402


def main(path):
    verts, faces, colors = read_ply(path)
    r = np.linalg.norm(verts - SPHERE_C, axis=1)
    report = {
        "n_vertices": len(verts),
        "n_faces": len(faces),
        "radius_mean": float(r.mean()),
        "radius_std": float(r.std()),
        "radius_p5": float(np.percentile(r, 5)),
        "radius_p95": float(np.percentile(r, 95)),
        "frac_within_5pct_of_unit": float(np.mean(np.abs(r - 1.0) < 0.05)),
    }
    if colors is not None and len(colors):
        nrm = (verts - SPHERE_C) / r[:, None]
        analytic = np.clip(0.5 + 0.5 * nrm, 0, 1)
        got = colors.astype(np.float32) / 255.0
        # lambert shading scales the analytic base color per-vertex; compare
        # per-channel correlation, which is shading-invariant in aggregate
        corr = [
            float(np.corrcoef(analytic[:, c], got[:, c])[0, 1])
            for c in range(3)
        ]
        report["color_corr_rgb"] = [round(c, 3) for c in corr]
        report["color_mae"] = float(np.abs(analytic - got).mean())
    for k, v in report.items():
        print(f"{k}: {v}")
    ok = (
        abs(report["radius_mean"] - 1.0) < 0.05
        and report["frac_within_5pct_of_unit"] > 0.9
    )
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1]))

"""Driver entry points at non-flagship device counts (VERDICT r3 weak #4).

The driver only ever calls ``dryrun_multichip(8)``; device-count-dependent
assumptions (divisibility in the composite program, ``plan_chunks``
behavior) were untested at 2/4/16.  Each count runs in a SUBPROCESS so the
virtual CPU device count can differ from the suite's 8 (it is fixed at
backend init).  Shapes stay tiny and the stages sequential to stay inside
XLA:CPU's 40 s collective-rendezvous watchdog on this 2-core host.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
@pytest.mark.parametrize("n", [2, 4, 16])
def test_dryrun_multichip_other_device_counts(n):
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n}"
    r = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; "
         f"dryrun_multichip({n})"],
        capture_output=True, text=True, timeout=540, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    for marker in ("OK", "shadow collectives OK", "light-sampler",
                   "image-composite collectives OK"):
        assert marker in r.stdout, (marker, r.stdout)


def test_entry_compiles_single_chip():
    """entry() must jit on the suite's default backend (the driver's
    single-chip compile check)."""
    import jax

    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256, 3)

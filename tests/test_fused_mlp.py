"""Pallas fused-MLP kernel vs the portable ``nerf_apply`` oracle
(interpret mode — same kernel code path, CPU-executable)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_pl_tpu.models.nerf import init_nerf, nerf_apply
from nerf_pl_tpu.ops.fused_mlp import (
    fused_nerf_apply,
    pack_params,
    supports_fused,
    unpack_grads,
)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    p = init_nerf(key)
    x = jax.random.normal(jax.random.fold_in(key, 1), (512, 90)) * 0.5
    return p, x


def test_supports_fused(setup):
    p, _ = setup
    assert supports_fused(p)
    assert not supports_fused({"xyz_layers": []})
    small = init_nerf(jax.random.PRNGKey(0), D=4, W=128,
                      in_channels_xyz=63, in_channels_dir=27)
    assert not supports_fused(small)


def test_forward_parity(setup):
    p, x = setup
    ref = np.asarray(nerf_apply(p, x))
    got = np.asarray(
        fused_nerf_apply(p, x, compute_dtype=jnp.float32, interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_forward_sigma_only_parity(setup):
    p, x = setup
    xs = x[:, :63]
    ref = np.asarray(nerf_apply(p, xs, sigma_only=True))
    got = np.asarray(
        fused_nerf_apply(p, xs, sigma_only=True, compute_dtype=jnp.float32,
                         interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_row_padding(setup):
    """Non-multiple-of-block point counts are padded then sliced."""
    p, x = setup
    xr = x[:300]
    ref = np.asarray(nerf_apply(p, xr))
    got = np.asarray(
        fused_nerf_apply(p, xr, compute_dtype=jnp.float32, interpret=True,
                         block=256)
    )
    assert got.shape == (300, 4)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_grad_parity(setup):
    p, x = setup
    t = jax.random.uniform(jax.random.PRNGKey(9), (x.shape[0], 4))

    def loss_ref(p):
        return jnp.mean((nerf_apply(p, x) - t) ** 2)

    def loss_fused(p):
        out = fused_nerf_apply(p, x, compute_dtype=jnp.float32, interpret=True)
        return jnp.mean((out - t) ** 2)

    gr = jax.grad(loss_ref)(p)
    gf = jax.grad(loss_fused)(p)
    for a, b in zip(jax.tree_util.tree_leaves(gr), jax.tree_util.tree_leaves(gf)):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(a).max() + 1e-10
        assert np.abs(a - b).max() / denom < 5e-3, (np.abs(a - b).max(), denom)


def test_pack_unpack_shapes(setup):
    p, _ = setup
    packed = pack_params(p, jnp.float32)
    zeros = {k: jnp.zeros_like(v) for k, v in packed.items()}
    g = unpack_grads(zeros, p)
    # grads mirror the param pytree structure/shapes
    for a, b in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(p)):
        assert a.shape == b.shape


def test_render_rays_fused_interpret_matches_unfused(setup, monkeypatch):
    """End-to-end: render_rays(use_fused=True) == use_fused=False with the
    raw-input kernel in interpret mode."""
    import nerf_pl_tpu.ops.fused_mlp as fm
    from nerf_pl_tpu.ops.rendering import render_rays

    orig = fm.fused_nerf_apply_raw

    def interp(params, xyz, dirs=None, **kw):
        kw.pop("compute_dtype", None)
        kw["block"] = 256
        return orig(params, xyz, dirs, compute_dtype=jnp.float32,
                    interpret=True,
                    **{k: v for k, v in kw.items() if k in ("block",)})

    import nerf_pl_tpu.ops.rendering as rend

    monkeypatch.setattr(rend, "fused_nerf_apply_raw", interp)

    p, _ = setup
    key = jax.random.PRNGKey(3)
    o = jax.random.normal(key, (16, 3)) * 0.1
    d = jax.random.normal(jax.random.fold_in(key, 1), (16, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.concatenate(
        [o, d, jnp.full((16, 1), 2.0), jnp.full((16, 1), 6.0)], -1
    )
    kw = dict(N_samples=8, N_importance=8, perturb=0.0, noise_std=0.0,
              white_back=True)
    a = render_rays(p, p, rays, jax.random.PRNGKey(5), use_fused=False, **kw)
    b = render_rays(p, p, rays, jax.random.PRNGKey(5), use_fused=True, **kw)
    for k in a:
        av, bv = np.asarray(a[k]), np.asarray(b[k])
        if k.endswith("_coarse"):
            np.testing.assert_allclose(av, bv, rtol=5e-4, atol=5e-4)
        else:
            # fine-pass keys: ~1e-7 coarse-weight differences can flip a
            # searchsorted bin on a knife-edge CDF boundary, legitimately
            # changing that ray's importance samples — require the vast
            # majority of rays to match tightly instead of all
            close = np.isclose(av, bv, rtol=5e-4, atol=5e-4)
            assert close.mean() > 0.85, (k, close.mean())


def test_render_rays_channel_io_matches_unfused(setup, monkeypatch):
    """End-to-end: render_rays(use_fused=True, fused_channel_io=True) ==
    the XLA path, with the channel-major kernel in interpret mode."""
    import nerf_pl_tpu.ops.fused_mlp as fm
    import nerf_pl_tpu.ops.rendering as rend
    from nerf_pl_tpu.ops.rendering import render_rays

    orig = fm.fused_nerf_apply_raw_t

    def interp(params, x_t, sigma_only=False, **kw):
        return orig(params, x_t, sigma_only=sigma_only,
                    compute_dtype=jnp.float32, block=256, interpret=True)

    monkeypatch.setattr(rend, "fused_nerf_apply_raw_t", interp)

    p, _ = setup
    key = jax.random.PRNGKey(3)
    o = jax.random.normal(key, (16, 3)) * 0.1
    d = jax.random.normal(jax.random.fold_in(key, 1), (16, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.concatenate(
        [o, d, jnp.full((16, 1), 2.0), jnp.full((16, 1), 6.0)], -1
    )
    for mode in ("rgb", "sigma"):
        kw = dict(N_samples=8, N_importance=8, perturb=0.0, noise_std=0.0,
                  white_back=True, mode=mode)
        a = render_rays(p, p, rays, jax.random.PRNGKey(5), use_fused=False,
                        **kw)
        b = render_rays(p, p, rays, jax.random.PRNGKey(5), use_fused=True,
                        fused_channel_io=True, **kw)
        assert set(a) == set(b)
        for k in a:
            av, bv = np.asarray(a[k]), np.asarray(b[k])
            if k.endswith("_coarse"):
                np.testing.assert_allclose(av, bv, rtol=5e-4, atol=5e-4)
            else:  # see test_render_rays_fused_interpret_matches_unfused
                close = np.isclose(av, bv, rtol=5e-4, atol=5e-4)
                assert close.mean() > 0.85, (k, close.mean())


def test_stash_vjp_matches_remat_and_reference(setup):
    """The activation-stash backward (fused_mlp stash_blocks) must produce
    the same gradients as both the remat backward and the XLA oracle —
    covering rgb and sigma-only modes (the fwd kernel stashes h1..h8
    [+fin, d] and the bwd reads them instead of recomputing)."""
    from nerf_pl_tpu.ops.fused_mlp import fused_nerf_apply_raw

    p, _ = setup
    key = jax.random.PRNGKey(11)
    xyz = jax.random.normal(key, (200, 3)) * 0.5
    dirs = jax.random.normal(jax.random.fold_in(key, 1), (200, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    for sigma_only in (False, True):
        d_in = None if sigma_only else dirs

        def loss(p, stash):
            out = fused_nerf_apply_raw(
                p, xyz, d_in, compute_dtype=jnp.float32, block=(64, 32),
                interpret=True, stash_blocks=stash,
            )
            return jnp.mean(out ** 2)

        g_stash = jax.grad(functools.partial(loss, stash=(96, 48)))(p)
        g_remat = jax.grad(functools.partial(loss, stash=None))(p)
        for a, b in zip(jax.tree_util.tree_leaves(g_stash),
                        jax.tree_util.tree_leaves(g_remat)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            )


def test_auto_stash_blocks_dtype_aware():
    """f32 compute doubles the stash VMEM block: the (768, 768) default
    measured 16.89 MB scoped VMEM on hardware (over the 16 MB limit, a hard
    compile error) — 'auto' must pick the halved f32 blocks."""
    from nerf_pl_tpu.ops.fused_mlp import (
        DEFAULT_STASH_BLOCKS,
        DEFAULT_STASH_BLOCKS_F32,
        STASH_MAX_POINTS,
        _auto_stash_blocks,
    )

    assert _auto_stash_blocks(1000, jnp.bfloat16) == DEFAULT_STASH_BLOCKS
    assert _auto_stash_blocks(1000, jnp.float32) == DEFAULT_STASH_BLOCKS_F32
    assert _auto_stash_blocks(STASH_MAX_POINTS + 1, jnp.bfloat16) is None
    assert _auto_stash_blocks(STASH_MAX_POINTS + 1, jnp.float32) is None


def test_transposed_io_matches_row_major(setup):
    """The channel-major (8, P) kernel (``fused_nerf_apply_raw_t`` —
    packed-lane ray IO, VERDICT round-2 next #4) must match the row-major
    raw kernel bit-for-bit in forward outputs and gradients, in rgb and
    sigma-only modes, with both the stash and remat backwards."""
    from nerf_pl_tpu.ops.fused_mlp import (
        RAW_COLS,
        fused_nerf_apply_raw,
        fused_nerf_apply_raw_t,
    )

    p, _ = setup
    key = jax.random.PRNGKey(13)
    P = 200
    xyz = jax.random.normal(key, (P, 3)) * 0.5
    dirs = jax.random.normal(jax.random.fold_in(key, 1), (P, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    x_t = jnp.concatenate(
        [xyz.T, dirs.T, jnp.zeros((RAW_COLS - 6, P))], axis=0
    )

    for sigma_only in (False, True):
        d_in = None if sigma_only else dirs
        row = fused_nerf_apply_raw(
            p, xyz, d_in, compute_dtype=jnp.float32, block=(64, 32),
            interpret=True, stash_blocks=None,
        )
        outT = fused_nerf_apply_raw_t(
            p, x_t, sigma_only=sigma_only, compute_dtype=jnp.float32,
            block=(64, 32), interpret=True, stash_blocks=None,
        )
        assert outT.shape == (8, P)
        got = outT[:1].T if sigma_only else jnp.concatenate(
            [outT[:3].T, outT[3:4].T], axis=1
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(row), rtol=0, atol=1e-6
        )
        # the pad rows of the output are exactly zero
        np.testing.assert_array_equal(np.asarray(outT[4:]), 0.0)

        for stash in (None, (96, 48)):
            def loss_row(p):
                out = fused_nerf_apply_raw(
                    p, xyz, d_in, compute_dtype=jnp.float32, block=(64, 32),
                    interpret=True, stash_blocks=stash,
                )
                return jnp.mean(out ** 2)

            def loss_t(p):
                outT = fused_nerf_apply_raw_t(
                    p, x_t, sigma_only=sigma_only, compute_dtype=jnp.float32,
                    block=(64, 32), interpret=True, stash_blocks=stash,
                )
                o = outT[:1].T if sigma_only else jnp.concatenate(
                    [outT[:3].T, outT[3:4].T], axis=1
                )
                return jnp.mean(o ** 2)

            gr = jax.grad(loss_row)(p)
            gt = jax.grad(loss_t)(p)
            for a, b in zip(jax.tree_util.tree_leaves(gr),
                            jax.tree_util.tree_leaves(gt)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
                )


# -- wide-width inference path (round 4, --arch_width) -----------------------


def test_supports_fused_wide_gating():
    from nerf_pl_tpu.ops.fused_mlp import supports_fused_wide, wide_block_for

    k = jax.random.PRNGKey(3)
    assert not supports_fused_wide(init_nerf(k))           # 256 = base path
    assert supports_fused_wide(init_nerf(k, W=512))
    assert not supports_fused_wide(init_nerf(k, W=320))    # not lane-aligned
    assert not supports_fused_wide(init_nerf(k, W=1024))   # weights > VMEM
    assert wide_block_for(512) in (2048, 1024, 512, 256, 128)
    assert wide_block_for(640) <= wide_block_for(512)
    # f32 compute doubles resident weight bytes (ADVICE r4): W=640 fits the
    # budget in bf16 but must fall back to XLA in float32 instead of failing
    # at compile on chip; the block budget shrinks too.
    assert supports_fused_wide(init_nerf(k, W=640))
    assert not supports_fused_wide(init_nerf(k, W=640), jnp.float32)
    assert wide_block_for(512, jnp.float32) <= wide_block_for(512)


def test_wide_forward_parity_interpret():
    """W=512 fused forward (interpret mode) vs nerf_apply, rgb and sigma."""
    k = jax.random.PRNGKey(4)
    p = init_nerf(k, W=512)
    x = jax.random.normal(jax.random.fold_in(k, 1), (192, 90)) * 0.5
    ref = np.asarray(nerf_apply(p, x))
    got = np.asarray(
        fused_nerf_apply(p, x, compute_dtype=jnp.float32, block=64,
                         interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    refs = np.asarray(nerf_apply(p, x[:, :63], sigma_only=True))
    gots = np.asarray(
        fused_nerf_apply(p, x[:, :63], sigma_only=True,
                         compute_dtype=jnp.float32, block=64, interpret=True)
    )
    np.testing.assert_allclose(gots, refs, rtol=2e-4, atol=2e-4)


def test_render_rays_wide_infer_matches_unfused():
    """render_rays with fused_wide_infer routes W=512 through the fused
    forward and matches the XLA path (deterministic settings)."""
    from nerf_pl_tpu.ops import rendering as R

    k = jax.random.PRNGKey(5)
    pc, pf = init_nerf(k, W=512), init_nerf(jax.random.fold_in(k, 1), W=512)
    rays = jnp.concatenate(
        [
            jax.random.normal(jax.random.fold_in(k, 2), (16, 3)) * 0.1,
            jax.random.normal(jax.random.fold_in(k, 3), (16, 3)),
            jnp.full((16, 1), 2.0), jnp.full((16, 1), 6.0),
        ],
        axis=1,
    )
    base = R.render_rays(
        pc, pf, rays, None, N_samples=8, N_importance=8, perturb=0.0,
        noise_std=0.0, use_fused=False,
    )
    # patch the interpret flag through by running the wide kernel in
    # interpret mode on CPU: route via _query's wide branch with a
    # monkeypatched fused_nerf_apply
    import nerf_pl_tpu.ops.rendering as rmod

    orig = rmod.fused_nerf_apply
    rmod.fused_nerf_apply = functools.partial(orig, interpret=True)
    try:
        wide = R.render_rays(
            pc, pf, rays, None, N_samples=8, N_importance=8, perturb=0.0,
            noise_std=0.0, use_fused=True, fused_wide_infer=True,
        )
    finally:
        rmod.fused_nerf_apply = orig
    for key in base:
        np.testing.assert_allclose(
            np.asarray(wide[key]), np.asarray(base[key]), rtol=2e-4,
            atol=2e-4, err_msg=key,
        )

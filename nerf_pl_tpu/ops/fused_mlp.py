"""Fused Pallas NeRF-MLP kernel (forward + custom-VJP backward).

Why: under ``jit`` XLA does not fuse consecutive matmuls, so every one of
the 8 hidden layers round-trips its (points, 256) activation through HBM —
at the flagship workload (262k points/step, f32) that is ~0.5 GB per layer
per direction, which makes the whole train step HBM-bandwidth bound at
~40 TFLOP/s (measured) against a ~200 TFLOP/s bf16 MXU.  This kernel runs
the ENTIRE MLP (8 hidden layers + skip concat + sigma/rgb heads,
reference ``models/nerf.py:41-123``) for a block of points inside VMEM:
HBM traffic per point drops to one narrow input read and one narrow
output write (+ the weight set, resident across grid steps).  NOTE the
(P, 8) ray-IO arrays are lane-padded to 128 by TPU tiled layouts (16x
memory); the channel-major ``fused_nerf_apply_raw_t`` variant below
eliminates that padding entirely ((8, P) arrays tile exactly) — +23%
whole-image rendering, +10% on the train step, and no more 32768-ray
chunk-compile cap (docs/results.md round 3).  Packed channel IO is the
PRODUCTION DEFAULT for every program; the row-major kernels remain as
the parity oracle and the --fused_channel_io false fallback.

Design:
  * Points are blocked on the grid dimension; all weights use constant
    index maps so Pallas keeps them resident in VMEM across grid steps
    (~2.7 MB f32 padded).
  * Layer shapes are padded to MXU lanes: the embedded input (63 xyz + 27
    dir = 90 channels) is carried as one (BP, 128) tile whose tail lanes
    are zero; padded weight rows/cols are zero so results are exact.
  * The skip concat at layer 4 (``models/nerf.py:107-110``) and the
    dir-head concat become block-column matmuls on [x_tile | h].
  * Backward is its own kernel (``custom_vjp``) running dgrad down the
    stack and accumulating wgrads/bgrads into revisited output blocks
    (zeroed at grid step 0).  Activations come from a compute-dtype HBM
    stash written by the differentiated forward (default — see the stash
    section below) or from an in-VMEM forward recompute (remat; auto
    fallback past ``STASH_MAX_POINTS``).
  * Matmuls run in a configurable compute dtype (bf16 by default) with f32
    accumulation; wgrad accumulators are f32.

Only used on TPU; ``models.nerf.nerf_apply`` is the portable reference
path and the numerics oracle for the parity tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# fixed architecture (reference models/nerf.py defaults)
D = 8
W = 256
CX = 63  # xyz embedding channels
CD = 27  # dir embedding channels
CIN = 128  # padded input tile (CX + CD = 90 -> 128)
WH = 128  # dir-head hidden width (W // 2)
SKIP = 4
# output lanes: [rgb(3) | sigma(1) | zero pad]. 8, not CIN: a 128-lane
# output is 12.9 GB at an eval-sized chunk (131072 rays x 192 samples)
# and OOMed whole-image rendering; narrow lanes also shrink the training
# cotangent the backward reads.
OUT_COLS = 8


def pack_params(params, compute_dtype=jnp.bfloat16):
    """NeRF param pytree -> padded dense operands for the kernel.

    Returns a dict of arrays; padding rows/cols are zero so the padded
    matmuls reproduce ``nerf_apply`` exactly.
    """
    f32 = jnp.float32

    def pad(a, rows, cols):
        a = a.astype(f32)
        return jnp.pad(a, ((0, rows - a.shape[0]), (0, cols - a.shape[1])))

    layers = params["xyz_layers"]
    # width derived from the weights so the SAME packing serves the
    # reference W=256 and the --arch_width wide-inference variants (the
    # body/kernels are shape-polymorphic; only the padding tables here and
    # in unpack_grads encode W)
    w_ = layers[0]["w"].shape[1]
    wh_ = params["dir_layer"]["w"].shape[1]
    p = {}
    # layer 0: (63, W) -> (128, W); the dir lanes (63..89) get zero rows
    p["w0"] = pad(layers[0]["w"], CIN, w_)
    # layers 1..7; the skip layer takes [x_tile(128) | h(W)] -> (128+W, W)
    for i in range(1, D):
        wi = layers[i]["w"]
        if i == SKIP:
            # reference concat([input_xyz, h]): first 63 rows are xyz
            top = pad(wi[:CX], CIN, w_)
            bot = wi[CX:].astype(f32)
            p[f"w{i}"] = jnp.concatenate([top, bot], axis=0)  # (128+W, W)
        else:
            p[f"w{i}"] = wi.astype(f32)
    for i in range(D):
        p[f"b{i}"] = layers[i]["b"].astype(f32)[None, :]  # (1, W)
    # heads
    p["wsig"] = pad(params["sigma"]["w"], w_, CIN)  # (W, 128) col 0 live
    p["bsig"] = jnp.pad(params["sigma"]["b"].astype(f32), (0, CIN - 1))[None, :]
    p["wfin"] = params["xyz_final"]["w"].astype(f32)  # (W, W)
    p["bfin"] = params["xyz_final"]["b"].astype(f32)[None, :]
    # dir layer: rows = [final(W) | x_tile(128)]; live x rows are 63..89
    wd = params["dir_layer"]["w"].astype(f32)  # (W+27, W//2)
    top = wd[:w_]
    dirpart = jnp.zeros((CIN, wh_), f32).at[CX : CX + CD].set(wd[w_:])
    p["wdir"] = jnp.concatenate([top, dirpart], axis=0)  # (W+128, W//2)
    p["bdir"] = params["dir_layer"]["b"].astype(f32)[None, :]
    p["wrgb"] = pad(params["rgb"]["w"], wh_, CIN)  # (W//2, 128) cols 0..2 live
    p["brgb"] = jnp.pad(params["rgb"]["b"].astype(f32), (0, CIN - 3))[None, :]
    return {k: v.astype(compute_dtype) if k.startswith("w") else v
            for k, v in p.items()}


def unpack_grads(g, params):
    """Padded-operand grads -> NeRF param pytree grads (slice the padding)."""
    w_ = params["xyz_layers"][0]["w"].shape[1]
    layers = []
    for i in range(D):
        gw = g[f"w{i}"]
        if i == 0:
            gw = gw[:CX]
        elif i == SKIP:
            gw = jnp.concatenate([gw[:CX], gw[CIN:]], axis=0)
        layers.append({"w": gw.astype(jnp.float32),
                       "b": g[f"b{i}"][0].astype(jnp.float32)})
    gwd = g["wdir"]
    gwd = jnp.concatenate([gwd[:w_], gwd[w_ + CX : w_ + CX + CD]], axis=0)
    return {
        "xyz_layers": layers,
        "sigma": {"w": g["wsig"][:, :1].astype(jnp.float32),
                  "b": g["bsig"][0, :1].astype(jnp.float32)},
        "xyz_final": {"w": g["wfin"].astype(jnp.float32),
                      "b": g["bfin"][0].astype(jnp.float32)},
        "dir_layer": {"w": gwd.astype(jnp.float32),
                      "b": g["bdir"][0].astype(jnp.float32)},
        "rgb": {"w": g["wrgb"][:, :3].astype(jnp.float32),
                "b": g["brgb"][0, :3].astype(jnp.float32)},
    }


_PKEYS = (
    [f"w{i}" for i in range(D)]
    + [f"b{i}" for i in range(D)]
    + ["wsig", "bsig", "wfin", "bfin", "wdir", "bdir", "wrgb", "brgb"]
)


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _fwd_body(refs, x, sigma_only):
    """Shared forward recompute: returns (acts, sigma, extras).

    Kept deliberately straight-line: probing alternatives on hardware
    (scripts/kernel_probe.py) showed a bare bias+relu matmul chain of
    these shapes tops out at ~107 TF/s and this body already runs at
    ~103 TF/s, so there is no headroom for software pipelining tricks
    (2-way row-chunk interleaving measured cost-neutral to -3%).
    """
    cdt = refs["w0"].dtype
    h = x
    acts = [x]
    for i in range(D):
        if i == SKIP:
            h = jnp.concatenate([x, h], axis=1)
        pre = _mm(h.astype(cdt), refs[f"w{i}"][:]) + refs[f"b{i}"][:]
        h = jnp.maximum(pre, 0.0)
        acts.append(h)
    sigma = _mm(h.astype(cdt), refs["wsig"][:]) + refs["bsig"][:]
    if sigma_only:
        return acts, sigma, None
    fin = _mm(h.astype(cdt), refs["wfin"][:]) + refs["bfin"][:]
    din = jnp.concatenate([fin, x], axis=1)  # (BP, 384)
    dpre = _mm(din.astype(cdt), refs["wdir"][:]) + refs["bdir"][:]
    d = jnp.maximum(dpre, 0.0)
    rgb = jax.nn.sigmoid(_mm(d.astype(cdt), refs["wrgb"][:]) + refs["brgb"][:])
    return acts, sigma, (fin, din, d, rgb)


def _fwd_kernel(*refs_list, sigma_only):
    x_ref = refs_list[0]
    out_ref = refs_list[-1]
    refs = dict(zip(_PKEYS, refs_list[1:-1]))
    x = x_ref[:].astype(jnp.float32)
    acts, sigma, extras = _fwd_body(refs, x, sigma_only)
    if sigma_only:
        out_ref[:] = sigma[:, :OUT_COLS]  # col 0 live, padded cols are zero
    else:
        _, _, _, rgb = extras
        # out lanes: 0..2 rgb, 3 sigma, rest zero
        out = jnp.concatenate(
            [rgb[:, :3], sigma[:, :1],
             jnp.zeros((x.shape[0], OUT_COLS - 4), jnp.float32)], axis=1
        )
        out_ref[:] = out


def _zero_grefs(grefs):
    @pl.when(pl.program_id(0) == 0)
    def _():
        for k in _PKEYS:
            grefs[k][:] = jnp.zeros_like(grefs[k])


def _bwd_core(refs, grefs, x, g_out, act, extras, sigma_only, want_dx):
    """Shared dgrad/wgrad sweep for EVERY backward kernel (padded/raw/
    transposed x remat/stash — review round 3: five verbatim copies of this
    math let the (block x block) identity bug hide in one of them).

    ``act(i)`` returns the i-th trunk activation (i=0 is the embedded tile):
    an f32 recompute or a compute-dtype stash slice — relu masks are
    sign-exact and ``wgrad`` casts to the compute dtype either way, so the
    two sources are bit-equivalent (asserted by the stash-vs-remat tests).
    ``extras()`` returns ``(din, d, rgb)`` for rgb mode (``din`` f32).
    Returns the f32 input cotangent when ``want_dx`` (the padded pre-embedded
    kernel) else ``None`` (raw kernels: rays are data, dx is discarded)."""
    cdt = refs["w0"].dtype

    def wgrad(a, g):  # (BP, M)^T @ (BP, N) -> (M, N) contraction over rows
        return jax.lax.dot_general(
            a.astype(cdt), g.astype(cdt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    h_last = act(D)
    if sigma_only:
        # pad the OUT_COLS cotangent back to the CIN-wide head (col 0 live)
        g_sigma = jnp.concatenate(
            [g_out, jnp.zeros((x.shape[0], CIN - OUT_COLS), jnp.float32)],
            axis=1,
        )
        grefs["wsig"][:] += wgrad(h_last, g_sigma).astype(grefs["wsig"].dtype)
        grefs["bsig"][:] += jnp.sum(g_sigma, axis=0, keepdims=True)
        g_h = _mm(g_sigma.astype(cdt), refs["wsig"][:].T)
        g_x = jnp.zeros_like(x) if want_dx else None
    else:
        din, d, rgb = extras()
        g_rgball = jnp.concatenate(
            [g_out[:, :3], jnp.zeros((x.shape[0], CIN - 3), jnp.float32)],
            axis=1,
        )
        g_sigma = jnp.concatenate(
            [g_out[:, 3:4], jnp.zeros((x.shape[0], CIN - 1), jnp.float32)],
            axis=1,
        )
        g_rgbpre = g_rgball * rgb * (1.0 - rgb)
        grefs["wrgb"][:] += wgrad(d, g_rgbpre).astype(grefs["wrgb"].dtype)
        grefs["brgb"][:] += jnp.sum(g_rgbpre, axis=0, keepdims=True)
        g_d = _mm(g_rgbpre.astype(cdt), refs["wrgb"][:].T)
        # compare in f32: Mosaic cannot lower bf16 arith.cmpf on real TPU
        # (interpret mode accepts it — hardware-only failure; the cast is a
        # no-op for recompute activations, which are already f32)
        g_dpre = g_d * (d.astype(jnp.float32) > 0)
        grefs["wdir"][:] += wgrad(din, g_dpre).astype(grefs["wdir"].dtype)
        grefs["bdir"][:] += jnp.sum(g_dpre, axis=0, keepdims=True)
        g_din = _mm(g_dpre.astype(cdt), refs["wdir"][:].T)  # (BP, 384)
        g_fin = g_din[:, :W]
        grefs["wfin"][:] += wgrad(h_last, g_fin).astype(grefs["wfin"].dtype)
        grefs["bfin"][:] += jnp.sum(g_fin, axis=0, keepdims=True)
        grefs["wsig"][:] += wgrad(h_last, g_sigma).astype(grefs["wsig"].dtype)
        grefs["bsig"][:] += jnp.sum(g_sigma, axis=0, keepdims=True)
        g_h = _mm(g_fin.astype(cdt), refs["wfin"][:].T) + _mm(
            g_sigma.astype(cdt), refs["wsig"][:].T
        )
        g_x = g_din[:, W:] if want_dx else None

    for i in range(D - 1, -1, -1):
        h_out = act(i + 1)
        # f32 compare: see the rgb-head note (Mosaic bf16 cmpf)
        g_pre = g_h * (h_out.astype(jnp.float32) > 0)
        a_in = act(i)
        if i == SKIP:
            a_in = jnp.concatenate([x, a_in.astype(jnp.float32)], axis=1)
        grefs[f"w{i}"][:] += wgrad(a_in, g_pre).astype(grefs[f"w{i}"].dtype)
        grefs[f"b{i}"][:] += jnp.sum(g_pre, axis=0, keepdims=True)
        g_in = _mm(g_pre.astype(cdt), refs[f"w{i}"][:].T)
        if i == SKIP:
            if want_dx:
                g_x = g_x + g_in[:, :CIN]
            g_h = g_in[:, CIN:]
        else:
            g_h = g_in
    if want_dx:
        g_x = g_x + g_h  # acts[0] == x feeds layer 0
    return g_x


def _acts_accessors(acts, extras_tuple):
    """act()/extras() closures over a recompute (``_fwd_body`` output)."""
    def act(i):
        return acts[i]

    def extras():
        fin, din, d, rgb = extras_tuple
        return din, d, rgb

    return act, extras


def _stash_accessors(x, s_ref, refs):
    """act()/extras() closures over the HBM activation stash (see the stash
    layout note in the activation-stash section)."""
    cdt = refs["w0"].dtype

    def act(i):
        if i == 0:
            return x
        return s_ref[:, (i - 1) * W : i * W]

    def extras():
        fin = s_ref[:, _STASH_HC : _STASH_HC + W]
        d = s_ref[:, _STASH_HC + W : _STASH_RGB]
        # rgb recompute: same matmul (compute-dtype d x wrgb) the fwd ran
        rgb = jax.nn.sigmoid(
            _mm(d.astype(cdt), refs["wrgb"][:]) + refs["brgb"][:]
        )
        din = jnp.concatenate([fin[:].astype(jnp.float32), x], axis=1)
        return din, d, rgb

    return act, extras


def _bwd_kernel(*refs_list, sigma_only, n_blocks):
    x_ref, g_ref = refs_list[0], refs_list[1]
    refs = dict(zip(_PKEYS, refs_list[2 : 2 + len(_PKEYS)]))
    outs = refs_list[2 + len(_PKEYS):]
    dx_ref = outs[0]
    grefs = dict(zip(_PKEYS, outs[1:]))
    _zero_grefs(grefs)
    x = x_ref[:].astype(jnp.float32)
    g_out = g_ref[:].astype(jnp.float32)
    acts, sigma, extras_tuple = _fwd_body(refs, x, sigma_only)
    act, extras = _acts_accessors(acts, extras_tuple)
    dx_ref[:] = _bwd_core(refs, grefs, x, g_out, act, extras, sigma_only,
                          want_dx=True)


def _specs_for_params(packed):
    specs = []
    for k in _PKEYS:
        shape = packed[k].shape
        specs.append(
            pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    return specs


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _fused_apply_padded(packed, x, sigma_only: bool, block: int,
                        interpret: bool):
    return _fused_fwd_call(packed, x, sigma_only, block, interpret)


def _fused_fwd_call(packed, x, sigma_only, block, interpret):
    P = x.shape[0]
    grid = (P // block,)
    kernel = functools.partial(_fwd_kernel, sigma_only=sigma_only)
    out_cols = OUT_COLS
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, CIN), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *_specs_for_params(packed),
        ],
        out_specs=pl.BlockSpec((block, out_cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, out_cols), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * P * 600_000, bytes_accessed=4 * P * (CIN + 4),
            transcendentals=P,
        ),
        interpret=interpret,
    )(x, *[packed[k] for k in _PKEYS])


def _fused_fwd_rule(packed, x, sigma_only, block, interpret):
    out = _fused_fwd_call(packed, x, sigma_only, block, interpret)
    return out, (packed, x)


def _fused_bwd_rule(sigma_only, block, interpret, res, g):
    packed, x = res
    P = x.shape[0]
    grid = (P // block,)
    kernel = functools.partial(
        _bwd_kernel, sigma_only=sigma_only, n_blocks=grid[0]
    )
    out_shapes = [jax.ShapeDtypeStruct((P, CIN), jnp.float32)] + [
        jax.ShapeDtypeStruct(packed[k].shape, jnp.float32) for k in _PKEYS
    ]
    out_specs = [
        pl.BlockSpec((block, CIN), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ] + _specs_for_params(packed)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, CIN), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, OUT_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *_specs_for_params(packed),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=6 * P * 600_000, bytes_accessed=4 * P * 2 * CIN,
            transcendentals=P,
        ),
        interpret=interpret,
    )(x, g, *[packed[k] for k in _PKEYS])
    dx = outs[0]
    gpacked = {k: v.astype(packed[k].dtype)
               for k, v in zip(_PKEYS, outs[1:])}
    return gpacked, dx


_fused_apply_padded.defvjp(_fused_fwd_rule, _fused_bwd_rule)


def supports_fused(params) -> bool:
    """The kernel is specialized to the reference architecture."""
    try:
        layers = params["xyz_layers"]
        return (
            len(layers) == D
            and layers[0]["w"].shape == (CX, W)
            and layers[SKIP]["w"].shape == (W + CX, W)
            and params["dir_layer"]["w"].shape == (W + CD, WH)
        )
    except (KeyError, TypeError, IndexError):
        return False


# VMEM budget for the wide-inference path: packed weights + one block's
# activations must fit the ~16 MB scoped VMEM with headroom for Mosaic's
# working set.  W=512 weights pack to ~5.3 MB bf16; W=640 is the practical
# ceiling for resident weights.
_WIDE_WEIGHT_BUDGET = 9 << 20


def _packed_weight_bytes(w: int, itemsize: int = 2) -> int:
    wh = w // 2
    rows = CIN * w + (D - 2) * w * w + (CIN + w) * w  # trunk incl. skip
    rows += w * CIN + w * w + (w + CIN) * wh + wh * CIN  # heads
    return rows * itemsize


def supports_fused_wide(params, compute_dtype=jnp.bfloat16) -> bool:
    """--arch_width variants the fused FORWARD can run: reference topology
    (8 layers, skip@4, 63/27 in-channels, W//2 dir head) at a lane-aligned
    width whose resident weights fit the VMEM budget.  INFERENCE ONLY —
    the remat backward keeps all activations + f32 weight grads in VMEM,
    which scales W² and exceeds VMEM past W=256; differentiating the wide
    path fails loudly at compile instead of silently spilling.

    The weight budget is evaluated at the CALLER's ``compute_dtype``
    (ADVICE r4): resident weights are packed in that dtype, so a float32
    run doubles the bytes and must fall back to XLA at a smaller width
    instead of failing at compile on chip."""
    try:
        itemsize = jnp.dtype(compute_dtype).itemsize
        layers = params["xyz_layers"]
        w_ = int(layers[0]["w"].shape[1])
        return (
            len(layers) == D
            and w_ % 128 == 0
            and w_ != W
            and layers[0]["w"].shape == (CX, w_)
            and layers[SKIP]["w"].shape == (w_ + CX, w_)
            and params["dir_layer"]["w"].shape == (w_ + CD, w_ // 2)
            and _packed_weight_bytes(w_, itemsize) <= _WIDE_WEIGHT_BUDGET
        )
    except (KeyError, TypeError, IndexError):
        return False


def wide_block_for(w: int, compute_dtype=jnp.bfloat16) -> int:
    """Forward point-block for a wide trunk: largest block whose live
    activations (h + skip-concat + x, f32) fit beside the weights."""
    itemsize = jnp.dtype(compute_dtype).itemsize
    budget = (13 << 20) - _packed_weight_bytes(w, itemsize)
    for block in (2048, 1024, 512, 256, 128):
        if block * (CIN + 3 * w) * 4 <= budget:
            return block
    return 128


def fused_nerf_apply(
    params,
    x: jnp.ndarray,
    sigma_only: bool = False,
    compute_dtype=jnp.bfloat16,
    block: int = 512,
    interpret: bool = False,
):
    """Drop-in fused equivalent of ``models.nerf.nerf_apply`` (TPU only;
    ``interpret=True`` runs the same kernel on CPU for tests).

    Args:
      x: (P, 63) embedded xyz when ``sigma_only`` else (P, 90) embedded
         xyz+dir.  P is padded internally to a multiple of ``block``.
    Returns:
      (P, 1) sigma or (P, 4) rgb+sigma, float32.
    """
    P = x.shape[0]
    pad_cols = CIN - x.shape[1]
    x_t = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, pad_cols)))
    pad_rows = (-P) % block
    if pad_rows:
        x_t = jnp.pad(x_t, ((0, pad_rows), (0, 0)))
    packed = pack_params(params, compute_dtype)
    out = _fused_apply_padded(packed, x_t, sigma_only, block, interpret)
    out = out[:P]
    if sigma_only:
        return out[:, :1]
    return jnp.concatenate([out[:, :3], out[:, 3:4]], axis=1)


# ---------------------------------------------------------------------------
# Raw-input variant: positional encoding computed INSIDE the kernel.
#
# The XLA-side posenc is transcendental-heavy AND forces a (P, 128)-wide
# embedded input through HBM for every pass (fwd coarse/fine + bwd re-reads).
# Here the kernel takes raw (P, 8) [xyz | dir | pad] rows and builds the
# embedding in VMEM, where the VPU sin/cos pipeline overlaps the MXU matmuls.
#
# Internal channel layout (a permutation of the reference's embedding order;
# pack_params_raw permutes the affected weight ROWS to match, so outputs are
# identical):
#   cols 0-2   xyz raw          cols 3-5   dir raw
#   cols 8+3k+c        sin(2^k * xyz_c)   k<10
#   cols 8+30+3k+c     sin(2^k * dir_c)   k<4
#   cols 56+...        the matching cos block
# ---------------------------------------------------------------------------
_XYZ_F = 10
_DIR_F = 4
_SIN0 = 8
_COS0 = 56
_NSCALE = 48  # 30 xyz + 12 dir + 6 zero


def _raw_perm():
    """original embedded channel (0..89) -> internal tile column."""
    perm = np.zeros(CX + CD, np.int64)
    for c in range(3):
        perm[c] = c
        perm[CX + c] = 3 + c
    for k in range(_XYZ_F):
        for c in range(3):
            perm[3 + 6 * k + c] = _SIN0 + 3 * k + c
            perm[6 + 6 * k + c] = _COS0 + 3 * k + c
    for k in range(_DIR_F):
        for c in range(3):
            perm[CX + 3 + 6 * k + c] = _SIN0 + 30 + 3 * k + c
            perm[CX + 6 + 6 * k + c] = _COS0 + 30 + 3 * k + c
    return perm


_RAW_PERM = _raw_perm()
# per-scaled-column multiply factors (exact powers of two; VPU elementwise)
_SCALE_FACTORS = np.zeros((1, _NSCALE), np.float32)
for _k in range(_XYZ_F):
    _SCALE_FACTORS[0, 3 * _k : 3 * _k + 3] = 2.0 ** _k
for _k in range(_DIR_F):
    _SCALE_FACTORS[0, 30 + 3 * _k : 30 + 3 * _k + 3] = 2.0 ** _k


def pack_params_raw(params, compute_dtype=jnp.bfloat16):
    """Like ``pack_params`` but weight rows permuted to the internal raw
    layout (W0, the skip layer's x-rows, and the dir head's dir-rows)."""
    p = pack_params(params, compute_dtype)
    xyz_new = _RAW_PERM[:CX]
    dir_new = _RAW_PERM[CX:] 

    def permute_rows(w, orig_rows_new_pos, n_rows):
        out = jnp.zeros((n_rows, w.shape[1]), w.dtype)
        return out.at[orig_rows_new_pos].set(w)

    # w0: rows 0..62 live at permuted positions
    p["w0"] = permute_rows(p["w0"][:CX], xyz_new, CIN)
    # skip layer: first CIN rows are the x-tile part
    skip = p[f"w{SKIP}"]
    top = permute_rows(skip[:CX], xyz_new, CIN)
    p[f"w{SKIP}"] = jnp.concatenate([top, skip[CIN:]], axis=0)
    # dir head: rows W.. are the x-tile part (live dir rows at CX..CX+CD)
    wdir = p["wdir"]
    dirpart = permute_rows(wdir[W + CX : W + CX + CD], dir_new, CIN)
    p["wdir"] = jnp.concatenate([wdir[:W], dirpart], axis=0)
    return p


def _embed_tile(x_raw):
    """(BP, 8) raw -> (BP, CIN) internal-layout embedded tile.

    VPU-lean construction (the embed is serialized ahead of the MXU
    matmuls, so every vector op here is on the critical path — measured
    ~8.4 ns/pt with the naive concat+scale+sin+cos build, ~55% of the
    whole forward kernel):
      * the 14 lane-copy concat + power-of-two scaling become ONE tiny
        MXU matmul against a (8, 96) spread matrix whose entries are
        2^k one-hots (built from an in-kernel iota — pallas kernels may
        not capture host constants).  HIGHEST precision makes the
        products exact: bf16x3 splitting is lossless when one operand is
        a power of two, so the angles are bit-identical to elementwise
        ``x * 2^k``.
      * sin AND cos come from a single 96-lane ``sin`` via the phase
        trick ``cos(t) = sin(t + pi/2)`` (fp32-pi/2 rounding error
        ~4e-8, far below fp32 sin's own error on these arguments).
    The column layout is unchanged: cols [_COS0-6.._COS0) hold the dir
    pad channels whose angle is 0, giving sin->0 / cos->1 exactly as
    before (their weight rows are zero either way)."""
    bp = x_raw.shape[0]
    two = 2 * _NSCALE
    col = jax.lax.broadcasted_iota(jnp.int32, (RAW_COLS, two), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (RAW_COLS, two), 0)
    c = col % _NSCALE
    is_dir = c >= 30
    k = jnp.where(is_dir, (c - 30) // 3, c // 3)
    ch = jnp.where(is_dir, 3 + (c - 30) % 3, c % 3)
    live = (row == ch) & (c < 42)
    spread = jnp.where(live, jnp.exp2(k.astype(jnp.float32)), 0.0)
    phase = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, two), 1) >= _NSCALE,
        jnp.float32(np.pi / 2), 0.0,
    )
    ang = jax.lax.dot_general(
        x_raw, spread, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ) + phase
    return jnp.concatenate(
        [x_raw, jnp.sin(ang), jnp.zeros((bp, CIN - RAW_COLS - two), x_raw.dtype)],
        axis=1,
    )


def _fwd_kernel_raw(*refs_list, sigma_only):
    x_ref = refs_list[0]
    out_ref = refs_list[-1]
    refs = dict(zip(_PKEYS, refs_list[1:-1]))
    x = _embed_tile(x_ref[:].astype(jnp.float32))
    acts, sigma, extras = _fwd_body(refs, x, sigma_only)
    if sigma_only:
        out_ref[:] = sigma[:, :OUT_COLS]
    else:
        _, _, _, rgb = extras
        out_ref[:] = jnp.concatenate(
            [rgb[:, :3], sigma[:, :1],
             jnp.zeros((x.shape[0], OUT_COLS - 4), jnp.float32)], axis=1
        )


def _bwd_kernel_raw(*refs_list, sigma_only, n_blocks):
    # raw-input remat variant: in-kernel embed recompute, zero dx (rays are
    # data — the renderer discards the input cotangent)
    x_ref, g_ref = refs_list[0], refs_list[1]
    refs = dict(zip(_PKEYS, refs_list[2 : 2 + len(_PKEYS)]))
    outs = refs_list[2 + len(_PKEYS):]
    dx_ref = outs[0]
    grefs = dict(zip(_PKEYS, outs[1:]))
    _zero_grefs(grefs)
    x = _embed_tile(x_ref[:].astype(jnp.float32))
    g_out = g_ref[:].astype(jnp.float32)
    acts, sigma, extras_tuple = _fwd_body(refs, x, sigma_only)
    act, extras = _acts_accessors(acts, extras_tuple)
    _bwd_core(refs, grefs, x, g_out, act, extras, sigma_only, want_dx=False)
    dx_ref[:] = jnp.zeros_like(dx_ref)


RAW_COLS = 8


# ---------------------------------------------------------------------------
# Activation-stash backward ("checkpoint to HBM" instead of remat).
#
# The remat backward above re-runs the whole forward chain in VMEM before the
# gradient sweep — ~1/3 of the backward's FLOPs at this architecture.  Here
# the VJP-forward kernel additionally streams the activations the backward
# needs to HBM (bf16, overlapped with compute by the Pallas grid pipeline),
# and the backward kernel reads them back instead of recomputing:
#   cols [0, D*W)            h1..h8 (post-relu trunk activations)
#   cols [D*W, D*W+W)        fin  (xyz_final output)        — rgb mode only
#   cols [D*W+W, D*W+W+WH)   d    (dir-head relu output)    — rgb mode only
# x (the embedded tile) is recomputed from the 8 raw input columns (~1 tiny
# matmul + one 96-lane sin — far cheaper than stashing 128 lanes), and rgb
# is recomputed from d (one 128x128 matmul).  The stash dtype equals the
# compute dtype, so wgrad operands are bit-identical to the remat kernel's
# post-cast operands; only the relu masks see rounded values (sign-exact for
# every normal float).  The PRIMAL forward (inference/eval) never writes a
# stash — only the custom-VJP forward pays for it.
# ---------------------------------------------------------------------------
_STASH_HC = D * W              # 2048: trunk activations
_STASH_RGB = _STASH_HC + W + WH  # 2432: + fin + d


def _stash_cols(sigma_only):
    return _STASH_HC if sigma_only else _STASH_RGB


def _fwd_kernel_raw_stash(*refs_list, sigma_only):
    x_ref = refs_list[0]
    out_ref, stash_ref = refs_list[-2], refs_list[-1]
    refs = dict(zip(_PKEYS, refs_list[1:-2]))
    x = _embed_tile(x_ref[:].astype(jnp.float32))
    acts, sigma, extras = _fwd_body(refs, x, sigma_only)
    sdt = stash_ref.dtype
    pieces = [a.astype(sdt) for a in acts[1:]]
    if sigma_only:
        out_ref[:] = sigma[:, :OUT_COLS]
    else:
        fin, din, d, rgb = extras
        pieces += [fin.astype(sdt), d.astype(sdt)]
        out_ref[:] = jnp.concatenate(
            [rgb[:, :3], sigma[:, :1],
             jnp.zeros((x.shape[0], OUT_COLS - 4), jnp.float32)], axis=1
        )
    stash_ref[:] = jnp.concatenate(pieces, axis=1)


def _bwd_kernel_raw_stash(*refs_list, sigma_only):
    x_ref, g_ref, s_ref = refs_list[0], refs_list[1], refs_list[2]
    refs = dict(zip(_PKEYS, refs_list[3 : 3 + len(_PKEYS)]))
    outs = refs_list[3 + len(_PKEYS):]
    dx_ref = outs[0]
    grefs = dict(zip(_PKEYS, outs[1:]))
    _zero_grefs(grefs)
    x = _embed_tile(x_ref[:].astype(jnp.float32))
    g_out = g_ref[:].astype(jnp.float32)
    act, extras = _stash_accessors(x, s_ref, refs)
    _bwd_core(refs, grefs, x, g_out, act, extras, sigma_only, want_dx=False)
    dx_ref[:] = jnp.zeros_like(dx_ref)


def _fused_raw_stash_fwd_call(packed, x_raw, sigma_only, block, interpret):
    P = x_raw.shape[0]
    grid = (P // block,)
    sc = _stash_cols(sigma_only)
    sdt = packed["w0"].dtype
    kernel = functools.partial(_fwd_kernel_raw_stash, sigma_only=sigma_only)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, RAW_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *_specs_for_params(packed),
        ],
        out_specs=[
            pl.BlockSpec((block, OUT_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, sc), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P, OUT_COLS), jnp.float32),
            jax.ShapeDtypeStruct((P, sc), sdt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * P * 600_000,
            bytes_accessed=4 * P * (RAW_COLS + 4)
            + P * sc * np.dtype(sdt).itemsize,
            transcendentals=2 * P * _NSCALE,
        ),
        interpret=interpret,
    )(x_raw, *[packed[k] for k in _PKEYS])


def _fused_raw_stash_bwd_call(packed, x_raw, stash, g, sigma_only, block,
                              interpret):
    P = x_raw.shape[0]
    grid = (P // block,)
    sc = _stash_cols(sigma_only)
    kernel = functools.partial(_bwd_kernel_raw_stash, sigma_only=sigma_only)
    out_shapes = [jax.ShapeDtypeStruct((P, RAW_COLS), jnp.float32)] + [
        jax.ShapeDtypeStruct(packed[k].shape, jnp.float32) for k in _PKEYS
    ]
    out_specs = [
        pl.BlockSpec((block, RAW_COLS), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
    ] + _specs_for_params(packed)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, RAW_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, OUT_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, sc), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *_specs_for_params(packed),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=4 * P * 600_000,
            bytes_accessed=2 * P * sc + 4 * P * 2 * CIN,
            transcendentals=2 * P * _NSCALE,
        ),
        interpret=interpret,
    )(x_raw, g, stash, *[packed[k] for k in _PKEYS])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _fused_apply_raw_stash(packed, x_raw, sigma_only: bool, blocks,
                           interpret: bool):
    # primal path: the ordinary (stashless) forward at its own block size
    return _fused_raw_fwd_call(packed, x_raw, sigma_only, blocks[0],
                               interpret)


def _fused_raw_stash_fwd_rule(packed, x_raw, sigma_only, blocks, interpret):
    out, stash = _fused_raw_stash_fwd_call(
        packed, x_raw, sigma_only, blocks[1], interpret
    )
    return out, (packed, x_raw, stash)


def _fused_raw_stash_bwd_rule(sigma_only, blocks, interpret, res, g):
    packed, x_raw, stash = res
    outs = _fused_raw_stash_bwd_call(
        packed, x_raw, stash, g, sigma_only, blocks[2], interpret
    )
    gpacked = {k: v.astype(packed[k].dtype)
               for k, v in zip(_PKEYS, outs[1:])}
    return gpacked, outs[0]


_fused_apply_raw_stash.defvjp(_fused_raw_stash_fwd_rule,
                              _fused_raw_stash_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _fused_apply_raw(packed, x_raw, sigma_only: bool, block,
                     interpret: bool):
    return _fused_raw_fwd_call(packed, x_raw, sigma_only, block, interpret)


def _blocks(block):
    """block may be an int or a (fwd_block, bwd_block) pair."""
    if isinstance(block, tuple):
        return block
    return block, block


def _fused_raw_fwd_call(packed, x_raw, sigma_only, block, interpret):
    block, _ = _blocks(block)
    P = x_raw.shape[0]
    grid = (P // block,)
    kernel = functools.partial(_fwd_kernel_raw, sigma_only=sigma_only)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, RAW_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *_specs_for_params(packed),
        ],
        out_specs=pl.BlockSpec((block, OUT_COLS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, OUT_COLS), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * P * 600_000, bytes_accessed=4 * P * (RAW_COLS + 4),
            transcendentals=2 * P * _NSCALE,
        ),
        interpret=interpret,
    )(x_raw, *[packed[k] for k in _PKEYS])


def _fused_raw_fwd_rule(packed, x_raw, sigma_only, block, interpret):
    return (
        _fused_raw_fwd_call(packed, x_raw, sigma_only, block, interpret),
        (packed, x_raw),
    )


def _fused_raw_bwd_rule(sigma_only, block, interpret, res, g):
    packed, x_raw = res
    _, block = _blocks(block)
    P = x_raw.shape[0]
    grid = (P // block,)
    kernel = functools.partial(
        _bwd_kernel_raw, sigma_only=sigma_only, n_blocks=grid[0]
    )
    out_shapes = [jax.ShapeDtypeStruct((P, RAW_COLS), jnp.float32)] + [
        jax.ShapeDtypeStruct(packed[k].shape, jnp.float32) for k in _PKEYS
    ]
    out_specs = [
        pl.BlockSpec((block, RAW_COLS), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
    ] + _specs_for_params(packed)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, RAW_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, OUT_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *_specs_for_params(packed),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=6 * P * 600_000, bytes_accessed=4 * P * 2 * CIN,
            transcendentals=2 * P * _NSCALE,
        ),
        interpret=interpret,
    )(x_raw, g, *[packed[k] for k in _PKEYS])
    gpacked = {k: v.astype(packed[k].dtype)
               for k, v in zip(_PKEYS, outs[1:])}
    return gpacked, outs[0]


_fused_apply_raw.defvjp(_fused_raw_fwd_rule, _fused_raw_bwd_rule)


# ---------------------------------------------------------------------------
# Transposed (packed-lane) ray IO: (8, P) channel-major input/output.
#
# The row-major (P, 8) IO arrays above are lane-padded 16x to 128 by the TPU
# tiled layout (module docstring) — 512 B/pt of HBM for 32 B of data, which
# is what capped whole-image render chunks at 32768 rays (VERDICT round-2
# weak #3).  A (8, P) channel-major array tiles EXACTLY ((8, 128) f32 tiles,
# zero padding), so input+output cost 64 B/pt instead of 1 KB/pt.
#
# In-kernel, the transposed block never materializes a (block, 8) transpose:
#   * input: the embed's spread matmul simply contracts the SUBLANE dim —
#     ``dot_general((8, BP), (8, 104))`` with an identity block prepended to
#     the spread matrix so the raw columns ride the same MXU pass;
#   * output: one (8, 8) identity matmul emits the (8, BP) transposed block
#     (exact: one-hot rows, f32 HIGHEST).
# Everything between — the whole MLP — is unchanged and shares ``_fwd_body``
# and the packed-params layout with the row-major kernels.
# ---------------------------------------------------------------------------
def _embed_tile_t(x_t):
    """(RAW_COLS, BP) channel-major raw block -> (BP, CIN) embedded tile.

    Identical column layout and numerics to ``_embed_tile`` (same
    power-of-two spread entries, same single 96-lane sin with the
    cos(t)=sin(t+pi/2) phase trick); the only difference is an [I8 | spread]
    extended matrix so the raw-copy lanes come out of the same contraction
    that de-transposes the input."""
    bp = x_t.shape[1]
    two = 2 * _NSCALE
    ext = RAW_COLS + two
    col = jax.lax.broadcasted_iota(jnp.int32, (RAW_COLS, ext), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (RAW_COLS, ext), 0)
    # identity block for the raw columns
    ident = (col == row) & (col < RAW_COLS)
    # scale block (columns RAW_COLS..): same formulas as _embed_tile
    c = (col - RAW_COLS) % _NSCALE
    is_dir = c >= 30
    k = jnp.where(is_dir, (c - 30) // 3, c // 3)
    ch = jnp.where(is_dir, 3 + (c - 30) % 3, c % 3)
    live = (row == ch) & (c < 42) & (col >= RAW_COLS)
    spread = jnp.where(
        ident, 1.0, jnp.where(live, jnp.exp2(k.astype(jnp.float32)), 0.0)
    )
    ccol = jax.lax.broadcasted_iota(jnp.int32, (1, ext), 1)
    phase = jnp.where(
        ccol >= RAW_COLS + _NSCALE, jnp.float32(np.pi / 2), 0.0
    )
    pre = jax.lax.dot_general(
        x_t, spread, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    emb = jnp.where(ccol < RAW_COLS, pre, jnp.sin(pre + phase))
    return jnp.concatenate(
        [emb, jnp.zeros((bp, CIN - ext), jnp.float32)], axis=1
    )


def _eye8(n):
    return (
        jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    ).astype(jnp.float32)


def _t8(a):
    """(BP, 8) -> (8, BP) via an exact one-hot matmul (f32 HIGHEST: the
    bf16x3 splitting is lossless against power-of-two operands, so this is
    a bit-exact transpose on the MXU — no Mosaic relayout).  The identity
    always lives on the NARROW (8-wide) dim."""
    assert a.shape[1] <= 8, (
        f"_t8 eye would be {a.shape[1]}x{a.shape[1]} — use _t8_back for "
        "narrow-FIRST-dim blocks (the round-3 -2%-train artifact)")
    return jax.lax.dot_general(
        _eye8(a.shape[1]), a, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _t8_back(a):
    """(8, BP) -> (BP, 8), same exact one-hot trick with the (8, 8) eye —
    NOT ``_t8``, whose eye would be (BP, BP) here (2.4 MB of VMEM and 96x
    the FLOPs at the default 768-point backward block; review round 3)."""
    return jax.lax.dot_general(
        a, _eye8(a.shape[0]), (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _fwd_kernel_raw_t(*refs_list, sigma_only):
    x_ref = refs_list[0]
    out_ref = refs_list[-1]
    refs = dict(zip(_PKEYS, refs_list[1:-1]))
    x = _embed_tile_t(x_ref[:].astype(jnp.float32))
    acts, sigma, extras = _fwd_body(refs, x, sigma_only)
    if sigma_only:
        out_ref[:] = _t8(sigma[:, :OUT_COLS])
    else:
        _, _, _, rgb = extras
        out = jnp.concatenate(
            [rgb[:, :3], sigma[:, :1],
             jnp.zeros((x.shape[0], OUT_COLS - 4), jnp.float32)], axis=1
        )
        out_ref[:] = _t8(out)


def _fwd_kernel_raw_stash_t(*refs_list, sigma_only):
    x_ref = refs_list[0]
    out_ref, stash_ref = refs_list[-2], refs_list[-1]
    refs = dict(zip(_PKEYS, refs_list[1:-2]))
    x = _embed_tile_t(x_ref[:].astype(jnp.float32))
    acts, sigma, extras = _fwd_body(refs, x, sigma_only)
    sdt = stash_ref.dtype
    pieces = [a.astype(sdt) for a in acts[1:]]
    if sigma_only:
        out_ref[:] = _t8(sigma[:, :OUT_COLS])
    else:
        fin, din, d, rgb = extras
        pieces += [fin.astype(sdt), d.astype(sdt)]
        out_ref[:] = _t8(jnp.concatenate(
            [rgb[:, :3], sigma[:, :1],
             jnp.zeros((x.shape[0], OUT_COLS - 4), jnp.float32)], axis=1
        ))
    stash_ref[:] = jnp.concatenate(pieces, axis=1)


def _bwd_kernel_raw_stash_t(*refs_list, sigma_only):
    # transposed-IO stash variant: (8, block) x/g/dx boundary blocks
    x_ref, g_ref, s_ref = refs_list[0], refs_list[1], refs_list[2]
    refs = dict(zip(_PKEYS, refs_list[3 : 3 + len(_PKEYS)]))
    outs = refs_list[3 + len(_PKEYS):]
    dx_ref = outs[0]
    grefs = dict(zip(_PKEYS, outs[1:]))
    _zero_grefs(grefs)
    x = _embed_tile_t(x_ref[:].astype(jnp.float32))
    g_out = _t8_back(g_ref[:].astype(jnp.float32))
    act, extras = _stash_accessors(x, s_ref, refs)
    _bwd_core(refs, grefs, x, g_out, act, extras, sigma_only, want_dx=False)
    dx_ref[:] = jnp.zeros_like(dx_ref)


def _bwd_kernel_raw_t(*refs_list, sigma_only):
    # transposed-IO remat variant
    x_ref, g_ref = refs_list[0], refs_list[1]
    refs = dict(zip(_PKEYS, refs_list[2 : 2 + len(_PKEYS)]))
    outs = refs_list[2 + len(_PKEYS):]
    dx_ref = outs[0]
    grefs = dict(zip(_PKEYS, outs[1:]))
    _zero_grefs(grefs)
    x = _embed_tile_t(x_ref[:].astype(jnp.float32))
    g_out = _t8_back(g_ref[:].astype(jnp.float32))
    acts, sigma, extras_tuple = _fwd_body(refs, x, sigma_only)
    act, extras = _acts_accessors(acts, extras_tuple)
    _bwd_core(refs, grefs, x, g_out, act, extras, sigma_only, want_dx=False)
    dx_ref[:] = jnp.zeros_like(dx_ref)


def _raw_t_fwd_call(packed, x_t, sigma_only, block, interpret):
    P = x_t.shape[1]
    grid = (P // block,)
    kernel = functools.partial(_fwd_kernel_raw_t, sigma_only=sigma_only)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((RAW_COLS, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            *_specs_for_params(packed),
        ],
        out_specs=pl.BlockSpec((OUT_COLS, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((OUT_COLS, P), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * P * 600_000, bytes_accessed=4 * P * (RAW_COLS + OUT_COLS),
            transcendentals=2 * P * _NSCALE,
        ),
        interpret=interpret,
    )(x_t, *[packed[k] for k in _PKEYS])


def _raw_t_stash_fwd_call(packed, x_t, sigma_only, block, interpret):
    P = x_t.shape[1]
    grid = (P // block,)
    sc = _stash_cols(sigma_only)
    sdt = packed["w0"].dtype
    kernel = functools.partial(_fwd_kernel_raw_stash_t, sigma_only=sigma_only)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((RAW_COLS, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            *_specs_for_params(packed),
        ],
        out_specs=[
            pl.BlockSpec((OUT_COLS, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, sc), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((OUT_COLS, P), jnp.float32),
            jax.ShapeDtypeStruct((P, sc), sdt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * P * 600_000,
            bytes_accessed=4 * P * (RAW_COLS + OUT_COLS)
            + P * sc * np.dtype(sdt).itemsize,
            transcendentals=2 * P * _NSCALE,
        ),
        interpret=interpret,
    )(x_t, *[packed[k] for k in _PKEYS])


def _raw_t_bwd_call(packed, x_t, g, sigma_only, block, interpret, stash=None):
    P = x_t.shape[1]
    grid = (P // block,)
    out_shapes = [jax.ShapeDtypeStruct((RAW_COLS, P), jnp.float32)] + [
        jax.ShapeDtypeStruct(packed[k].shape, jnp.float32) for k in _PKEYS
    ]
    out_specs = [
        pl.BlockSpec((RAW_COLS, block), lambda i: (0, i),
                     memory_space=pltpu.VMEM)
    ] + _specs_for_params(packed)
    in_specs = [
        pl.BlockSpec((RAW_COLS, block), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((OUT_COLS, block), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    args = [x_t, g]
    if stash is not None:
        sc = _stash_cols(sigma_only)
        in_specs.append(
            pl.BlockSpec((block, sc), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(stash)
        kernel = functools.partial(
            _bwd_kernel_raw_stash_t, sigma_only=sigma_only
        )
        extra_bytes = 2 * P * sc
    else:
        kernel = functools.partial(_bwd_kernel_raw_t, sigma_only=sigma_only)
        extra_bytes = 0
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs + _specs_for_params(packed),
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=(4 if stash is not None else 6) * P * 600_000,
            bytes_accessed=4 * P * 2 * RAW_COLS + extra_bytes,
            transcendentals=2 * P * _NSCALE,
        ),
        interpret=interpret,
    )(*args, *[packed[k] for k in _PKEYS])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _fused_apply_raw_t(packed, x_t, sigma_only: bool, blocks, interpret: bool):
    # blocks = (fwd, vjp_fwd_or_None, bwd); primal forward is stashless
    return _raw_t_fwd_call(packed, x_t, sigma_only, blocks[0], interpret)


def _fused_raw_t_fwd_rule(packed, x_t, sigma_only, blocks, interpret):
    if blocks[1] is None:  # remat backward
        out = _raw_t_fwd_call(packed, x_t, sigma_only, blocks[0], interpret)
        return out, (packed, x_t, None)
    out, stash = _raw_t_stash_fwd_call(
        packed, x_t, sigma_only, blocks[1], interpret
    )
    return out, (packed, x_t, stash)


def _fused_raw_t_bwd_rule(sigma_only, blocks, interpret, res, g):
    packed, x_t, stash = res
    outs = _raw_t_bwd_call(
        packed, x_t, g, sigma_only, blocks[2], interpret, stash=stash
    )
    gpacked = {k: v.astype(packed[k].dtype)
               for k, v in zip(_PKEYS, outs[1:])}
    return gpacked, outs[0]


_fused_apply_raw_t.defvjp(_fused_raw_t_fwd_rule, _fused_raw_t_bwd_rule)


def fused_nerf_apply_raw_t(
    params,
    x_rawT: jnp.ndarray,  # (RAW_COLS, P): rows [xyz(3) | dir(3) | zero(2)]
    sigma_only: bool = False,
    compute_dtype=jnp.bfloat16,
    block=(2048, 768),
    interpret: bool = False,
    stash_blocks="auto",
):
    """Channel-major fused MLP: (8, P) in -> (8, P) out, rows
    [rgb(3) | sigma(1) | zero(4)] (sigma-only: row 0).  Same numerics as
    ``fused_nerf_apply_raw``; the caller owns the channel-major layout (the
    renderer builds it fused with ray generation, so no (P, small) array
    ever hits HBM)."""
    P = x_rawT.shape[1]
    if stash_blocks == "auto":
        stash_blocks = _auto_stash_blocks(P, compute_dtype)
    bf, bb = _blocks(block)
    if stash_blocks is not None:
        blocks = (bf, stash_blocks[0], stash_blocks[1])
    else:
        blocks = (bf, None, bb)
    pad_to = 1
    for b in blocks:
        if b:
            pad_to = pad_to * b // np.gcd(pad_to, b)
    pad_cols = (-P) % pad_to
    if pad_cols:
        x_rawT = jnp.pad(x_rawT, ((0, 0), (0, pad_cols)))
    packed = pack_params_raw(params, compute_dtype)
    out = _fused_apply_raw_t(packed, x_rawT, sigma_only, blocks, interpret)
    return out[:, :P]


# Hardware-probed default for the activation-stash VJP (scripts/
# kernel_probe.py, v5e): fwd+bwd 30.1 ms at the 786k-pt fine pass vs
# 34.8 ms for the remat backward — the stash write costs ~1 ms in the
# VJP forward and the backward becomes pure dgrad+wgrad compute.
DEFAULT_STASH_BLOCKS = (768, 768)
# f32 compute dtype doubles every VMEM-resident block (weights, stash,
# activations): the (768, 768) default measured 16.89 MB of scoped VMEM in
# the stash backward — past the 16 MB limit, a hard compile error (observed
# on hardware, round 3).  Halve the blocks so the f32 path compiles; bf16
# remains the production dtype.
DEFAULT_STASH_BLOCKS_F32 = (384, 384)
# The stash is (P, 2432) compute-dtype in HBM (~4.9 KB/pt bf16) and both
# the coarse and fine passes' stashes are live across the loss — past this
# point count "auto" falls back to the remat backward instead of OOMing
# a 16 GB chip (e.g. batch 16384 x 192 fine samples = 3.1M pts = 14 GB).
STASH_MAX_POINTS = 2_000_000


def _auto_stash_blocks(P, compute_dtype):
    if P > STASH_MAX_POINTS:
        return None
    if np.dtype(compute_dtype).itemsize >= 4:
        return DEFAULT_STASH_BLOCKS_F32
    return DEFAULT_STASH_BLOCKS


def fused_nerf_apply_raw(
    params,
    xyz: jnp.ndarray,  # (P, 3) RAW positions
    dirs=None,  # (P, 3) raw dirs, or None for sigma_only
    compute_dtype=jnp.bfloat16,
    block=(2048, 768),  # (fwd, bwd) point-block sizes; bwd is VMEM-heavier
    interpret: bool = False,
    stash_blocks="auto",  # (vjp_fwd, bwd) -> activation-stash backward
):
    """Fused MLP with IN-KERNEL positional encoding (see layout note above).
    Same outputs as ``posenc + nerf_apply``; input cotangents are zero
    (rays are data — the renderer never differentiates w.r.t. them).

    ``stash_blocks=(vjp_fwd_block, bwd_block)`` selects the activation-stash
    backward (no remat): the differentiated forward also writes a
    compute-dtype activation stash to HBM and the backward reads it back.
    The primal forward (inference) is unaffected and uses ``block[0]``.
    Default ``"auto"`` = ``DEFAULT_STASH_BLOCKS``; pass ``None`` for the
    remat backward.
    """
    P = xyz.shape[0]
    sigma_only = dirs is None
    if stash_blocks == "auto":
        stash_blocks = _auto_stash_blocks(P, compute_dtype)
    parts = [xyz.astype(jnp.float32)]
    parts.append(
        jnp.zeros((P, 3), jnp.float32) if sigma_only else dirs.astype(jnp.float32)
    )
    parts.append(jnp.zeros((P, RAW_COLS - 6), jnp.float32))
    x_raw = jnp.concatenate(parts, axis=1)
    bf, bb = _blocks(block)
    all_blocks = [bf, bb] + (list(stash_blocks) if stash_blocks else [])
    pad_to = 1
    for b in all_blocks:
        pad_to = pad_to * b // np.gcd(pad_to, b)
    pad_rows = (-P) % pad_to
    if pad_rows:
        x_raw = jnp.pad(x_raw, ((0, pad_rows), (0, 0)))
    packed = pack_params_raw(params, compute_dtype)
    if stash_blocks is not None:
        out = _fused_apply_raw_stash(
            packed, x_raw, sigma_only,
            (bf, stash_blocks[0], stash_blocks[1]), interpret,
        )[:P]
    else:
        out = _fused_apply_raw(packed, x_raw, sigma_only, block, interpret)[:P]
    if sigma_only:
        return out[:, :1]
    return jnp.concatenate([out[:, :3], out[:, 3:4]], axis=1)

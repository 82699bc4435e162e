"""Typed experiment configuration.

One dataclass replaces the reference's shared argparse namespace
(``opt.py:3-119`` plus the per-tool parsers in ``eval.py:20-55`` and
``extract_color_mesh.py:22-64``).  Every reference flag has a field here with
the same name and default; ``from_args`` builds one from an argparse-style
CLI so the reference's command lines keep working.  The config is serialized
into the run directory as JSON for experiment tracking.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass
from typing import List, Optional, Tuple


@dataclass
class Config:
    # --- dataset (opt.py:6-16) ---
    root_dir: str = ""
    dataset_name: str = "blender"
    img_wh: Tuple[int, int] = (128, 128)
    spheric_poses: bool = False

    # --- sampling (opt.py:18-27) ---
    N_samples: int = 64
    N_importance: int = 128
    use_disp: bool = False
    perturb: float = 1.0
    noise_std: float = 1.0

    # --- loss (opt.py:29-31) ---
    loss_type: str = "mse"

    # --- batching / schedule (opt.py:33-40) ---
    batch_size: int = 1024
    chunk: int = 32 * 1024
    num_epochs: int = 16
    num_gpus: Tuple[int, ...] = (0,)  # kept for CLI parity; chips come from jax

    # --- checkpoints (opt.py:42-45) ---
    ckpt_path: Optional[str] = None
    prefixes_to_ignore: Tuple[str, ...] = ("loss",)

    # --- optimizer / scheduler (opt.py:47-73) ---
    optimizer: str = "adam"
    lr: float = 5e-4
    momentum: float = 0.9
    weight_decay: float = 0.0
    lr_scheduler: str = "steplr"
    warmup_multiplier: float = 1.0
    warmup_epochs: int = 0
    decay_step: Tuple[int, ...] = (20,)
    decay_gamma: float = 0.1
    poly_exp: float = 0.9

    # --- shadow-specific (opt.py:75-116) ---
    sm_weight: float = 1.0
    rgb_weight: float = 1.0
    exp_name: str = "exp"
    black_and_white_test: bool = False
    white_pix: float = -1.0
    num_sanity_val_steps: int = 1
    Light_N_importance: int = 0
    sample_light_depth_every: int = 1
    grad_on_light: bool = False
    shadow_method: str = "shadow_method_2"
    coords_trans: bool = False
    coords_trans2: bool = False
    blur: int = -1
    max_images: int = 100

    # --- framework extensions (no reference equivalent) ---
    seed: int = 0
    compute_dtype: str = "float32"  # 'bfloat16' for max MXU throughput
    # global-norm gradient clipping (0 = off, the reference default: its
    # Lightning Trainer leaves gradient_clip_val at 0).  Framework
    # extension for shadow_method_2's reference-documented NaN fragility
    # (efficient_shadow_mapping.py:110-112) — see training/optim.py.
    grad_clip: float = 0.0
    # MLP trunk width W (reference models/nerf.py:25 fixes W=256).  Widths
    # 1024-2048 run the MXU at ~175 TF/s vs ~107 at 256 (docs/results.md
    # width ceiling) — this flag unlocks that tier for research/serving
    # variants.  Non-256 widths route through the XLA path (the fused
    # Pallas kernel is specialized to the reference architecture); every
    # default and parity surface is unchanged at 256.
    arch_width: int = 256
    # Blender near/far: the fork hardcodes 1/200 behind an interactive gate
    # (datasets/blender.py:40-44); upstream uses 2/6.  Configurable here.
    blender_near: float = 2.0
    blender_far: float = 6.0
    white_back: Optional[bool] = None  # None -> dataset default
    ckpt_dir: str = "ckpts"
    log_dir: str = "logs"
    val_every_n_epochs: int = 1
    num_devices: Optional[int] = None  # None -> all local devices
    multihost: bool = False  # call jax.distributed.initialize() at startup
    data_device_resident: bool = True  # keep the ray buffer in HBM
    # host-streaming mode: optimizer steps per device dispatch.  16 was the
    # round-3 default; swept 8/16/32/64 on hardware in round 5 (results.md)
    stream_slab_steps: int = 16
    # shadow trainers (efficient_sm / rgb_sm): cap on optimizer steps per
    # device program (0 = whole epoch in one program).  The 128² recipes'
    # per-step differentiable light render makes whole-epoch programs
    # minutes long — past what the remote-tunneled worker survives
    # (results.md round 5); sliced dispatches reproduce the monolithic
    # trajectory exactly.
    max_steps_per_dispatch: int = 0
    # pod-scale host data pipeline (SURVEY.md §7): each host loads only its
    # own image subset (frames[process_index::process_count]) and the global
    # buffer is assembled from per-process shards — no host ever holds the
    # full all-rays buffer. Single-process: no-op.
    per_host_data: bool = False
    # per-epoch GLOBAL reshuffle of the device-resident ray buffer
    # (DistributedSampler semantics, reference train.py:89-94 via Lightning).
    # Off by default: fixed shards + pmean converge equivalently on normal
    # datasets with zero per-epoch reshard traffic; the measured escape hatch
    # (tests/test_shard_shuffle_semantics.py, ~1.5x loss gap on a worst-case
    # fewer-views-than-chips skew) for view-skewed data.  With
    # --per_host_data each host reshuffles its own frame subset (views still
    # mix across that host's devices).  Host-streaming mode already
    # reshuffles globally every epoch (native store) — flag is a no-op there.
    # Supported by NeRFSystem and ShadowsSystem; the shuffle=False-parity
    # shadow trainers reject it loudly (shadow_systems.py
    # _reject_global_reshuffle).
    global_reshuffle: bool = False
    remat_fine: bool = False  # jax.checkpoint on the fine pass
    use_fused_mlp: bool = True  # Pallas fused-MLP kernel (TPU backends only)
    # channel-major (8, P) ray IO at the fused-kernel boundary: eliminates
    # the 16x lane padding of (P, 8) arrays (see ops/fused_mlp.py).
    # Measured on v5e (docs/results.md round 3): +10% on the train step
    # (99.6k -> 109.8k rays/s), +23% whole-image rendering (246k -> 302k),
    # and it lifts the 32768-ray chunk compile cap.  The production default
    # for EVERY program; this flag turns it off everywhere.
    fused_channel_io: bool = True
    profile: bool = False  # jax.profiler trace of the first epoch
    debug_nans: bool = False  # jax_debug_nans toggle (SURVEY.md §5.2)
    compilation_cache: bool = True  # persistent XLA cache across processes

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2, default=list)

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path) as f:
            d = json.load(f)
        return cls.from_dict(d)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        names = {f.name for f in dataclasses.fields(cls)}
        kwargs = {}
        for k, v in d.items():
            if k not in names:
                continue
            if isinstance(v, list):
                v = tuple(v)
            kwargs[k] = v
        return cls(**kwargs)


def _add_reference_flags(parser: argparse.ArgumentParser) -> None:
    """Mirror of the reference CLI (opt.py) plus framework extensions."""
    d = Config()
    parser.add_argument("--root_dir", type=str, default=d.root_dir)
    parser.add_argument("--dataset_name", type=str, default=d.dataset_name)
    parser.add_argument("--img_wh", nargs="+", type=int, default=list(d.img_wh))
    parser.add_argument("--spheric_poses", action="store_true")
    parser.add_argument("--N_samples", type=int, default=d.N_samples)
    parser.add_argument("--N_importance", type=int, default=d.N_importance)
    parser.add_argument("--use_disp", action="store_true")
    parser.add_argument("--perturb", type=float, default=d.perturb)
    parser.add_argument("--noise_std", type=float, default=d.noise_std)
    parser.add_argument("--loss_type", type=str, default=d.loss_type)
    parser.add_argument("--batch_size", type=int, default=d.batch_size)
    parser.add_argument("--chunk", type=int, default=d.chunk)
    parser.add_argument("--num_epochs", type=int, default=d.num_epochs)
    parser.add_argument("--num_gpus", nargs="+", type=int, default=[0])
    parser.add_argument("--ckpt_path", type=str, default=None)
    parser.add_argument("--prefixes_to_ignore", nargs="+", type=str, default=["loss"])
    parser.add_argument("--optimizer", type=str, default=d.optimizer)
    parser.add_argument("--lr", type=float, default=d.lr)
    parser.add_argument("--momentum", type=float, default=d.momentum)
    parser.add_argument("--weight_decay", type=float, default=d.weight_decay)
    parser.add_argument("--lr_scheduler", type=str, default=d.lr_scheduler)
    parser.add_argument("--warmup_multiplier", type=float, default=d.warmup_multiplier)
    parser.add_argument("--warmup_epochs", type=int, default=d.warmup_epochs)
    parser.add_argument("--decay_step", nargs="+", type=int, default=list(d.decay_step))
    parser.add_argument("--decay_gamma", type=float, default=d.decay_gamma)
    parser.add_argument("--poly_exp", type=float, default=d.poly_exp)
    parser.add_argument("--sm_weight", type=float, default=d.sm_weight)
    parser.add_argument("--rgb_weight", type=float, default=d.rgb_weight)
    parser.add_argument("--exp_name", type=str, default=d.exp_name)
    parser.add_argument("--black_and_white_test", action="store_true")
    parser.add_argument("--white_pix", type=float, default=d.white_pix)
    parser.add_argument("--num_sanity_val_steps", type=int, default=d.num_sanity_val_steps)
    parser.add_argument("--Light_N_importance", type=int, default=d.Light_N_importance)
    parser.add_argument("--sample_light_depth_every", type=int, default=d.sample_light_depth_every)
    parser.add_argument("--grad_on_light", action="store_true")
    parser.add_argument("--shadow_method", type=str, default=d.shadow_method)
    parser.add_argument("--coords_trans", action="store_true")
    parser.add_argument("--coords_trans2", action="store_true")
    parser.add_argument("--blur", type=int, default=d.blur)
    parser.add_argument("--max_images", type=int, default=d.max_images)
    # framework extensions
    parser.add_argument("--seed", type=int, default=d.seed)
    parser.add_argument("--compute_dtype", type=str, default=d.compute_dtype)
    parser.add_argument("--grad_clip", type=float, default=d.grad_clip,
                        help="global-norm gradient clip (0 = off; Lightning "
                        "gradient_clip_val analog — guards shadow_method_2's "
                        "reference-documented NaN blowups)")
    parser.add_argument("--arch_width", type=int, default=d.arch_width,
                        help="NeRF trunk width W (default 256 = reference "
                             "architecture; non-256 uses the XLA MLP path)")
    parser.add_argument("--blender_near", type=float, default=d.blender_near)
    parser.add_argument("--blender_far", type=float, default=d.blender_far)
    parser.add_argument("--white_back", type=lambda s: s.lower() == "true", default=None)
    parser.add_argument("--ckpt_dir", type=str, default=d.ckpt_dir)
    parser.add_argument("--log_dir", type=str, default=d.log_dir)
    parser.add_argument("--num_devices", type=int, default=None)
    parser.add_argument("--data_device_resident",
                        type=lambda s: s.lower() == "true",
                        default=d.data_device_resident,
                        help="false = host-streaming mode through the "
                        "native C++ ray store (for buffers too big for HBM)")
    parser.add_argument("--stream_slab_steps", type=int,
                        default=d.stream_slab_steps,
                        help="host-streaming mode: optimizer steps batched "
                        "into one device dispatch (amortizes the ~20 ms "
                        "remote-tunnel dispatch cost)")
    parser.add_argument("--max_steps_per_dispatch", type=int,
                        default=d.max_steps_per_dispatch,
                        help="shadow trainers: bound one device program's "
                        "step count (0 = whole epoch); identical "
                        "trajectory, bounded program runtime")
    parser.add_argument("--multihost", action="store_true",
                        help="multi-host pod slice: jax.distributed."
                        "initialize() before building the device mesh")
    parser.add_argument("--per_host_data", action="store_true",
                        help="each host loads only its own image subset "
                        "(pod-scale datasets; blender and llff loaders)")
    parser.add_argument("--global_reshuffle", action="store_true",
                        help="re-shard the ray buffer with a fresh global "
                        "permutation every epoch (DistributedSampler "
                        "semantics) — escape hatch for view-skewed data")
    parser.add_argument("--remat_fine", action="store_true")
    parser.add_argument("--use_fused_mlp", type=lambda s: s.lower() == "true",
                        default=d.use_fused_mlp)
    parser.add_argument("--fused_channel_io",
                        type=lambda s: s.lower() == "true",
                        default=d.fused_channel_io)
    parser.add_argument("--profile", action="store_true")
    parser.add_argument("--debug_nans", action="store_true")
    parser.add_argument("--val_every_n_epochs", type=int,
                        default=d.val_every_n_epochs)
    parser.add_argument("--compilation_cache", type=lambda s: s.lower() == "true",
                        default=d.compilation_cache)


def get_opts(argv: Optional[List[str]] = None) -> Config:
    """Parse a reference-style command line into a Config."""
    parser = argparse.ArgumentParser()
    _add_reference_flags(parser)
    args = parser.parse_args(argv)
    d = vars(args)
    d["img_wh"] = tuple(d["img_wh"])
    return Config.from_dict(d)

"""Config system: nested dataclasses + dotted-path CLI overrides.

Capability parity with the reference's Hydra tree
(/root/reference/configs/default.yaml, configs/network/*.yaml) without the
Hydra dependency: ``network=<name>`` swaps the per-model config group, and
any field can be overridden with ``a.b=value`` tokens.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class NetworkConfig:
    name: str = "realnvp"
    layers: int = 32
    # flow++ (configs/network/flow++.yaml)
    mixtures: int = 8
    # resflow (configs/network/resflow.yaml)
    logdet: str = "unbias"
    spnorm_coeff: float = 0.9
    # ffjord (configs/network/ffjord.yaml)
    t0: float = 0.0
    t1: float = 1.0
    stepsize: float = 0.1
    solver: str = "dopri5"
    backprop: str = "adjoint"
    trace: str = "hutchinson"
    # adaptive-solver tolerances; None = the solver tableau defaults
    # (dopri5: 1e-2 like the reference's constants, flows/odeint.py:98).
    # The reference's controller discards its computed step size, making it
    # fixed-step in practice; with TRUE accept/reject control, tighter
    # tolerances here buy accuracy the reference cannot reach.
    rtol: Optional[float] = None
    atol: Optional[float] = None
    # opt-in image variants for models whose reference raises
    # NotImplementedError (maf/resflow/ffjord) — beyond-parity wiring of
    # the classes the reference ships but never uses (iresblock.py:281-301,
    # cnf.py:55-65)
    allow_image: bool = False
    # flow++ image mode: variational dequantization (small conditional
    # dequant flow + ELBO objective) instead of the reference's fixed
    # Logit(0.01) transform
    var_dequant: bool = False
    # MAF: redraw MADE masks from the per-step PRNG on every call,
    # emulating the reference's per-forward np.random mask resampling
    # (flows/maf.py:49-50); default False = fixed masks (the
    # jit-friendly design choice, see bijectors/made.py)
    resample_masks: bool = False
    # conditioner width (reference MLP/ConvNet base_filters=32)
    base_filters: int = 32
    # XLA matmul/conv precision ("bfloat16" | "float32" | "highest").
    # None = auto: bfloat16 for image stacks on TPU (2.4x train step,
    # IMG_MFU_PROBE.json), XLA default elsewhere.  This selects the MXU
    # pass count for f32 operands; tensor dtypes are unchanged.
    matmul_precision: Optional[str] = None
    # conditioner compute dtype: "float32" (reference numerics) or
    # "bfloat16" (mixed precision: f32 master weights, f32 batch-norm
    # stats and flow/logdet math; bf16 conv/matmul activations).  The
    # image-tier train step is bandwidth-bound at f32 — bf16 halves
    # activation HBM traffic and runs single-pass on the MXU.
    compute_dtype: str = "float32"
    # rematerialize per-layer activations in backward (HBM saver)
    remat: bool = False
    # compose repeated homogeneous blocks with lax.scan instead of
    # unrolling them into the traced graph: O(1) compile time in depth.
    # NOTE: changes the checkpoint pytree layout (stacked block params),
    # so scan and unrolled checkpoints are not interchangeable.
    scan: bool = False


# per-network defaults mirroring configs/network/*.yaml
NETWORK_DEFAULTS = {
    "planar": dict(layers=32),
    "realnvp": dict(layers=32),
    "glow": dict(layers=32),
    "flow++": dict(layers=32, mixtures=8),
    "maf": dict(layers=32),
    "resflow": dict(layers=32, logdet="unbias", spnorm_coeff=0.9),
    # rtol/atol 1e-4 (vs the tableau's 1e-2): with TRUE accept/reject step
    # control, 1e-2 lets dt grow to 5x nominal and visibly smears the
    # learned density; 1e-4 restores reference-quality results (A/B on the
    # 20k-step `normals` run, round 2) at ~2x solve cost.  The reference's
    # controller computes but never applies its step size, so its 1e-2 is
    # effectively a fixed fine grid (flows/odeint.py:80-81).
    "ffjord": dict(layers=3, t0=0.0, t1=1.0, stepsize=0.1, solver="dopri5",
                   backprop="adjoint", trace="hutchinson",
                   rtol=1e-4, atol=1e-4),
}


@dataclass
class TrainConfig:
    steps: int = 100000
    samples: int = 1024  # batch size (reference name)
    # optimizer steps fused into one device dispatch (lax.scan); >1
    # amortizes dispatch latency — logging/report cadence coarsens to
    # chunk granularity
    chunk: int = 1


@dataclass
class OptimizerConfig:
    name: str = "adam"
    lr: float = 1.0e-4
    beta1: float = 0.9
    beta2: float = 0.999
    weight_decay: float = 0.0
    decay_steps: int = 10000
    decay_ratio: float = 0.5


@dataclass
class RunConfig:
    debug: bool = False
    distrib: str = "circles"
    ckpt_path: Optional[str] = None
    output: str = "outputs"
    display: int = 1
    seed: int = 42
    data_root: str = "data"
    # write image files on every report tick (for training movies), not
    # just every display*1000 steps
    save_all_reports: bool = False
    # uniform dequantization of 8-bit image data: y = (255x+u)/256.  The
    # reference trains on raw [0,1] pixels (unbounded image loss); enable
    # this for a well-posed bits/dim objective
    dequantize: bool = False
    # force a JAX platform ('cpu' / 'tpu'); None = environment default.
    # (env JAX_PLATFORMS alone is overridden by the axon sitecustomize.)
    platform: Optional[str] = None
    # preemption recovery (SURVEY.md §5.3): 'auto' resumes from the most
    # recent logs/<network>_<distrib>_*/latest.npz and CONTINUES IN THAT
    # RUN DIR; an explicit run-dir path resumes that run.  None starts
    # fresh.  (ckpt_path remains the load-this-file escape hatch.)
    resume: Optional[str] = None


@dataclass
class Config:
    network: NetworkConfig = field(default_factory=NetworkConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    run: RunConfig = field(default_factory=RunConfig)


def _coerce(current, value: str):
    if isinstance(current, bool) or value.lower() in ("true", "false"):
        return value.lower() == "true"
    if value.lower() in ("null", "none"):
        return None
    for typ in (int, float):
        try:
            return typ(value)
        except ValueError:
            continue
    return value


def parse_cli(argv) -> Config:
    """Parse ``key=value`` overrides (e.g. network=glow run.distrib=moons)."""
    cfg = Config()
    # first pass: select network group so its defaults apply before overrides
    for tok in argv:
        if tok.startswith("network="):
            name = tok.split("=", 1)[1]
            if name not in NETWORK_DEFAULTS:
                raise ValueError(f"unknown network {name!r}; "
                                 f"choose from {sorted(NETWORK_DEFAULTS)}")
            cfg.network = NetworkConfig(name=name, **NETWORK_DEFAULTS[name])
    for tok in argv:
        if "=" not in tok:
            raise ValueError(f"override must be key=value, got {tok!r}")
        path, value = tok.split("=", 1)
        if path == "network":
            continue
        parts = path.split(".")
        obj = cfg
        for p in parts[:-1]:
            obj = getattr(obj, p)
        leaf = parts[-1]
        if not hasattr(obj, leaf):
            raise ValueError(f"unknown config key {path!r}")
        setattr(obj, leaf, _coerce(getattr(obj, leaf), value))
    return cfg


def to_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)

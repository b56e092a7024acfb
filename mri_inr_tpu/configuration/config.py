"""Typed configuration system.

Capability parity with the reference's YAML-over-defaults config layer
(``src/configuration/configuration.py:11-212`` in the reference), redesigned:

- dataclasses instead of ``SimpleNamespace`` (typo-safe attribute access);
- dotted CLI overrides (``--set training.lr=3e-4``) — the reference README
  promises these but never implements them (README.md:82);
- case-insensitive, validated enums — the reference crashes on
  ``criterion: "edge"`` (lowercase) and on the default
  ``encoder_type: "default"`` (SURVEY §2.5/§2.1 quirks); we normalize and
  validate eagerly instead.
"""

from __future__ import annotations

import dataclasses
import pathlib
from dataclasses import dataclass, field
from typing import Any, Mapping

import yaml

# Canonical enum values (validated case-insensitively).
CRITERIA = ("mse", "edge", "perceptual")
OPTIMIZERS = ("adam", "sgd")
ACTIVATIONS = ("sine", "morlet")
ENCODER_TYPES = ("custom", "vgg")
PRECISIONS = ("bf16", "fp32")


def _canon(value: str, allowed: tuple[str, ...], what: str) -> str:
    v = str(value).strip().lower()
    if v not in allowed:
        raise ValueError(f"Invalid {what}: {value!r}; expected one of {allowed}")
    return v


@dataclass
class DataSplitConfig:
    """One data split (train or val). Mirrors reference defaults
    (configuration.py:13-25)."""

    dataset: str = ""
    num_samples: int | None = None
    mri_type: str = "Flair"
    max_slice_num: int | None = 10  # reference filters slice_num <= 10
    seed: int = 31415  # reference subsampling seed (mri_dataset.py:26)
    # online k-space mode (data/online.py): ``dataset`` points at a
    # directory of raw .h5 volumes; mask -> IFFT -> tile runs jitted on
    # device per epoch. ``remask_each_epoch`` draws fresh per-volume masks
    # every epoch (physics-consistent augmentation the offline pipeline
    # cannot express); off = stable offline-parity masks.
    online: bool = False
    remask_each_epoch: bool = True


@dataclass
class DataConfig:
    train: DataSplitConfig = field(default_factory=DataSplitConfig)
    val: DataSplitConfig = field(default_factory=lambda: DataSplitConfig(num_samples=10))
    acceleration: int = 6
    center_fraction: float = 0.05
    low_memory: bool = False  # lazy per-slice dataset instead of eager tiling


@dataclass
class ModelConfig:
    """Model hyperparameters; defaults match the reference
    (configuration.py:29-44)."""

    dim_in: int = 2
    dim_hidden: int = 256
    dim_out: int = 1
    latent_dim: int = 256
    num_layers: int = 5
    w0: float = 1.0
    w0_initial: float = 30.0
    use_bias: bool = True
    dropout: float = 0.1
    encoder_type: str = "custom"  # reference default "default" is a crash footgun
    encoder_path: str | None = None  # None => randomly-initialized encoder
    outer_patch_size: int = 32
    inner_patch_size: int = 16
    siren_patch_size: int = 24
    activation: str = "sine"
    residual: bool = False  # residual-MLP ablation (README.md:27,41)
    use_pallas: bool = True  # fused Pallas SIREN kernel on TPU

    def __post_init__(self):
        self.activation = _canon(self.activation, ACTIVATIONS, "activation")
        self.encoder_type = _canon(self.encoder_type, ENCODER_TYPES, "encoder_type")


@dataclass
class TrainingConfig:
    """Training hyperparameters; defaults match reference
    (configuration.py:45-58) plus TPU-specific knobs."""

    lr: float = 1e-4
    batch_size: int = 400
    epochs: int = 100
    output_dir: str = "./output"
    output_name: str = "modulated_siren"
    optimizer: str = "adam"
    logging: bool = False
    criterion: str = "mse"
    save_interval: int = 100
    continue_training: bool = False
    model_path: str | None = None
    seed: int = 0
    # TPU-native additions
    precision: str = "bf16"  # compute dtype; params/optimizer always fp32
    data_axis_size: int | None = None  # None => all local devices
    perceptual_encoder_path: str | None = None
    profile_dir: str | None = None  # jax.profiler trace dir (TensorBoard)
    debug_nans: bool = False  # jax.config debug_nans (slow; for triage)
    device_data: bool = False  # HBM-resident tiles + one lax.scan per epoch
    # fused Pallas fwd+bwd training kernels (ops/siren_train_kernel). None =
    # follow model.use_pallas on TPU; the Flax autodiff path otherwise.
    use_pallas: bool | None = None
    # degree-5 sine/cos in the TRAIN kernels (~2 polynomial FMAs cheaper
    # per element in fwd sine AND bwd cosine): +10.4% step throughput
    # measured, and an end-to-end 600-epoch quality row measured
    # PSNR 28.404 vs the degree-9 baseline's 28.414 (SSIM/NRMSE equal) —
    # quality-neutral, so the r4 default. Set false for degree-9 runs.
    sin5: bool = True
    # control experiment: keep the spliced latent-encoder trunk FROZEN at
    # its loaded initialization (grads zeroed) while everything else trains
    # — used to demonstrate the reference's VGG-splice ~5 dB collapse is an
    # initialization artifact (RESULTS.md vgg_frozen row)
    freeze_encoder: bool = False

    def __post_init__(self):
        self.optimizer = _canon(self.optimizer, OPTIMIZERS, "optimizer")
        self.criterion = _canon(self.criterion, CRITERIA, "criterion")
        self.precision = _canon(self.precision, PRECISIONS, "precision")


@dataclass
class EvalConfig:
    """Evaluation settings; mirrors reference test defaults
    (configuration.py:63-93)."""

    dataset: str = ""
    # online eval (data/online.py): ``dataset`` points at a directory of
    # raw .h5 volumes; mask -> IFFT runs on device with the stable
    # offline-parity mask keys — no .npy preprocessing step needed
    online: bool = False
    test_files: list[str] | None = None
    metric_samples: int | None = None
    visual_samples: int = 0
    acceleration: int = 6
    center_fraction: float = 0.05
    # sampler selection filters (reference hardwires Flair / slice_num <= 10,
    # mri_sampler.py:15-45; here they are config — set mri_type to null to
    # evaluate all contrasts)
    mri_type: str | None = "Flair"
    max_slice_num: int | None = 10
    # cap the shuffled slice list itself (before metric_samples is applied)
    num_samples: int | None = None
    output_dir: str = "./output"
    output_name: str = "modulated_siren"
    model_path: str = ""
    batch_patches: int = 1024  # static patch-batch bucket for jitted eval
    # large-FOV mode: distributed weighted fold with ICI halo exchange
    # (parallel/halo_fold.py); needs a multi-device mesh and the vertical
    # patch count divisible by its size
    halo_fold: bool = False
    # device-resident metric sweep (the r5 default): slice stacks stay in
    # HBM end-to-end, one dispatch per image shape, one (3, K) fetch — no
    # per-chunk host round trips (eval/evaluate.py:evaluate_files_device).
    # Set false to fall back to the chunked host pipeline below.
    device_sweep: bool = True
    # re-execute the sweep once with perturbed input to attribute the
    # relay's one-time program load vs the steady device rate inside the
    # committed run (costs one extra ~1 s sweep execution)
    steady_probe: bool = False
    # metric-sweep slices scored per device dispatch in the CHUNKED host
    # pipeline (1 = per-slice loop); amortizes host<->device round trips
    # over the 940-file sweep. Measured on the real chip
    # (scripts/profile_eval.py): 16 -> 60.5 slices/s, 32 -> 47 slices/s
    # (per-chunk compute outgrows the RTT amortization); per-slice 18/s.
    eval_chunk: int = 16
    # fused-kernel schedule knobs (measured tradeoffs in benchmarks/README.md):
    # sin_bf16 evaluates the sine polynomial tail + FiLM multiply in bf16
    # (~0.03 dB PSNR cost measured on the quality checkpoint); ksplit
    # pipelines each layer's sine epilogue against the next matmul in K
    # slices; quantized selects the int8-MXU kernel.
    # sin5 (degree-5 minimax sine) is the r4 default: measured at
    # 940-slice scale -0.014 dB PSNR / +0.0014 SSIM vs degree-7 for ~7%
    # kernel speed; set false for degree-7 parity runs.
    sin_bf16: bool = False
    sin5: bool = True
    ksplit: int = 1
    quantized: bool = False


@dataclass
class TrainConfig:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)


@dataclass
class TestConfig:
    data: EvalConfig = field(default_factory=EvalConfig)
    model: ModelConfig = field(default_factory=ModelConfig)


# ---------------------------------------------------------------------------
# Construction from nested dicts / YAML / CLI overrides
# ---------------------------------------------------------------------------


def _from_dict(cls, data: Mapping[str, Any]):
    """Recursively build a dataclass from a nested mapping, rejecting
    unknown keys (the reference silently accepts typos)."""
    if data is None:
        data = {}
    fields = {f.name: f for f in dataclasses.fields(cls)}
    unknown = set(data) - set(fields)
    if unknown:
        raise ValueError(f"Unknown config keys for {cls.__name__}: {sorted(unknown)}")
    kwargs = {}
    for name, f in fields.items():
        if name not in data:
            continue
        value = data[name]
        if dataclasses.is_dataclass(f.type) or (
            isinstance(f.type, str) and f.type in _DATACLASS_REGISTRY
        ):
            sub_cls = f.type if dataclasses.is_dataclass(f.type) else _DATACLASS_REGISTRY[f.type]
            kwargs[name] = _from_dict(sub_cls, value)
        else:
            kwargs[name] = value
    return cls(**kwargs)


_DATACLASS_REGISTRY = {
    c.__name__: c
    for c in (
        DataSplitConfig,
        DataConfig,
        ModelConfig,
        TrainingConfig,
        EvalConfig,
        TrainConfig,
        TestConfig,
    )
}


def to_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)


def apply_overrides(cfg, overrides: list[str]):
    """Apply dotted ``key.path=value`` overrides in place.

    Values are parsed with yaml.safe_load so ``lr=3e-4`` and
    ``logging=true`` get proper types.
    """
    for item in overrides or []:
        if "=" not in item:
            raise ValueError(f"Override must be key.path=value, got {item!r}")
        path, raw = item.split("=", 1)
        value = yaml.safe_load(raw)
        # YAML 1.1 parses "1e-3" (no dot) as a string — coerce numeric-looking
        # strings so "--set training.lr=1e-3" means what the user meant.
        if isinstance(value, str):
            try:
                value = int(value)
            except ValueError:
                try:
                    value = float(value)
                except ValueError:
                    pass
        obj = cfg
        parts = path.split(".")
        for p in parts[:-1]:
            obj = getattr(obj, p)
        leaf = parts[-1]
        if not hasattr(obj, leaf):
            raise ValueError(f"Unknown config key {path!r}")
        setattr(obj, leaf, value)
        # re-run validation hooks
        post = getattr(obj, "__post_init__", None)
        if post is not None:
            post()
    return cfg


def _load_yaml(path: str | pathlib.Path | None) -> dict:
    if path is None:
        return {}
    with open(path) as f:
        return yaml.safe_load(f) or {}


def load_train_configuration(
    path: str | pathlib.Path | None = None, overrides: list[str] | None = None
) -> TrainConfig:
    cfg = _from_dict(TrainConfig, _load_yaml(path))
    return apply_overrides(cfg, overrides or [])


def load_test_configuration(
    path: str | pathlib.Path | None = None, overrides: list[str] | None = None
) -> TestConfig:
    cfg = _from_dict(TestConfig, _load_yaml(path))
    return apply_overrides(cfg, overrides or [])


def save_config_yaml(cfg, path: str | pathlib.Path) -> None:
    """Persist the resolved config next to run outputs (reference writes a
    config copy per run, train_mod_siren.py:50-55)."""
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(to_dict(cfg), f, sort_keys=False)

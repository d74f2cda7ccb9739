"""Typed configuration system with experiment presets + dotted overrides.

User-facing parity with the reference's Hydra surface
(``config/main.yaml`` + ``config/experiment/*`` + ``src/config.py``):
presets are composed dataclasses, and CLI arguments of the form
``a.b.c=value`` override nested fields (the Hydra dotted-override syntax),
so ``python -m freesplat_tpu.main +experiment=scannet/2views mode=test
checkpointing.load=...`` keeps working in spirit.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, fields, is_dataclass, replace
from typing import Any, Optional

from ..models.adapter import GaussianAdapterCfg
from ..models.decoder import DecoderCfg
from ..models.encoder import EncoderFreeSplatCfg
from ..training.losses import LossCfg, LossLpipsCfg, LossMseCfg
from ..training.schedule import OptimizerCfg


@dataclass(frozen=True)
class DatasetCfg:
    name: str = "scannet"
    roots: tuple[str, ...] = ("datasets/scannet",)
    image_shape: tuple[int, int] = (384, 512)
    near: float = 0.5
    far: float = 15.0
    load_depth: bool = True
    overfit_to_scene: Optional[str] = None
    view_sampler: str = "bounded"
    num_context_views: int = 2
    evaluation_index_path: str = "assets/evaluation_index_scannet_2views.json"
    fvt_random_contexts: bool = False
    # synthetic only: pre-render this many batches once and cycle
    # (overfit runs; 0 = fresh camera ring per step).
    synthetic_cache_batches: int = 0
    # synthetic only: fresh Gaussian cloud per batch (generalization
    # training/eval streams; scenes are (seed, scene_id)-keyed so streams
    # with different data_loader seeds are disjoint scene sets).
    synthetic_vary_scene: bool = False
    # synthetic only: targets per batch (the scene-directory datasets get
    # this from their view samplers instead).
    synthetic_num_targets: int = 2
    # synthetic only: ground-truth renderer ("reference" = dense golden
    # model; "tile" = production Pallas rasterizer, ~10x faster streams).
    synthetic_renderer: str = "reference"


@dataclass(frozen=True)
class DataLoaderCfg:
    batch_size: int = 1
    seed: int = 1234


@dataclass(frozen=True)
class CheckpointingCfg:
    load: Optional[str] = None
    every_n_train_steps: int = 10_000
    output_dir: str = "outputs/checkpoints"
    strict: bool = True


@dataclass(frozen=True)
class TrainerCfg:
    max_steps: int = 300_001
    val_check_interval: int = 5000
    log_every: int = 10
    # Device count for the data-parallel mesh ("auto" = all addressable
    # devices) — the reference's Lightning ``devices="auto"``
    # (src/main.py:96-110).  The global batch (batch_size) is sharded
    # across the mesh; a 1-device mesh is the plain single-chip program.
    devices: str = "auto"
    # Validation extras (trajectory videos + 3D Gaussian projections are
    # ~minutes of extra renders per val pass on a tunneled chip).
    val_save_video: bool = False
    val_save_projections: bool = False


@dataclass(frozen=True)
class TestCfg:
    output_path: str = "outputs/test"
    eval_depth: bool = True
    render_chunk_size: int = 50  # target views per render call (mw:336-353)
    save_depth: bool = True  # depth_pred/depth_render colormaps (mw:381-416)
    save_ply: bool = False  # per-scene gaussians.ply export
    save_video: bool = False  # wobble + interpolation trajectory videos
    # Stop after this many scenes (None = exhaust the dataset; required
    # for the infinite synthetic stream).
    max_scenes: Optional[int] = None
    # Shard the context VIEW axis over all devices during encoding —
    # whole-scene (10/30-view) evaluation splits the per-view trunk
    # across the mesh (SURVEY §2.5 view parallelism).
    view_shard: bool = False
    # SINGLE-chip whole-scene: host-loop the per-view trunk over chunks
    # of this many views (separate jit calls bound peak HBM; one 30-view
    # 384x512 encode graph plans 23 GB and cannot fit).  None = off.
    encode_view_chunk: Optional[int] = None
    # Override decoder.capacity_factor for TEST-TIME rendering only.
    # Whole-scene fused sets (5.9M Gaussians at 30 views) peak at ~0.58x
    # instances per view, so the 3.0 training default wastes ~3x of the
    # capacity-proportional sort/gather cost: 1.0 measures 553 vs 1560
    # ms/view (PERFORMANCE.md ROUND 5).  Drops stay reported per view.
    render_capacity_factor: Optional[float] = None
    # BN statistics regime at test time.  True (default) = the
    # reference's actual behavior: ``set_bn_eval`` calls ``m.train()`` on
    # every BN layer, so evals normalize with BATCH statistics
    # (encoder_freesplat.py:80-82,216).  Measured on a trained model this
    # is also self-consistent with train-mode-BN training and WINS
    # +1.47 dB over running averages (33.29 -> 34.75 dB, 10 held-out
    # scenes, docs/evidence/generalization/bn_regime_ab.log).  False =
    # running averages (textbook eval-mode BN) — kept as the opt-out for
    # ablations.
    bn_batch_stats: bool = True


@dataclass(frozen=True)
class RootCfg:
    mode: str = "train"  # train | test
    seed: int = 111123
    dataset: DatasetCfg = field(default_factory=DatasetCfg)
    data_loader: DataLoaderCfg = field(default_factory=DataLoaderCfg)
    encoder: EncoderFreeSplatCfg = field(default_factory=EncoderFreeSplatCfg)
    decoder: DecoderCfg = field(default_factory=DecoderCfg)
    loss: LossCfg = field(default_factory=LossCfg)
    optimizer: OptimizerCfg = field(default_factory=OptimizerCfg)
    checkpointing: CheckpointingCfg = field(default_factory=CheckpointingCfg)
    trainer: TrainerCfg = field(default_factory=TrainerCfg)
    test: TestCfg = field(default_factory=TestCfg)


# ---------------------------------------------------------------------------
# Experiment presets (config/experiment/*.yaml equivalents).

def _scannet(views: int, fvt: bool = False) -> RootCfg:
    return RootCfg(
        dataset=DatasetCfg(
            name="scannet",
            image_shape=(384, 512),
            near=0.5,
            far=15.0,
            num_context_views=views,
            fvt_random_contexts=fvt,
            evaluation_index_path=(
                f"assets/evaluation_index_scannet_{views}views.json"
            ),
        ),
        encoder=EncoderFreeSplatCfg(
            # FVT trains with 8 random context views but caps cost-volume
            # source selection at 5 (reference
            # config/experiment/scannet/fvt.yaml:24 ``num_views: 5``), so
            # nearest-k source selection activates when v > num_views.
            num_views=5 if fvt else views,
            num_depth_candidates=128,
            log_planes=True,
            near=0.5,
            far=15.0,
            adapter=GaussianAdapterCfg(sh_degree=2),
        ),
        loss=LossCfg(
            mse=LossMseCfg(weight=1.0),
            lpips=LossLpipsCfg(weight=0.05, apply_after_step=0),
        ),
        optimizer=OptimizerCfg(
            lr=1e-4, warm_up_steps=100, cosine_lr=True,
            max_steps=300_001, gradient_clip_val=0.01,
        ),
        trainer=TrainerCfg(max_steps=300_001),
    )


def _re10k() -> RootCfg:
    base = _scannet(2)
    return replace(
        base,
        dataset=replace(
            base.dataset,
            name="re10k",
            image_shape=(256, 256),
            near=1.0,
            far=100.0,
            evaluation_index_path="assets/evaluation_index_re10k.json",
        ),
        encoder=replace(
            base.encoder, log_planes=False, near=1.0, far=100.0
        ),
        optimizer=replace(base.optimizer, gradient_clip_val=0.05),
    )


def _replica(views: int) -> RootCfg:
    base = _scannet(views)
    return replace(
        base,
        mode="test",
        dataset=replace(
            base.dataset,
            name="replica",
            evaluation_index_path=(
                f"assets/evaluation_index_replica_{views}views.json"
            ),
        ),
    )


EXPERIMENTS: dict[str, Any] = {
    "scannet/2views": lambda: _scannet(2),
    "scannet/3views": lambda: _scannet(3),
    "scannet/fvt": lambda: _scannet(8, fvt=True),
    "re10k/2views": _re10k,
    "replica/2views": lambda: _replica(2),
    "replica/3views": lambda: _replica(3),
}


# ---------------------------------------------------------------------------
# Dotted overrides.

def _parse_value(text: str, current: Any, annotation: Any = None) -> Any:
    import typing

    optional = type(None) in typing.get_args(annotation)
    if (optional or current is None) and text.lower() in ("null", "none"):
        return None
    if current is None or isinstance(current, str):
        if text.lower() in ("null", "none"):
            return None
        # Optional[int/float/bool] fields default to None — coerce from
        # the declared annotation, not the (None) current value.
        args = typing.get_args(annotation)
        inner = next((a for a in args if a is not type(None)), None)
        if inner is int:
            return int(float(text))
        if inner is float:
            return float(text)
        if inner is bool:
            return text.lower() in ("1", "true", "yes")
        return text
    if isinstance(current, bool):
        return text.lower() in ("1", "true", "yes")
    if isinstance(current, int):
        return int(float(text))
    if isinstance(current, float):
        return float(text)
    if isinstance(current, tuple):
        items = [x for x in text.strip("[]() ").split(",") if x]
        elem = current[0] if current else ""
        return tuple(_parse_value(x.strip(), elem) for x in items)
    return text


def apply_override(cfg: Any, dotted: str, value: str) -> Any:
    """Return a copy of ``cfg`` with ``a.b.c`` replaced by parsed ``value``."""
    head, _, rest = dotted.partition(".")
    if not is_dataclass(cfg):
        raise KeyError(f"cannot descend into {type(cfg)} at '{dotted}'")
    names = {f.name for f in fields(cfg)}
    if head not in names:
        raise KeyError(f"unknown config field '{head}' on {type(cfg).__name__}")
    current = getattr(cfg, head)
    if rest:
        new_value = apply_override(current, rest, value)
    else:
        import typing

        hints = typing.get_type_hints(type(cfg))
        new_value = _parse_value(value, current, hints.get(head))
    return replace(cfg, **{head: new_value})


def load_config(argv: list[str]) -> RootCfg:
    """Compose a RootCfg from ``+experiment=...`` + dotted overrides."""
    cfg = RootCfg()
    overrides: list[tuple[str, str]] = []
    for arg in argv:
        if "=" not in arg:
            raise ValueError(f"arguments must be key=value, got '{arg}'")
        key, value = arg.split("=", 1)
        if key in ("+experiment", "experiment"):
            cfg = EXPERIMENTS[value]()
        else:
            overrides.append((key, value))
    for key, value in overrides:
        cfg = apply_override(cfg, key, value)
    return cfg

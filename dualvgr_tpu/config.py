"""Config system: typed defaults + recursive YAML merge + CLI flags.

Reproduces the reference surface (reference: config.py:7-56 defaults,
config.py:59-91 ``merge_cfg`` type-checked YAML overlay, config.py:95-100
``cfg_from_file``) without the easydict dependency, and fixes the unsafe
``yaml.load`` (reference config.py:98) by using ``yaml.safe_load``.

The three reference YAML experiment files (configs/*.yml) parse unchanged.
TPU-specific knobs live under the ``tpu`` section; reference YAMLs never set
them so the merge stays compatible.
"""

from __future__ import annotations

import copy
from typing import Any

import numpy as np
import yaml


class Config(dict):
    """dict with attribute access (replacement for easydict.EasyDict)."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    @classmethod
    def wrap(cls, obj: Any) -> Any:
        """Recursively convert nested dicts to Config."""
        if isinstance(obj, dict):
            return cls({k: cls.wrap(v) for k, v in obj.items()})
        if isinstance(obj, (list, tuple)):
            return type(obj)(cls.wrap(v) for v in obj)
        return obj


def default_config() -> Config:
    """Typed defaults, key-for-key with the reference (config.py:7-56).

    The extra ``tpu`` section holds TPU-native knobs with safe defaults.
    """
    c = Config.wrap({
        # reference kept gpu_id/multi_gpus; we accept them (YAML compat) but the
        # runtime is device-neutral: the mesh covers whatever jax.devices() shows.
        "gpu_id": 0,
        "num_workers": 4,
        "multi_gpus": False,
        "seed": 666,
        "model_type": "baseline",
        "graph_module": "GCN",
        "graph_layers": 1,
        "train": {
            "restore": False,
            "lr": 0.0001,
            "batch_size": 32,
            "max_epochs": 25,
            "vision_dim": 2048,
            "word_dim": 300,
            "module_dim": 768,
            "train_num": 0,  # 0 => full train set
            "glove": True,
            "num_of_nodes": 8,
        },
        "val": {
            "flag": True,
            "val_num": 0,  # 0 => full val set
        },
        "test": {
            "test_num": 0,  # 0 => full test set
            "write_preds": False,
        },
        "dataset": {
            "name": "svqa",  # ['svqa', 'msrvtt-qa', 'msvd-qa']
            "data_dir": "",
            "appearance_feat": "{}_appearance_feat.h5",
            "motion_feat": "{}_motion_feat.h5",
            "vocab_json": "{}_vocab.json",
            "train_question_pt": "{}_train_questions.pt",
            "val_question_pt": "{}_val_questions.pt",
            "test_question_pt": "{}_test_questions.pt",
            "save_dir": "",
        },
        "exp_name": "defaultExp",
        # ---- TPU-native extensions (not present in reference YAMLs) ----
        "tpu": {
            # matmul OPERAND dtype; params/accumulation stay float32. "auto"
            # (default) = "bfloat16" exactly when running on TPU: the eval
            # path is BITWISE-identical to fp32 there (the MXU executes fp32
            # DEFAULT matmuls as one bf16 pass — benchmarks/precision_probe.py)
            # and training is step-bitwise up to f32 bias-grad reduction
            # order, with converged accuracy inside the fixture's pure-fp32
            # chaos band (benchmarks/bf16_chaos_control.json) — while operand
            # HBM traffic halves (+9.5% eval / +4.7% train measured).
            # "float32" elsewhere (CPU streaming applies real rounding).
            # YAMLs may force "float32"/"bfloat16" (resolved_compute_dtype).
            "compute_dtype": "auto",
            # name of the data-parallel mesh axis.
            "mesh_axis": "data",
            # load whole feature HDF5s into host RAM when total bytes fit.
            "feature_cache_gb": 8.0,
            # host->device prefetch depth (batches in flight).
            "prefetch": 2,
            # dtype feature batches are cached/shipped in: "bfloat16" halves
            # host RAM + host->device bytes per step (the flagship fp32
            # appearance batch alone is 537 MB — more than a real TPU-VM DMA
            # moves in one 27 ms train step); the model upcasts on device.
            # Input quantization only — params and all on-device numerics
            # stay as configured. Default float32 (reference-exact inputs).
            "transfer_dtype": "float32",
            # fused Pallas DualVGR-cycle / BiLSTM kernels: "auto" (default)
            # enables them exactly when running on TPU, so the flagship CLI
            # (`train.py --cfg configs/msrvtt_qa_DualVGR_16.yml`) delivers
            # the benched kernel-path numbers with no hand-editing; YAMLs
            # may force true/false (resolved_use_pallas).
            "use_pallas": "auto",
            # fetch metrics / refresh the ticker every N steps (each fetch is
            # a device->host sync; 1 matches the reference's per-step ticker).
            "log_every": 1,
            # write a jax.profiler trace of training steps here ('' = off).
            "profile_dir": "",
            # tensor-parallel degree: 1 (default) = pure data parallelism.
            # k > 1 lays parameters/Adam moments out column-sharded over a
            # (devices/k) x k (data, model) mesh (parallel/tp.py) — GSPMD
            # inserts the collectives; forces the XLA (non-Pallas) path.
            "tensor_parallel": 1,
            # ZeRO stage 1: shard Adam moments over the data axis (divides
            # the optimizer-memory term by the DP degree; parallel/tp.py).
            "zero_opt": False,
            # gradient accumulation: every K loader batches become ONE
            # optimizer update over their mean gradient (optax.MultiSteps) —
            # an effective batch of K x train.batch_size without K x the
            # activation memory. Clip + lr decay see accumulated updates;
            # decay boundaries stay at the same epochs (train_lib converts
            # the schedule's epoch length from micro-steps).
            "grad_accum": 1,
            # dropout PRNG: "auto" (default) = the hardware 'rbg' generator
            # on TPU (measured ~12-20% faster train steps; identical dropout
            # distribution, different stream) and 'threefry2x32' (JAX's
            # portable default) elsewhere — so the flagship CLI delivers the
            # benched train numbers with no hand-editing. YAMLs may pin
            # either implementation explicitly (resolved_prng_impl).
            "prng_impl": "auto",
            # preemption-safe training: autosave the train state to
            # {ckpt}_autosave at every epoch end and on SIGTERM/SIGINT
            # (TPU pods preempt with a grace window); `train.restore: True`
            # resumes from the NEWER of best-val / autosave, and a cleanly
            # finished run deletes its autosave so restore keeps the
            # reference's best-checkpoint semantics.
            "autosave": True,
            # structured metrics stream: one JSON object per line (train
            # records at every log_every boundary, a val record per epoch)
            # for dashboards/regression tooling — the machine-readable
            # counterpart of the stdout ticker. '' = off; a relative path
            # resolves under {save_dir}/log/.
            "metrics_jsonl": "",
        },
    })
    return c


def _merge_into(yaml_cfg: dict, cfg: Config, path: str = "") -> None:
    """Recursive type-checked merge (behavioral port of config.py:59-91)."""
    if not isinstance(yaml_cfg, dict):
        raise TypeError(f"expected dict at {path or '<root>'}, got {type(yaml_cfg)}")
    for k, v in yaml_cfg.items():
        kpath = f"{path}.{k}" if path else k
        if k not in cfg:
            raise KeyError(f"{kpath} is not a valid config key")
        old = cfg[k]
        if isinstance(old, dict):
            _merge_into(v, old, kpath)
            continue
        # type check with the same numpy coercion affordances as the reference
        if old is not None and v is not None and type(old) is not type(v):
            if isinstance(old, np.ndarray):
                v = np.array(v, dtype=old.dtype)
            elif isinstance(old, float) and isinstance(v, int):
                v = float(v)
            elif isinstance(old, bool) and isinstance(v, int) and v in (0, 1):
                v = bool(v)
            elif kpath == "tpu.use_pallas" and isinstance(v, bool):
                pass  # "auto" default may be overridden by an explicit bool
            else:
                raise ValueError(
                    f"type mismatch for {kpath}: config has {type(old).__name__}, "
                    f"yaml has {type(v).__name__}"
                )
        cfg[k] = v


def cfg_from_file(filename: str, cfg: Config | None = None) -> Config:
    """Load a YAML experiment file and merge it over the defaults.

    Unlike the reference (config.py:95-100), this returns a fresh Config
    instead of mutating a module-global, and uses yaml.safe_load.
    """
    base = cfg if cfg is not None else default_config()
    with open(filename, "r") as f:
        yaml_cfg = yaml.safe_load(f)
    if yaml_cfg:
        _merge_into(yaml_cfg, base)
    return base


def resolved_use_pallas(cfg: Config) -> bool:
    """Resolve cfg.tpu.use_pallas: explicit bool wins; "auto" = on iff the
    ambient backend is TPU (the kernels are TPU-only; CPU/virtual-mesh runs
    take the XLA path)."""
    v = cfg.tpu.use_pallas
    if isinstance(v, bool):
        return v
    import jax

    return jax.default_backend() == "tpu"


def resolved_compute_dtype(cfg: Config) -> str:
    """Resolve cfg.tpu.compute_dtype: an explicit dtype name wins; "auto" =
    "bfloat16" on TPU (bitwise-identical eval, chaos-band-neutral training,
    halved matmul operand traffic — see the default_config comment and
    benchmarks/precision_probe.py / bf16_chaos_control.json), "float32"
    elsewhere (CPU has no DEFAULT-precision truncation, so streaming there
    would apply genuine rounding the reference never does)."""
    v = cfg.tpu.get("compute_dtype", "auto")
    if v != "auto":
        return v
    import jax

    return "bfloat16" if jax.default_backend() == "tpu" else "float32"


def resolved_prng_impl(cfg: Config) -> str:
    """Resolve cfg.tpu.prng_impl: an explicit implementation name wins;
    "auto" = the hardware 'rbg' generator on TPU, 'threefry2x32' elsewhere
    (mirrors resolved_use_pallas so TPU product defaults match the benched
    configuration)."""
    v = cfg.tpu.get("prng_impl", "auto")
    if v != "auto":
        return v
    import jax

    return "rbg" if jax.default_backend() == "tpu" else "threefry2x32"


def model_runtime_kwargs(cfg: Config) -> dict:
    """The cfg.tpu knobs that are DualVGR constructor args (static module
    attributes, so jit caches key on them): use_pallas + compute_dtype.
    All three CLI drivers build their model with these. Under tensor
    parallelism the Pallas kernels are disabled: a pallas_call is opaque
    to the SPMD partitioner, while the XLA path partitions cleanly.
    That fallback is LOUD (a warning log) so a user enabling
    tensor_parallel on TPU knows they traded the fused-kernel speedup
    for sharded parameters rather than silently losing it."""
    tp = int(cfg.tpu.get("tensor_parallel", 1))
    pallas = resolved_use_pallas(cfg)
    if pallas and tp > 1:
        import logging

        logging.warning(
            "tpu.tensor_parallel=%d forces the XLA (non-Pallas) execution "
            "path: pallas_call is opaque to the SPMD partitioner, so the "
            "fused-kernel speedup does not compose with tensor parallelism. "
            "Set tensor_parallel: 1 to get the Pallas kernels back.",
            tp,
        )
    return {
        "use_pallas": pallas and tp <= 1,
        "compute_dtype": resolved_compute_dtype(cfg),
    }


def resolve_dataset_paths(cfg: Config) -> Config:
    """Template dataset filenames under data_dir (reference train.py:411-422).

    Resolves appearance/motion/vocab/question paths as
    ``{data_dir}/{name}_<artifact>``.
    """
    import os

    c = copy.deepcopy(cfg)
    name = c.dataset.name
    d = c.dataset.data_dir
    for key in (
        "appearance_feat",
        "motion_feat",
        "vocab_json",
        "train_question_pt",
        "val_question_pt",
        "test_question_pt",
    ):
        template = c.dataset[key]
        c.dataset[key] = os.path.join(d, template.format(name))
    return c

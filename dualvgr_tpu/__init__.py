"""dualvgr_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video question answering framework.

A from-scratch rebuild of the capabilities of DualVGR-VideoQA
(reference: NJUPT-MCC/DualVGR-VideoQA) designed TPU-first:

* compute path: JAX + XLA with Pallas kernels for the fused DualVGR
  reasoning cycle (query punishment -> multi-head clip-graph attention ->
  common/specific fusion -> residual),
* scaling: ``jax.sharding.Mesh`` + jit-sharded train/eval steps (batch data
  parallelism over ICI; semantics are global-batch so BatchNorm et al. are
  exactly single-device equivalent),
* sequence work (BiLSTM question/appearance encoders) as ``lax.scan`` with
  one fused time-major input projection matmul feeding the MXU,
* training: optax (Adam + global-norm clip + step decay), orbax checkpoints.

Public surface mirrors the reference: the three YAML configs, the
``train.py`` / ``validate.py`` CLIs (``--cfg --alpha --beta --unit_layers``),
HDF5/pickle data artifacts, and per-category accuracy reporting.
"""

__version__ = "0.1.0"

from dualvgr_tpu.config import Config, default_config, cfg_from_file  # noqa: F401

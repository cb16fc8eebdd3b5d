"""The bilinear-fusion zoo (reference model/fusions/fusions.py:29-675).

The reference vendors the `block.bootstrap` fusion collection; only ``MFB``
is live in DualVGR (models.py:109). The full zoo is provided here so every
fusion a reference user could reach exists TPU-side, each matching its
reference semantics (including the quirky torch ``F.normalize(z, p=2)``
DEFAULT dim=1 in the power-normalization steps):

  MLP, ConcatMLP, LinearSum, MLB, MFB (general form), MFH, Mutan, Tucker,
  Block, BlockTucker, MCB (count-sketch + FFT compact bilinear pooling —
  the reference's version needs the defunct pytorch_fft CUDA bindings,
  compactbilinearpooling.py:4-6; here it's jnp.fft, which runs on TPU).

``fusion_factory`` mirrors the reference's registry (factory.py:14-42).
All fusions take two inputs with matching leading dims.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

_XAVIER = nn.initializers.xavier_uniform()


def get_sizes_list(dim: int, chunks: int):
    """Chunk sizes covering ``dim`` (reference fusions.py:5-17)."""
    split_size = (dim + chunks - 1) // chunks
    sizes_list = [split_size] * chunks
    sizes_list[-1] = sizes_list[-1] - (sum(sizes_list) - dim)
    assert sum(sizes_list) == dim
    if sizes_list[-1] < 0:
        n_miss = sizes_list[-2] - sizes_list[-1]
        sizes_list[-1] = sizes_list[-2]
        for j in range(n_miss):
            sizes_list[-j - 1] -= 1
        assert sum(sizes_list) == dim and min(sizes_list) > 0
    return sizes_list


def power_normalize(z):
    """Signed sqrt + L2 normalize over dim=1 (torch F.normalize default)."""
    z = jnp.sqrt(nn.relu(z)) - jnp.sqrt(nn.relu(-z))
    norm = jnp.sqrt(jnp.maximum(jnp.sum(z * z, axis=1, keepdims=True), 1e-24))
    return z / norm


def _activ(name):
    return getattr(nn, name) if name else (lambda x: x)


def _drop(x, rate, train):
    # module-level helper for the zoo's stateless dropouts
    return nn.Dropout(rate, deterministic=not train)(x) if rate > 0 else x


class MLP(nn.Module):
    """(reference fusions.py:29-53)."""

    dimensions: Sequence[int]
    activation: str = "relu"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        n = len(self.dimensions)
        for i, dout in enumerate(self.dimensions):
            x = nn.Dense(dout, kernel_init=_XAVIER, name=f"linear_{i}")(x)
            if i < n - 1:
                x = _activ(self.activation)(x)
                x = nn.Dropout(self.dropout, deterministic=not train)(x) if self.dropout > 0 else x
        return x


class ConcatMLP(nn.Module):
    """(reference fusions.py:645-675)."""

    output_dim: int
    dimensions: Sequence[int] = (500, 500)
    activation: str = "relu"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x0, x1, *, train: bool = False):
        if x0.ndim == 3 and x1.ndim == 2:
            x1 = jnp.broadcast_to(x1[:, None, :], x0.shape[:2] + x1.shape[-1:])
        if x1.ndim == 3 and x0.ndim == 2:
            x0 = jnp.broadcast_to(x0[:, None, :], x1.shape[:2] + x0.shape[-1:])
        z = jnp.concatenate([x0, x1], axis=-1)
        return MLP(
            tuple(self.dimensions) + (self.output_dim,), self.activation, self.dropout,
            name="mlp",
        )(z, train=train)


class LinearSum(nn.Module):
    """(reference fusions.py:580-643)."""

    output_dim: int
    mm_dim: int = 1200
    activ_input: str = "relu"
    activ_output: str = "relu"
    normalize: bool = False
    dropout_input: float = 0.0
    dropout_pre_lin: float = 0.0
    dropout_output: float = 0.0

    @nn.compact
    def __call__(self, x0, x1, *, train: bool = False):
        x0 = nn.Dense(self.mm_dim, kernel_init=_XAVIER, name="linear0")(x0)
        x1 = nn.Dense(self.mm_dim, kernel_init=_XAVIER, name="linear1")(x1)
        x0, x1 = _activ(self.activ_input)(x0), _activ(self.activ_input)(x1)
        x0 = _drop(x0, self.dropout_input, train)
        x1 = _drop(x1, self.dropout_input, train)
        z = x0 + x1
        if self.normalize:
            z = power_normalize(z)
        z = _drop(z, self.dropout_pre_lin, train)
        z = nn.Dense(self.output_dim, kernel_init=_XAVIER, name="linear_out")(z)
        z = _activ(self.activ_output)(z)
        return _drop(z, self.dropout_output, train)


class MLB(nn.Module):
    """Multimodal low-rank bilinear (reference fusions.py:330-380)."""

    output_dim: int
    mm_dim: int = 256
    activ_input: str = "relu"
    activ_output: str = "relu"
    normalize: bool = False
    dropout_input: float = 0.0
    dropout_pre_lin: float = 0.0
    dropout_output: float = 0.0

    @nn.compact
    def __call__(self, x0, x1, *, train: bool = False):
        x0 = nn.Dense(self.mm_dim, kernel_init=_XAVIER, name="linear0")(x0)
        x1 = nn.Dense(self.mm_dim, kernel_init=_XAVIER, name="linear1")(x1)
        x0, x1 = _activ(self.activ_input)(x0), _activ(self.activ_input)(x1)
        x0 = _drop(x0, self.dropout_input, train)
        x1 = _drop(x1, self.dropout_input, train)
        z = x0 * x1
        if self.normalize:
            z = power_normalize(z)
        z = _drop(z, self.dropout_pre_lin, train)
        z = nn.Dense(self.output_dim, kernel_init=_XAVIER, name="linear_out")(z)
        z = _activ(self.activ_output)(z)
        return _drop(z, self.dropout_output, train)


class GeneralMFB(nn.Module):
    """Full-option MFB (reference fusions.py:382-453); the model's default
    instance lives in dualvgr_tpu/models/fusion.py."""

    output_dim: int
    mm_dim: int = 256
    factor: int = 2
    activ_input: str = "elu"
    activ_output: str = "elu"
    normalize: bool = False
    dropout_input: float = 0.0
    dropout_pre_norm: float = 0.0
    dropout_output: float = 0.0

    @nn.compact
    def __call__(self, x0, x1, *, train: bool = False):
        x0 = nn.Dense(self.mm_dim * self.factor, kernel_init=_XAVIER, name="linear0")(x0)
        x1 = nn.Dense(self.mm_dim * self.factor, kernel_init=_XAVIER, name="linear1")(x1)
        x0, x1 = _activ(self.activ_input)(x0), _activ(self.activ_input)(x1)
        x0 = _drop(x0, self.dropout_input, train)
        x1 = _drop(x1, self.dropout_input, train)
        z = x0 * x1
        z = _drop(z, self.dropout_pre_norm, train)
        z = z.reshape(z.shape[:-1] + (self.mm_dim, self.factor)).sum(-1)
        if self.normalize:
            z = power_normalize(z)
        z = nn.Dense(self.output_dim, kernel_init=_XAVIER, name="linear_out")(z)
        return _activ(self.activ_output)(z)


class MFH(nn.Module):
    """Two-stage factorized high-order pooling (reference fusions.py:455-540)."""

    output_dim: int
    mm_dim: int = 128
    factor: int = 2
    activ_input: str = "relu"
    activ_output: str = "relu"
    normalize: bool = False
    dropout_input: float = 0.0
    dropout_pre_lin: float = 0.0
    dropout_output: float = 0.0

    @nn.compact
    def __call__(self, x0_in, x1_in, *, train: bool = False):
        act = _activ(self.activ_input)
        x0 = act(nn.Dense(self.mm_dim * self.factor, kernel_init=_XAVIER, name="linear0_0")(x0_in))
        x1 = act(nn.Dense(self.mm_dim * self.factor, kernel_init=_XAVIER, name="linear1_0")(x1_in))
        x0 = _drop(x0, self.dropout_input, train)
        x1 = _drop(x1, self.dropout_input, train)
        z0_skip = x0 * x1
        z0_skip = _drop(z0_skip, self.dropout_pre_lin, train)
        z0 = z0_skip.reshape(z0_skip.shape[:-1] + (self.mm_dim, self.factor)).sum(-1)
        if self.normalize:
            z0 = power_normalize(z0)

        x0 = act(nn.Dense(self.mm_dim * self.factor, kernel_init=_XAVIER, name="linear0_1")(x0_in))
        x1 = act(nn.Dense(self.mm_dim * self.factor, kernel_init=_XAVIER, name="linear1_1")(x1_in))
        x0 = _drop(x0, self.dropout_input, train)
        x1 = _drop(x1, self.dropout_input, train)
        z1 = x0 * x1 * z0_skip
        z1 = _drop(z1, self.dropout_pre_lin, train)
        z1 = z1.reshape(z1.shape[:-1] + (self.mm_dim, self.factor)).sum(-1)
        if self.normalize:
            z1 = power_normalize(z1)

        z = jnp.concatenate([z0, z1], axis=-1)
        z = nn.Dense(self.output_dim, kernel_init=_XAVIER, name="linear_out")(z)
        z = _activ(self.activ_output)(z)
        return _drop(z, self.dropout_output, train)


class Mutan(nn.Module):
    """Rank-constrained Tucker fusion (reference fusions.py:205-269)."""

    output_dim: int
    mm_dim: int = 1600
    rank: int = 15
    shared: bool = False
    normalize: bool = False
    dropout_input: float = 0.0
    dropout_pre_lin: float = 0.0
    dropout_output: float = 0.0

    @nn.compact
    def __call__(self, x0, x1, *, train: bool = False):
        linear0 = nn.Dense(self.mm_dim, kernel_init=_XAVIER, name="linear0")
        merge0 = nn.Dense(self.mm_dim * self.rank, kernel_init=_XAVIER, name="merge_linear0")
        if self.shared:
            linear1, merge1 = linear0, merge0
        else:
            linear1 = nn.Dense(self.mm_dim, kernel_init=_XAVIER, name="linear1")
            merge1 = nn.Dense(self.mm_dim * self.rank, kernel_init=_XAVIER, name="merge_linear1")
        x0 = _drop(linear0(x0), self.dropout_input, train)
        x1 = _drop(linear1(x1), self.dropout_input, train)
        m = merge0(x0) * merge1(x1)
        z = m.reshape(m.shape[:-1] + (self.rank, self.mm_dim)).sum(-2)
        if self.normalize:
            z = power_normalize(z)
        z = _drop(z, self.dropout_pre_lin, train)
        z = nn.Dense(self.output_dim, kernel_init=_XAVIER, name="linear_out")(z)
        return _drop(z, self.dropout_output, train)


class Bilinear(nn.Module):
    """torch nn.Bilinear: y_o = x0^T W_o x1 + b_o."""

    features: int

    @nn.compact
    def __call__(self, x0, x1):
        w = self.param(
            "weight", _XAVIER, (self.features, x0.shape[-1], x1.shape[-1])
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return jnp.einsum("...i,oij,...j->...o", x0, w, x1) + b


class Tucker(nn.Module):
    """Full bilinear core (reference fusions.py:272-327)."""

    output_dim: int
    mm_dim: int = 1600
    shared: bool = False
    normalize: bool = False
    dropout_input: float = 0.0
    dropout_pre_lin: float = 0.0
    dropout_output: float = 0.0

    @nn.compact
    def __call__(self, x0, x1, *, train: bool = False):
        x0 = nn.Dense(self.mm_dim, kernel_init=_XAVIER, name="linear0")(x0)
        x1 = nn.Dense(self.mm_dim, kernel_init=_XAVIER, name="linear1")(x1)
        x0 = _drop(x0, self.dropout_input, train)
        x1 = _drop(x1, self.dropout_input, train)
        z = Bilinear(self.mm_dim, name="bilinear")(x0, x1)
        if self.normalize:
            z = power_normalize(z)
        z = _drop(z, self.dropout_pre_lin, train)
        z = nn.Dense(self.output_dim, kernel_init=_XAVIER, name="linear_out")(z)
        return _drop(z, self.dropout_output, train)


class Block(nn.Module):
    """Block-superdiagonal bilinear fusion (reference fusions.py:56-134)."""

    output_dim: int
    mm_dim: int = 1600
    chunks: int = 20
    rank: int = 15
    shared: bool = False
    dropout_input: float = 0.0
    dropout_pre_lin: float = 0.0
    dropout_output: float = 0.0
    pos_norm: str = "before_cat"

    @nn.compact
    def __call__(self, x0, x1, *, train: bool = False):
        assert self.pos_norm in ("before_cat", "after_cat")
        linear0 = nn.Dense(self.mm_dim, kernel_init=_XAVIER, name="linear0")
        linear1 = linear0 if self.shared else nn.Dense(
            self.mm_dim, kernel_init=_XAVIER, name="linear1"
        )
        x0 = _drop(linear0(x0), self.dropout_input, train)
        x1 = _drop(linear1(x1), self.dropout_input, train)
        sizes = get_sizes_list(self.mm_dim, self.chunks)
        zs = []
        begin = 0
        for idx, size in enumerate(sizes):
            x0_c = x0[..., begin : begin + size]
            x1_c = x1[..., begin : begin + size]
            begin += size
            m0 = nn.Dense(size * self.rank, kernel_init=_XAVIER, name=f"merge0_{idx}")
            m1 = m0 if self.shared else nn.Dense(
                size * self.rank, kernel_init=_XAVIER, name=f"merge1_{idx}"
            )
            m = m0(x0_c) * m1(x1_c)
            z = m.reshape(m.shape[:-1] + (self.rank, size)).sum(-2)
            if self.pos_norm == "before_cat":
                z = power_normalize(z)
            zs.append(z)
        z = jnp.concatenate(zs, axis=-1)
        if self.pos_norm == "after_cat":
            z = power_normalize(z)
        z = _drop(z, self.dropout_pre_lin, train)
        z = nn.Dense(self.output_dim, kernel_init=_XAVIER, name="linear_out")(z)
        return _drop(z, self.dropout_output, train)


class BlockTucker(nn.Module):
    """Block-diagonal Tucker fusion (reference fusions.py:137-202)."""

    output_dim: int
    mm_dim: int = 1600
    chunks: int = 20
    shared: bool = False
    dropout_input: float = 0.0
    dropout_pre_lin: float = 0.0
    dropout_output: float = 0.0
    pos_norm: str = "before_cat"

    @nn.compact
    def __call__(self, x0, x1, *, train: bool = False):
        assert self.pos_norm in ("before_cat", "after_cat")
        linear0 = nn.Dense(self.mm_dim, kernel_init=_XAVIER, name="linear0")
        linear1 = linear0 if self.shared else nn.Dense(
            self.mm_dim, kernel_init=_XAVIER, name="linear1"
        )
        x0 = _drop(linear0(x0), self.dropout_input, train)
        x1 = _drop(linear1(x1), self.dropout_input, train)
        sizes = get_sizes_list(self.mm_dim, self.chunks)
        zs, begin = [], 0
        for idx, size in enumerate(sizes):
            z = Bilinear(size, name=f"bilinear_{idx}")(
                x0[..., begin : begin + size], x1[..., begin : begin + size]
            )
            begin += size
            if self.pos_norm == "before_cat":
                z = power_normalize(z)
            zs.append(z)
        z = jnp.concatenate(zs, axis=-1)
        if self.pos_norm == "after_cat":
            z = power_normalize(z)
        z = _drop(z, self.dropout_pre_lin, train)
        z = nn.Dense(self.output_dim, kernel_init=_XAVIER, name="linear_out")(z)
        return _drop(z, self.dropout_output, train)


class CountSketch(nn.Module):
    """Count sketch with fixed (non-learned) hash/sign vectors
    (reference compactbilinearpooling.py:60-120)."""

    input_size: int
    output_size: int
    seed: int = 0

    def setup(self):
        key = jax.random.PRNGKey(self.seed)
        kh, ks = jax.random.split(key)
        self.h = jax.random.randint(kh, (self.input_size,), 0, self.output_size)
        self.s = (
            jax.random.randint(ks, (self.input_size,), 0, 2).astype(jnp.float32) * 2.0
            - 1.0
        )

    def __call__(self, x):
        xs = x * self.s
        out = jnp.zeros(x.shape[:-1] + (self.output_size,), x.dtype)
        return out.at[..., self.h].add(xs)


class MCB(nn.Module):
    """Compact bilinear pooling: count sketch + FFT circular convolution
    (reference fusions.py:543-577, compactbilinearpooling.py). The
    reference's CUDA pytorch_fft dependency is replaced by jnp.fft."""

    output_dim: int
    mm_dim: int = 16000
    activ_output: str = "relu"
    dropout_output: float = 0.0
    seed: int = 0

    @nn.compact
    def __call__(self, x0, x1, *, train: bool = False):
        s0 = CountSketch(x0.shape[-1], self.mm_dim, seed=self.seed, name="sketch0")(x0)
        s1 = CountSketch(x1.shape[-1], self.mm_dim, seed=self.seed + 1, name="sketch1")(x1)
        f0 = jnp.fft.rfft(s0, axis=-1)
        f1 = jnp.fft.rfft(s1, axis=-1)
        z = jnp.fft.irfft(f0 * f1, n=self.mm_dim, axis=-1)
        z = nn.Dense(self.output_dim, kernel_init=_XAVIER, name="linear_out")(z)
        z = _activ(self.activ_output)(z)
        return _drop(z, self.dropout_output, train)


FUSIONS = {
    "block": Block,
    "block_tucker": BlockTucker,
    "mutan": Mutan,
    "tucker": Tucker,
    "mlb": MLB,
    "mfb": GeneralMFB,
    "mfh": MFH,
    "mcb": MCB,
    "linear_sum": LinearSum,
    "cat_mlp": ConcatMLP,
}


def fusion_factory(name: str, **kwargs):
    """Fusion registry (reference model/fusions/factory.py:14-42)."""
    if name not in FUSIONS:
        raise ValueError(f"unknown fusion {name!r}; available: {sorted(FUSIONS)}")
    return FUSIONS[name](**kwargs)

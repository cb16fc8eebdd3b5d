"""Probe: stem-conv lowerings for the 3D ResNeXt motion backbone.

The stage attribution (groupedconv_probe) puts the stem — one 7x7x7
stride-(1,2,2) conv from THREE input channels + BN/relu/maxpool — at
10.9 ms of the 28.7 ms backbone at batch 32: C_in=3 fills 3/128 MXU lanes.
Candidates, all numerically identical to the baseline (verified on CPU in
tests/test_backbones.py):

  base      nn.Conv as shipped
  pad8      zero-pad input channels 3 -> 8 (kernel rows 3..7 zero)
  s2d       space-to-depth: fold the HxW stride-2 into channels
            ((..., 112, 112, 3) -> (..., 56, 56, 12)); the 7x7 spatial taps
            become 4x4 on the folded grid with matching zero slots, so the
            conv runs stride-1 from 12 channels (the standard TPU ResNet
            stem trick)

    python benchmarks/stem_probe.py [--clips 32] [--steps 50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(fn, x, steps, repeats=4):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(x, n):
        def body(i, carry):
            acc, eps = carry
            out = fn(x + eps)
            s = out.sum().astype(jnp.float32)
            return acc + s, (s * 1e-30).astype(x.dtype)

        acc, _ = jax.lax.fori_loop(
            0, n, body, (jnp.zeros((), "float32"), jnp.zeros((), x.dtype))
        )
        return acc

    float(chained(x, 1))
    float(chained(x, steps + 1))
    t1s, tns = [], []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(chained(x, 1))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(chained(x, steps + 1))
        tns.append(time.perf_counter() - t0)
    return max(min(tns) - min(t1s), 0.0) / steps


def fold_s2d(x):
    """(B, T, H, W, 3) -> (B, T, H/2, W/2, 12), fold layout (pr, pc, ch)."""
    import jax.numpy as jnp

    b, t, h, w, c = x.shape
    y = x.reshape(b, t, h // 2, 2, w // 2, 2, c)
    y = y.transpose(0, 1, 2, 4, 3, 5, 6)
    return y.reshape(b, t, h // 2, w // 2, 4 * c)


def s2d_kernel(k):
    """(7, 7, 7, 3, 64) -> (7, 4, 4, 12, 64) matching fold_s2d.

    dh = 2R + pr - 1 (invalid slots zero); same for dw.
    """
    import jax.numpy as jnp

    t, _, _, cin, cout = k.shape
    kd = jnp.zeros((t, 4, 4, 2, 2, cin, cout), k.dtype)
    for R in range(4):
        for pr in range(2):
            dh = 2 * R + pr - 1
            if not 0 <= dh <= 6:
                continue
            for C in range(4):
                for pc in range(2):
                    dw = 2 * C + pc - 1
                    if not 0 <= dw <= 6:
                        continue
                    kd = kd.at[:, R, C, pr, pc, :, :].set(k[:, dh, dw, :, :])
    return kd.reshape(t, 4, 4, 4 * cin, cout)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=32)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument(
        "--chain", action="store_true",
        help="time conv+bn+relu+maxpool chains (s2d vs t2d vs folded-bn t2d)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.RandomState(0)
    B = args.clips
    x = jnp.asarray(rng.randn(B, 16, 112, 112, 3).astype(np.float32))
    k = jnp.asarray((rng.randn(7, 7, 7, 3, 64) * 0.05).astype(np.float32))
    dn = ("NDHWC", "DHWIO", "NDHWC")

    def base(x):
        return jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 2, 2), [(3, 3), (3, 3), (3, 3)],
            dimension_numbers=dn,
        )

    k8 = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, 5), (0, 0)))

    def pad8(x):
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 0), (0, 5)))
        return jax.lax.conv_general_dilated(
            xp, k8.astype(x.dtype), (1, 2, 2), [(3, 3), (3, 3), (3, 3)],
            dimension_numbers=dn,
        )

    ks = s2d_kernel(k)

    def s2d(x):
        xf = fold_s2d(x)
        return jax.lax.conv_general_dilated(
            xf, ks.astype(x.dtype), (1, 1, 1), [(3, 3), (2, 1), (2, 1)],
            dimension_numbers=dn,
        )

    # s2d + T-tap fold: materialize the 7 T-windows as channels (12 -> 84)
    # so the conv becomes kernel (1, 4, 4) from 84 channels — attacks the
    # thin-channel layout (12/128 lanes) the plain s2d conv still has
    kt = jnp.concatenate(
        [ks[t] for t in range(7)], axis=-2
    )[None]  # (1, 4, 4, 84, 64), tap-major channel blocks

    def s2d_tfold(x):
        xf = fold_s2d(x)  # (B, 16, 56, 56, 12)
        xp = jnp.pad(xf, ((0, 0), (3, 3), (0, 0), (0, 0), (0, 0)))
        wins = jnp.concatenate(
            [xp[:, t:t + 16] for t in range(7)], axis=-1
        )  # (B, 16, 56, 56, 84)
        return jax.lax.conv_general_dilated(
            wins, kt.astype(x.dtype), (1, 1, 1), [(0, 0), (2, 1), (2, 1)],
            dimension_numbers=dn,
        )

    # s2d + N-merged taps: ONE (1,4,4) conv from 12 channels into 7*64=448
    # output channels (each 64-block = one temporal tap's spatial conv — the
    # (1,4,4) conv shape measures 150 TFLOPS where the 7-tap 3D conv
    # collapses to ~50), then a single fused shifted-sum over the tap blocks.
    # Trades ~3x output-channel FLOPs-free lane occupancy for one extra
    # (B,16,56,56,448) round-trip.
    kn = jnp.concatenate([ks[t] for t in range(7)], axis=-1)[None]  # (1,4,4,12,448)

    def s2d_nmerge(x):
        xf = fold_s2d(x)
        y = jax.lax.conv_general_dilated(
            xf, kn.astype(x.dtype), (1, 1, 1), [(0, 0), (2, 1), (2, 1)],
            dimension_numbers=dn,
        )  # (B, 16, 56, 56, 448)
        out = None
        for tap in range(7):
            block = y[..., tap * 64 : (tap + 1) * 64]
            shift = tap - 3
            sl = block[:, max(shift, 0) : 16 + min(shift, 0)]
            pads = ((0, 0), (max(-shift, 0), max(shift, 0)), (0, 0), (0, 0), (0, 0))
            term = jnp.pad(sl, pads)
            out = term if out is None else out + term
        return out

    # s2d + TIME-to-depth: fold padded-T pairs into channels (12 -> 24) and
    # output-t pairs into output channels (64 -> 128). The 7 T-taps become 4
    # folded taps (kt = 2*ft + pt - q; one invalid slot per output parity),
    # so the conv is (4, 4, 4) from 24 to 128 channels: K = 4*4*4*24 = 1536
    # (12 exact 128-lane tiles), N = 128 (exact), at 8/7 the FLOPs — attacks
    # the sharp diagnosis that XLA collapses once a 7-tap third dim exists
    # while the same positions as (1, 4, 4) run at 150 TFLOPS.
    kt2 = jnp.zeros((4, 4, 4, 2, 12, 2, 64), ks.dtype)
    for q in range(2):
        for ft in range(4):
            for pt in range(2):
                ktap = 2 * ft + pt - q
                if 0 <= ktap <= 6:
                    kt2 = kt2.at[ft, :, :, pt, :, q, :].set(ks[ktap])
    kt2 = kt2.reshape(4, 4, 4, 24, 128)

    def t2d_folded(x):
        """t2d conv output kept in FOLDED layout (B, 8, 56, 56, 2*64)."""
        xf = fold_s2d(x)  # (B, 16, 56, 56, 12)
        b = xf.shape[0]
        xp = jnp.pad(xf, ((0, 0), (3, 3), (0, 0), (0, 0), (0, 0)))
        x2 = xp.reshape(b, 11, 2, 56, 56, 12).transpose(0, 1, 3, 4, 2, 5)
        x2 = x2.reshape(b, 11, 56, 56, 24)
        return jax.lax.conv_general_dilated(
            x2, kt2.astype(x.dtype), (1, 1, 1), [(0, 0), (2, 1), (2, 1)],
            dimension_numbers=dn,
        )  # (B, 8, 56, 56, 128)

    def t2d_unfold(y):
        b = y.shape[0]
        y = y.reshape(b, 8, 56, 56, 2, 64).transpose(0, 1, 4, 2, 3, 5)
        return y.reshape(b, 16, 56, 56, 64)

    def t2d(x):
        return t2d_unfold(t2d_folded(x))

    # same folding, but the 4 folded-T taps as 4 accumulated (1, 4, 4) convs
    # (the PROVEN-fast kernel shape) — trades 3 extra output round-trips for
    # 2D-conv lowering certainty
    def t2d_sum4(x):
        xf = fold_s2d(x)
        b = xf.shape[0]
        xp = jnp.pad(xf, ((0, 0), (3, 3), (0, 0), (0, 0), (0, 0)))
        x2 = xp.reshape(b, 11, 2, 56, 56, 12).transpose(0, 1, 3, 4, 2, 5)
        x2 = x2.reshape(b, 11, 56, 56, 24)
        y = None
        for ft in range(4):
            term = jax.lax.conv_general_dilated(
                x2[:, ft:ft + 8], kt2[ft:ft + 1].astype(x.dtype), (1, 1, 1),
                [(0, 0), (2, 1), (2, 1)], dimension_numbers=dn,
            )
            y = term if y is None else y + term
        y = y.reshape(b, 8, 56, 56, 2, 64).transpose(0, 1, 4, 2, 3, 5)
        return y.reshape(b, 16, 56, 56, 64)

    # fold T by 4 instead: (2, 4, 4) conv, 48 -> 256 channels, K = 2304,
    # at 1.5x t2d's FLOPs (kernel density 7/12 vs 7/8) — probes whether
    # wider channels buy more than the padding costs
    kt4 = jnp.zeros((3, 4, 4, 4, 12, 4, 64), ks.dtype)
    for q in range(4):
        for ft in range(3):
            for pt in range(4):
                ktap = 4 * ft + pt - q
                if 0 <= ktap <= 6:
                    kt4 = kt4.at[ft, :, :, pt, :, q, :].set(ks[ktap])
    kt4 = kt4.reshape(3, 4, 4, 48, 256)

    def t4d(x):
        xf = fold_s2d(x)
        b = xf.shape[0]
        xp = jnp.pad(xf, ((0, 0), (3, 5), (0, 0), (0, 0), (0, 0)))  # 24 = 6 cells
        x4 = xp.reshape(b, 6, 4, 56, 56, 12).transpose(0, 1, 3, 4, 2, 5)
        x4 = x4.reshape(b, 6, 56, 56, 48)
        y = jax.lax.conv_general_dilated(
            x4, kt4.astype(x.dtype), (1, 1, 1), [(0, 0), (2, 1), (2, 1)],
            dimension_numbers=dn,
        )  # (B, 4, 56, 56, 256)
        y = y.reshape(b, 4, 56, 56, 4, 64).transpose(0, 1, 4, 2, 3, 5)
        return y.reshape(b, 16, 56, 56, 64)

    if args.chain:
        # the stem never runs alone: time conv -> BN(inference affine) ->
        # relu -> maxpool. The in-network t2d loss (extraction_bench
        # --stem-ab) is diagnosed as the un-interleave transpose breaking
        # this fusion chain; t2d_foldbn applies the affine+relu IN the
        # folded layout (params tiled 2x) so the transpose moves next to
        # the pool.
        scale = jnp.asarray(rng.rand(64).astype(np.float32)) + 0.5
        bias = jnp.asarray(rng.randn(64).astype(np.float32))
        scale2 = jnp.concatenate([scale, scale])
        bias2 = jnp.concatenate([bias, bias])

        def pool(z):
            return jax.lax.reduce_window(
                z, -jnp.inf, jax.lax.max, (1, 3, 3, 3, 1), (1, 2, 2, 2, 1),
                ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)),
            )

        def chain_s2d(x):
            y = s2d(x)
            return pool(jax.nn.relu(y * scale.astype(y.dtype) + bias.astype(y.dtype)))

        def chain_t2d(x):
            y = t2d(x)
            return pool(jax.nn.relu(y * scale.astype(y.dtype) + bias.astype(y.dtype)))

        def chain_t2d_foldbn(x):
            yf = t2d_folded(x)
            z = jax.nn.relu(yf * scale2.astype(yf.dtype) + bias2.astype(yf.dtype))
            return pool(t2d_unfold(z))

    def check_against(ref_fn, named_fns):
        ref = ref_fn(x[:2])
        for name, fn in named_fns:
            got = fn(x[:2])
            err = float(jnp.max(jnp.abs(got - ref)))
            assert got.shape == ref.shape and err < 1e-3, (name, got.shape, ref.shape, err)

    def time_all(named_fns):
        """One timing protocol for every mode: fp32 + bf16 per variant."""
        out = {"clips": B}
        xb = x.astype(jnp.bfloat16)
        for name, fn in named_fns:
            out[f"{name}_ms"] = round(chain_time(fn, x, args.steps) * 1e3, 3)
            print(f"# {name}: {out[f'{name}_ms']}", flush=True)
            out[f"{name}_bf16_ms"] = round(chain_time(fn, xb, args.steps) * 1e3, 3)
            print(f"# {name}_bf16: {out[f'{name}_bf16_ms']}", flush=True)
        print(json.dumps(out))

    if args.chain:
        check_against(chain_s2d, [("chain_t2d", chain_t2d),
                                  ("chain_t2d_foldbn", chain_t2d_foldbn)])
        time_all([("chain_s2d", chain_s2d), ("chain_t2d", chain_t2d),
                  ("chain_t2d_foldbn", chain_t2d_foldbn)])
        return

    variants = [("pad8", pad8), ("s2d", s2d), ("s2d_tfold", s2d_tfold),
                ("s2d_nmerge", s2d_nmerge), ("t2d", t2d),
                ("t2d_sum4", t2d_sum4), ("t4d", t4d)]
    check_against(base, variants)
    time_all([("base", base)] + variants)


if __name__ == "__main__":
    main()

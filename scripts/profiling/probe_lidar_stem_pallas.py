"""Probe: fused Pallas stem at the lidar-BEV shape (G = W/4 = 64 lanes).

The round-5 b1 profile (docs/profiling.md) showed the lidar stem conv as the
single largest b1 component (0.212 ms, 18.7%) — the only stem still on XLA's
low-lane-occupancy conv emitter because `supports_fused_stem` requires
W/4 % 128 == 0 (the lidar BEV is 256 wide -> 64 lane groups). This probe
bypasses the gate to answer whether the kernel wins at half-dense lanes.

Measured answer (v5e, 2026-08-19): compiles clean, numerics match XLA
(rel err ~5e-3 in bf16), but the A/B is a WASH — 0.66/0.68/1.06 ms Pallas vs
0.69/0.62/1.09 ms XLA (chained wall, B=1 C=1 / B=1 C=2 / B=16 C=2). With 64
of 128 lanes live the kernel loses its MXU-tile advantage, so the 128-lane
gate stays. Kept as the reproduction for that rejection.

Run: python scripts/profiling/probe_lidar_stem_pallas.py  (needs the TPU)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from diffusiondrive_tpu.ops.stem_fused import (
    _stem_pallas, pack_stem_weights_planar, to_planar,
)


def fused_stem_nocheck(x, w, scale, bias):
    """fused_stem with the supports_fused_stem gate bypassed (probe only)."""
    xp = to_planar(x)
    xp = jnp.pad(xp, ((0, 0), (5, 3), (0, 16 - xp.shape[2]), (0, 0)))
    wt = pack_stem_weights_planar(w.astype(x.dtype))
    sb = jnp.stack([jnp.tile(scale.astype(jnp.float32), 2),
                    jnp.tile(bias.astype(jnp.float32), 2)])
    planar = _stem_pallas(xp, wt, sb)
    return planar.transpose(0, 1, 3, 2)


def xla_stem(x, w, scale, bias):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jnp.maximum(y * scale + bias, 0.0)
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))


def main() -> None:
    rng = np.random.default_rng(0)
    for B, C in [(1, 1), (1, 2), (16, 2)]:
        x = jnp.asarray(rng.normal(size=(B, 256, 256, C)).astype(np.float32) * 0.5,
                        jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(7, 7, C, 64)).astype(np.float32) * 0.1,
                        jnp.bfloat16)
        scale = jnp.asarray(rng.uniform(0.5, 1.5, 64).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=64).astype(np.float32) * 0.1)

        f_p = jax.jit(fused_stem_nocheck)
        f_x = jax.jit(xla_stem)
        try:
            yp = np.asarray(f_p(x, w, scale, bias), np.float32)
        except Exception as e:  # Mosaic lowering may reject the shape outright
            print(f"B={B} C={C}: PALLAS FAILED: {type(e).__name__}: {str(e)[:300]}")
            continue
        yx = np.asarray(f_x(x, w, scale, bias), np.float32)
        err = np.max(np.abs(yp - yx)) / max(np.max(np.abs(yx)), 1e-9)
        print(f"B={B} C={C}: shapes {yp.shape} vs {yx.shape}, rel err {err:.2e}")

        # Chained dependency + final fetch: block_until_ready alone does not
        # await execution through the tunnel (CLAUDE.md / bench.py:measure).
        for name, fn in [("pallas", f_p), ("xla", f_x)]:
            @jax.jit
            def chained(x_, w_, scale_, bias_):
                out = fn(x_, w_, scale_, bias_)
                tok = out.ravel()[:1].astype(x_.dtype) * 1e-30
                return x_ + tok
            np.asarray(jax.device_get(chained(x, w, scale, bias).ravel()[:1]))
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                cc = x
                for _ in range(50):
                    cc = chained(cc, w, scale, bias)
                np.asarray(jax.device_get(cc.ravel()[:1]))
                best = min(best, (time.perf_counter() - t0) / 50)
            print(f"  {name}: {best*1e3:.3f} ms/launch (chained wall)")


if __name__ == "__main__":
    main()

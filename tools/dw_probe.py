"""Filter-gradient (dW) conv experiment for the train-MFU deficit.

PERF.md's round-3 backward profile localizes the train-MFU gap (40.7% vs
65.7% serving) partly to grad-filter convs with small channel counts: the
decoder's (3,3,32,32) dW runs at 23.8 TFLOP/s (3.2 ms at batch 64 / 256^2)
because a 32-wide output tile cannot fill the 128x128 MXU, and XLA's
conv-backward re-reads the activations once per filter tap.

This probe measures, on the chip, for the profiled shape class:

  xla        lax.conv vjp wrt the filter — what the train step runs today
  pad_co     zero-pad dy's channels to 128 before the same vjp (4x FLOPs at
             full MXU rate; the sliced result is bit-identical math)
  pad_cico   pad both channel dims to 128 (16x FLOPs, full rate)
  pallas     read-once Pallas kernel: row-chunked grid, halo rows via a
             second blocked view of the same array, all 9 taps concatenated
             into ONE (p,288)x(p,32) MXU contraction per chunk, f32
             accumulator resident in the output block across the grid
  pallas9    same kernel but 9 separate (p,32)x(p,32) tap contractions
             (isolates the cost of the lane-concat vs the MXU underfill)

Ceiling math for (3,3,32,32) at batch 64 / 256^2 (77 GFLOP): HBM floor
(read x and dy exactly once) 0.54 GB -> ~0.66 ms; MXU floor with a 32-wide
output ~49 TFLOP/s -> ~1.6 ms. XLA today: ~3.2 ms.

Usage:  python tools/dw_probe.py [--iters 20]
Prints one result line per (shape, variant) and a JSON summary.
"""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DN = ("NHWC", "HWIO", "NHWC")


def conv_same(x, w):
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME", dimension_numbers=DN)


def dw_xla(x, dy, kh, kw):
    ci, co = x.shape[-1], dy.shape[-1]
    w0 = jnp.zeros((kh, kw, ci, co), jnp.bfloat16)
    _, vjp = jax.vjp(lambda w: conv_same(x, w), w0)
    (dw,) = vjp(dy)
    return dw


def dw_pad_co(x, dy, kh, kw, pad_to=128):
    co = dy.shape[-1]
    dy_p = jnp.pad(dy, ((0, 0), (0, 0), (0, 0), (0, pad_to - co)))
    return dw_xla(x, dy_p, kh, kw)[..., :co]


def dw_pad_cico(x, dy, kh, kw, pad_to=128):
    ci = x.shape[-1]
    x_p = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad_to - ci)))
    return dw_pad_co(x_p, dy, kh, kw)[:, :, :ci, :]


def _dw_kernel(x_ref, halo_ref, dy_ref, out_ref, *, bh, w, c, taps, concat):
    """One (batch, row-chunk) grid step of the read-once dW.

    x_ref:    (1, bh, w+2, c) block of the H,W zero-padded activations
    halo_ref: (1, 2,  w+2, c) block = the two rows after this chunk
    dy_ref:   (1, bh, w,   c) block of the cotangent
    out_ref:  (kh*kw*c, c) f32, same block every step (resident accumulator)
    """
    xs = jnp.concatenate([x_ref[0], halo_ref[0]], axis=0)  # (bh+2, w+2, c)
    dyf = dy_ref[0].reshape(bh * w, c)
    parts = []
    for (dh, dw_) in taps:
        parts.append(xs[dh:dh + bh, dw_:dw_ + w, :].reshape(bh * w, c))
    if concat:
        a = jnp.concatenate(parts, axis=1)  # (bh*w, taps*c)
        acc = lax.dot_general(a, dyf, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    else:
        acc = jnp.concatenate(
            [lax.dot_general(p, dyf, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
             for p in parts], axis=0)
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        out_ref[...] = acc

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[...] = out_ref[...] + acc


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def dw_pallas(x, dy, kh, kw, bh=16, concat=True):
    """Read-once dW for a stride-1 SAME conv, NHWC/HWIO, odd kh=kw."""
    b, h, w, c = x.shape
    co = dy.shape[-1]
    assert co == c and kh == kw and kh % 2 == 1 and h % bh == 0
    ph = kh // 2
    # zero-pad H and W once (SAME padding), so every tap is a plain slice
    xp = jnp.pad(x, ((0, 0), (ph, ph), (ph, ph), (0, 0)))
    taps = tuple((dh, dw_) for dh in range(kh) for dw_ in range(kw))
    kern = functools.partial(_dw_kernel, bh=bh, w=w, c=c, taps=taps,
                             concat=concat)
    assert (bh * (len(taps) // kh)) % 2 == 0
    grid = (b, h // bh)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bh, w + 2 * ph, c), lambda i, r: (i, r, 0, 0),
                         memory_space=pltpu.VMEM),
            # the 2*ph halo rows just below this chunk: element rows
            # r*bh + bh .. r*bh + bh + 2*ph, i.e. block index (r+1)*bh/(2ph)
            pl.BlockSpec((1, 2 * ph, w + 2 * ph, c),
                         lambda i, r: (i, (r + 1) * (bh // (2 * ph)), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh, w, c), lambda i, r: (i, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kh * kw * c, c), lambda i, r: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kh * kw * c, c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * kh * kw * c * co,
            bytes_accessed=x.size * 2 + dy.size * 2 + kh * kw * c * co * 4,
            transcendentals=0),
    )(xp, xp, dy)
    return out.reshape(kh, kw, c, co)


def timed(fn, args, iters):
    """Median ms/call: iters chained calls inside ONE dispatch (scalar sync,
    data dependency through a scalar — PERF.md measurement method)."""
    x = args[0]

    def body(_, carry):
        s, out = carry
        o = fn(x * (1 + 0 * s), *args[1:])
        return (o.reshape(-1)[0].astype(jnp.float32), o)

    @jax.jit
    def run():
        s, out = lax.fori_loop(0, iters, body, (jnp.float32(0), fn(*args)))
        return s + out.reshape(-1)[0].astype(jnp.float32)

    run().block_until_ready()  # compile + warm
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run())
        # the init call inside run() is a real (iters+1)-th evaluation
        reps.append((time.perf_counter() - t0) / (iters + 1))
    return sorted(reps)[1] * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    results = []
    for (h, c, kh) in [(256, 32, 3), (128, 64, 3)]:
        kx, kdy = jax.random.split(key)
        x = jax.random.normal(kx, (args.batch, h, h, c), jnp.bfloat16)
        dy = jax.random.normal(kdy, (args.batch, h, h, c), jnp.bfloat16)
        gflop = 2 * args.batch * h * h * kh * kh * c * c / 1e9

        ref = np.asarray(dw_xla(x, dy, kh, kh), np.float32)
        variants = {
            "xla": lambda x, dy: dw_xla(x, dy, kh, kh),
            "pad_co": lambda x, dy: dw_pad_co(x, dy, kh, kh),
            "pad_cico": lambda x, dy: dw_pad_cico(x, dy, kh, kh),
            "pallas": lambda x, dy: dw_pallas(x, dy, kh, kh, 16, True),
            "pallas9": lambda x, dy: dw_pallas(x, dy, kh, kh, 16, False),
        }
        for name, fn in variants.items():
            got = np.asarray(fn(x, dy), np.float32)
            if name.startswith("pallas"):
                got = got.reshape(kh, kh, c, c)
            err = float(np.max(np.abs(got - ref)) / (np.abs(ref).max() + 1e-9))
            ms = timed(fn, (x, dy), args.iters)
            tfps = gflop / ms
            results.append({"shape": f"({kh},{kh},{c},{c})@b{args.batch}x{h}",
                            "variant": name, "ms": round(ms, 3),
                            "tflops": round(tfps, 1), "rel_err": err})
            print(f"{results[-1]['shape']:>24} {name:>9}: {ms:7.3f} ms  "
                  f"{tfps:6.1f} TFLOP/s  rel_err {err:.2e}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

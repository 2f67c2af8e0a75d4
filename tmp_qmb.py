"""Microbench int4/int8 fused dequant-matmul kernel variants on the chip.

Variants (int4):
  A: current production kernel (widen int32, mask/shift/sub, concat, cast)
  B: planar two-dot (no concat): dot(x_lo, low) + dot(x_hi, high)
  C: offset-correction: dot in unsigned nibbles, subtract 8*rowsum(x) after
  D: B+C combined
  E: D + output-column chunking (interleave unpack_j+1 with dot_j)
"""
import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ap = argparse.ArgumentParser()
ap.add_argument("--t", type=int, default=64)
ap.add_argument("--steps", type=int, default=256)
ap.add_argument("--bits", default="int4")
args = ap.parse_args()

T = args.t
K = args.steps
L = 28


def kernel_A(li_ref, x_ref, q_ref, s_ref, o_ref, acc_ref, *, n_groups, packed4):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    if packed4:
        p = q_ref[0, 0].astype(jnp.int32)
        w = jnp.concatenate([(p & 0xF) - 8, (p >> 4) - 8], axis=0).astype(x.dtype)
    else:
        w = q_ref[0, 0].astype(x.dtype)
    acc_ref[...] += jnp.dot(x, w, preferred_element_type=jnp.float32) * s_ref[0, 0]

    @pl.when(g == n_groups - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def kernel_B(li_ref, x_ref, q_ref, s_ref, o_ref, acc_ref, *, n_groups, packed4):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    half = x.shape[1] // 2
    p = q_ref[0, 0].astype(jnp.int32)
    lo = ((p & 0xF) - 8).astype(x.dtype)
    hi = ((p >> 4) - 8).astype(x.dtype)
    d = jnp.dot(x[:, :half], lo, preferred_element_type=jnp.float32)
    d += jnp.dot(x[:, half:], hi, preferred_element_type=jnp.float32)
    acc_ref[...] += d * s_ref[0, 0]

    @pl.when(g == n_groups - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def kernel_C(li_ref, x_ref, q_ref, s_ref, o_ref, acc_ref, *, n_groups, packed4):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    p = q_ref[0, 0].astype(jnp.int32)
    w = jnp.concatenate([p & 0xF, p >> 4], axis=0).astype(x.dtype)
    d = jnp.dot(x, w, preferred_element_type=jnp.float32)
    corr = 8.0 * jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
    acc_ref[...] += (d - corr) * s_ref[0, 0]

    @pl.when(g == n_groups - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def kernel_D(li_ref, x_ref, q_ref, s_ref, o_ref, acc_ref, *, n_groups, packed4):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    half = x.shape[1] // 2
    p = q_ref[0, 0].astype(jnp.int32)
    lo = (p & 0xF).astype(x.dtype)
    hi = (p >> 4).astype(x.dtype)
    d = jnp.dot(x[:, :half], lo, preferred_element_type=jnp.float32)
    d += jnp.dot(x[:, half:], hi, preferred_element_type=jnp.float32)
    corr = 8.0 * jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
    acc_ref[...] += (d - corr) * s_ref[0, 0]

    @pl.when(g == n_groups - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def kernel_E(li_ref, x_ref, q_ref, s_ref, o_ref, acc_ref, *, n_groups, packed4,
             n_chunks=4):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    half = x.shape[1] // 2
    out = q_ref.shape[-1]
    C = out // n_chunks
    corr = 8.0 * jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
    for j in range(n_chunks):
        p = q_ref[0, 0, :, j * C : (j + 1) * C].astype(jnp.int32)
        lo = (p & 0xF).astype(x.dtype)
        hi = (p >> 4).astype(x.dtype)
        d = jnp.dot(x[:, :half], lo, preferred_element_type=jnp.float32)
        d += jnp.dot(x[:, half:], hi, preferred_element_type=jnp.float32)
        acc_ref[:, j * C : (j + 1) * C] += (d - corr) * s_ref[0, 0, :, j * C : (j + 1) * C]

    @pl.when(g == n_groups - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def kernel_I8(li_ref, x_ref, q_ref, s_ref, o_ref, acc_ref, *, n_groups, packed4):
    return kernel_A(li_ref, x_ref, q_ref, s_ref, o_ref, acc_ref,
                    n_groups=n_groups, packed4=False)


def make_call(kernel, d_in, out, packed4, gs=128):
    G = d_in // gs
    rows = gs // 2 if packed4 else gs

    def f(x, q, s, li):
        li = jnp.reshape(jnp.asarray(li, jnp.int32), (1,))
        return pl.pallas_call(
            functools.partial(kernel, n_groups=G, packed4=packed4),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(G,),
                in_specs=[
                    pl.BlockSpec((T, gs), lambda g, li_ref: (0, g)),
                    pl.BlockSpec((1, 1, rows, out), lambda g, li_ref: (li_ref[0], g, 0, 0)),
                    pl.BlockSpec((1, 1, 1, out), lambda g, li_ref: (li_ref[0], g, 0, 0)),
                ],
                out_specs=pl.BlockSpec((T, out), lambda g, li_ref: (0, 0)),
                scratch_shapes=[pltpu.VMEM((T, out), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((T, out), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(li, x, q, s)

    return f


SHAPES = {  # fused 0.6B decode projections
    "qkv": (1024, 4096),
    "o": (2048, 1024),
    "gate_up": (1024, 6144),
    "down": (3072, 1024),
}

packed4 = args.bits == "int4"
rng = np.random.default_rng(0)
weights = {}
for name, (d_in, out) in SHAPES.items():
    G = d_in // 128
    rows = 64 if packed4 else 128
    q = jnp.asarray(rng.integers(0, 255 if packed4 else 127,
                                 (L, G, rows, out)),
                    jnp.uint8 if packed4 else jnp.int8)
    s = jnp.asarray(rng.random((L, G, 1, out), np.float32) * 0.01)
    weights[name] = (q, s)
x0 = jnp.asarray(rng.standard_normal((T, 1024)), jnp.bfloat16)

variants = {"A": kernel_A, "B": kernel_B, "C": kernel_C, "D": kernel_D,
            "E": kernel_E}
if not packed4:
    variants = {"A": kernel_A}

for vname, kern in variants.items():
    calls = {n: make_call(kern, d_in, out, packed4)
             for n, (d_in, out) in SHAPES.items()}

    @jax.jit
    def run(weights, x0):
        def step(x, _):
            def layer(x, li):
                y = calls["qkv"](x, *weights["qkv"], li)
                y = calls["o"](y[:, :2048] / 32, *weights["o"], li)
                z = calls["gate_up"](y, *weights["gate_up"], li)
                z = calls["down"](jnp.tile(z[:, :3072] / 32, (1, 1)), *weights["down"], li)
                return (x + z / 32).astype(x.dtype), None

            x, _ = jax.lax.scan(layer, x, jnp.arange(L, dtype=jnp.int32))
            m = jnp.abs(x).max()
            return x / (1e-6 + m), None

        x, _ = jax.lax.scan(step, x0, jnp.arange(K))
        return x

    r = run(weights, x0)
    np.asarray(r)
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(run(weights, x0))
        best = min(best, time.perf_counter() - t0)
    per_layer = best / K / L * 1e6
    print(f"{args.bits} T={T} variant {vname}: {best/K*1e3:7.3f} ms/step "
          f"({per_layer:5.1f} us/layer)", flush=True)

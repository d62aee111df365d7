"""Microbench pallas_nib primitives on TPU: cost per op on [17, B]
state (square, product, normalize, redc glue, cols_to_planes). Each
kernel loops the op N times via fori_loop to swamp launch overhead."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lurk_tpu.fields import PALLAS_SCALAR as F
from lurk_tpu.ops import nibbles as NB

TILE = 2048
ITERS = 2000


def run(name, body_fn, extra_consts=()):
    def kernel(*refs):
        in_ref, out_ref = refs[len(extra_consts)], refs[len(extra_consts) + 1]
        consts = [r[...] for r in refs[:len(extra_consts)]]

        def body(i, st):
            return body_fn(st, consts)

        out_ref[...] = jax.lax.fori_loop(0, ITERS, body, in_ref[...])

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 0xFFFF, size=(NB.L, TILE),
                                 dtype=np.uint32))
    consts_dev = [jnp.asarray(c) for c in extra_consts]

    def _whole(shape):
        return pl.BlockSpec(shape, lambda: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    f = jax.jit(lambda *a: pl.pallas_call(
        kernel,
        in_specs=[*[_whole(c.shape) for c in consts_dev],
                  _whole(x.shape)],
        out_specs=_whole(x.shape),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
    )(*a))
    xs = [jnp.asarray(rng.integers(0, 0xFFFF, size=(NB.L, TILE),
                                   dtype=np.uint32)) for _ in range(10)]
    f(*consts_dev, x).block_until_ready()
    n_calls = 10
    t0 = time.perf_counter()
    outs = [f(*consts_dev, xs[i]) for i in range(n_calls)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / n_calls
    np.asarray(outs[-1])  # force a real device->host readback
    cy_per_op = dt / ITERS * 0.94e9
    print(f"{name:28s} {dt/ITERS*1e6:8.2f} us/op  {cy_per_op:9.0f} cy/op"
          f"  ({cy_per_op/TILE:6.2f} cy/lane)")


def main():
    nf = NB.nib_field(F)
    mats = NB.redc_mats_host(nf, 23)

    run("square+trunc", lambda st, c: NB.square_cols(st)[:NB.L] & 0xFFFF)
    run("product+trunc",
        lambda st, c: NB.product_cols(st, st)[:NB.L] & 0xFFFF)
    run("normalize", lambda st, c: NB.normalize(st))
    run("cols_to_planes+back",
        lambda st, c: st + NB.cols_to_planes(st, 16)[:NB.L].astype(
            jnp.int32).astype(jnp.uint32))
    run("redc23(square)",
        lambda st, c: NB.redc_cols(
            (c[0], c[1], c[2], c[3], 2), NB.square_cols(st), 23)
        & 0xFFFF,
        extra_consts=mats[:4])
    run("full sbox (3sq+3redc+3nrm)",
        lambda st, c: NB.redc_cols(
            (c[0], c[1], c[2], c[3], 2),
            NB.product_cols(
                NB.normalize(NB.redc_cols(
                    (c[0], c[1], c[2], c[3], 2),
                    NB.square_cols(NB.normalize(NB.redc_cols(
                        (c[0], c[1], c[2], c[3], 2),
                        NB.square_cols(st), 23))), 23)),
                st), 23) & 0xFFFF,
        extra_consts=mats[:4])


if __name__ == "__main__":
    main()

"""Microbench nib12 primitives on TPU vs the 16-bit nibbles core:
square, normalize, full S-box chain. Decides whether a 12-bit kernel
is worth building (run on TPU)."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lurk_tpu.fields import PALLAS_SCALAR as F
from lurk_tpu.ops import nib12 as N12
from lurk_tpu.ops import nibbles as NB

TILE = 2048
ITERS = 2000


def run(name, rows, body_fn, extra_consts=()):
    def kernel(*refs):
        in_ref, out_ref = refs[len(extra_consts)], refs[len(extra_consts) + 1]
        consts = [r[...] for r in refs[:len(extra_consts)]]

        def body(i, st):
            return body_fn(st, consts)

        out_ref[...] = jax.lax.fori_loop(0, ITERS, body, in_ref[...])

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 0xFFF, size=(rows, TILE),
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
    xs = [jnp.asarray(rng.integers(0, 0xFFF, size=(rows, TILE),
                                   dtype=np.uint32)) for _ in range(10)]
    f(*consts_dev, x).block_until_ready()
    n_calls = 10
    t0 = time.perf_counter()
    outs = [f(*consts_dev, xs[i]) for i in range(n_calls)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / n_calls
    cy = dt / ITERS * 0.94e9
    print(f"{name:30s} {dt/ITERS*1e6:8.2f} us/op  {cy:9.0f} cy/op",
          flush=True)


def main():
    nf12 = N12.nib12_field(F)
    m12 = N12.redc_mats_host(nf12, N12.SQ_COL_BITS)
    nf16 = NB.nib_field(F)
    m16 = NB.redc_mats_host(nf16, 23)

    def sbox12(st, c):
        mats = (c[0], c[1], c[2], c[3], m12[4])
        un = N12.normalize(st)
        x2 = N12.redc_cols(mats, N12.prep_product(N12.square_cols(un)),
                           N12.SQ_COL_BITS)
        x2n = N12.normalize(x2)
        x4 = N12.redc_cols(mats, N12.prep_product(N12.square_cols(x2n)),
                           N12.SQ_COL_BITS)
        x4n = N12.normalize(x4)
        return N12.redc_cols(
            mats, N12.prep_product(N12.product_cols(x4n, un)),
            N12.SQ_COL_BITS) & 0xFFF

    def sbox16(st, c):
        mats = (c[0], c[1], c[2], c[3], m16[4])
        un = NB.normalize(st)
        x2 = NB.redc_cols(mats, NB.square_cols(un), 23)
        x2n = NB.normalize(x2)
        x4 = NB.redc_cols(mats, NB.square_cols(x2n), 23)
        x4n = NB.normalize(x4)
        return NB.redc_cols(mats, NB.product_cols(x4n, un), 23) & 0xFFFF

    run("normalize12", N12.L, lambda st, c: N12.normalize(st))
    run("normalize16", NB.L, lambda st, c: NB.normalize(st))
    run("square12+prep+trunc", N12.L,
        lambda st, c: N12.prep_product(N12.square_cols(st))[:N12.L]
        & 0xFFF)
    run("square16+trunc", NB.L,
        lambda st, c: NB.square_cols(st)[:NB.L] & 0xFFFF)
    run("sbox12 (2sq+1mul+3redc+3nrm)", N12.L, sbox12,
        extra_consts=m12[:4])
    run("sbox16 (2sq+1mul+3redc+3nrm)", NB.L, sbox16,
        extra_consts=m16[:4])


if __name__ == "__main__":
    main()

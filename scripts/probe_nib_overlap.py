"""Probe: VPU/MXU overlap in pallas_nib. Compares v1, sbox-free (MXU
only), mds-free (VPU only) variants; if full ~= max(parts) Mosaic
overlaps, if ~= sum it doesn't. Run on TPU."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from lurk_tpu.fields import PALLAS_SCALAR as F
from lurk_tpu.poseidon import pallas_nib as PN
from lurk_tpu.ops import nibbles as NB
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def build_variant(arity, tile, mode):
    (spec, nf, rc_np, mds_np, sq_mats, load_np, fin_mats, tag,
     binw_np) = PN._pallas_nib_constants(F, arity)
    t = spec.width
    half = spec.full_rounds // 2
    rp = spec.partial_rounds
    ppe = mds_np.shape[1] // t
    mds_passes = NB.carry_passes_for(t * ppe * 225)
    load_passes = NB.carry_passes_for(64 * 225)
    sq_m_mat, sq_phi, sq_w, sq_u, sq_passes = sq_mats
    fin_m_mat, _, fin_w, _, fin_passes = fin_mats
    L = NB.L
    BINS = NB.BINS

    def kernel(rc_ref, mds_ref, sqm_ref, phi_ref, sqw_ref, u_ref,
               binw_ref, load_ref, finm_ref, finw_ref, in_ref, out_ref):
        bt = in_ref.shape[-1]
        phi = phi_ref[...]
        u_col = u_ref[...]
        binw = binw_ref[...]
        sq_redc = (sqm_ref[...], phi, sqw_ref[...], u_col, sq_passes)

        def sbox(u_cols):
            un = NB.normalize(u_cols)
            x2 = NB.redc_cols(sq_redc, NB.square_cols(un), 23)
            x2n = NB.normalize(x2)
            x4 = NB.redc_cols(sq_redc, NB.square_cols(x2n), 23)
            x4n = NB.normalize(x4)
            return NB.redc_cols(sq_redc, NB.product_cols(x4n, un), 23)

        def mds_layer(els):
            planes = jnp.concatenate(
                [NB.cols_to_planes(e, 32) for e in els], axis=0)
            rows = NB.int8_matmul(mds_ref[...], planes)
            return [PN._assemble_redc_out(
                rows[j * 3 * BINS:(j + 1) * 3 * BINS],
                phi, u_col, binw, mds_passes) for j in range(t)]

        def unstack(st):
            return [st[i * L:(i + 1) * L] for i in range(t)]

        def round_body(r, st, n_sbox):
            st = st + rc_ref[r]
            els = unstack(st)
            if mode != "mxu_only":
                els = [sbox(e) if i < n_sbox else e
                       for i, e in enumerate(els)]
            if mode != "vpu_only":
                els = mds_layer(els)
            else:
                # keep a cheap mix so the loop doesn't degenerate
                els = [jnp.concatenate([e[:1] + 1, e[1:]], axis=0)
                       for e in els]
            return jnp.concatenate(els, axis=0)

        def full_round(r, st):
            return round_body(r, st, t)

        def partial_round(r, st):
            return round_body(r, st, 1)

        n_ways = 2 if mode == "pipelined2" else 1
        bw = bt // n_ways

        def load_state(lane0):
            els = []
            for a in range(arity):
                planes = NB.cols_to_planes(
                    in_ref[a, :, lane0:lane0 + bw], 16)
                rows = NB.int8_matmul(load_ref[...], planes)
                els.append(PN._assemble_redc_out(rows, phi, u_col, binw,
                                                 load_passes))
            tag_cols = jnp.concatenate(
                [jnp.full((1, bw), int(tag[k]), dtype=jnp.uint32)
                 for k in range(L)], axis=0)
            return jnp.concatenate([tag_cols] + els, axis=0)

        def multi(body):
            def wrapped(r, sts):
                return tuple(body(r, s) for s in sts)
            return wrapped

        sts = tuple(load_state(w * bw) for w in range(n_ways))
        sts = jax.lax.fori_loop(0, half, multi(full_round), sts)
        sts = jax.lax.fori_loop(half, half + rp, multi(partial_round),
                                sts)
        sts = jax.lax.fori_loop(half + rp, half + rp + half,
                                multi(full_round), sts)
        fin_redc = (finm_ref[...], phi, finw_ref[...], u_col, fin_passes)
        outs = []
        for st in sts:
            s1n = NB.normalize(st[L:2 * L])
            d = NB.redc_cols(fin_redc, s1n, 16)
            outs.append(NB.normalize(d)[:16])
        out_ref[...] = (outs[0] if n_ways == 1
                        else jnp.concatenate(outs, axis=1))

    rc_dev = jnp.asarray(rc_np)
    consts = [rc_dev, jnp.asarray(mds_np), jnp.asarray(sq_m_mat),
              jnp.asarray(nf.p_hi_mat), jnp.asarray(sq_w),
              jnp.asarray(sq_u), jnp.asarray(binw_np),
              jnp.asarray(load_np), jnp.asarray(fin_m_mat),
              jnp.asarray(fin_w)]

    def _whole(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    def hasher(preimages):
        b = preimages.shape[-1]
        grid = (b // tile,)
        return pl.pallas_call(
            kernel, grid=grid,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 << 20),
            in_specs=[*[_whole(c.shape) for c in consts],
                      pl.BlockSpec((arity, 16, tile), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((16, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((16, b), jnp.uint32),
        )(*consts, preimages)

    return hasher


def main():
    arity, tile = 4, 2048
    batch = 1 << 17
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 1 << 16, size=(arity, 16, batch),
                       dtype=np.uint32)
    x = jnp.asarray(arr)
    for mode in ("pipelined2", "full"):
        h = jax.jit(build_variant(arity, tile, mode))
        h(x).block_until_ready()
        n = 10
        t0 = time.perf_counter()
        outs = [h(x) for _ in range(n)]
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
        print(mode, round(batch * n / dt), "hashes/s",
              round(dt / n * 1000, 1), "ms/batch")


if __name__ == "__main__":
    main()

"""Is a Pallas-resident ec_madd chain faster than the XLA scan?

Runs the SAME complete mixed-add chain (fe12/ec12) three ways,
interleaved in one process:
  A. XLA lax.scan over dense int16 stream slabs (the v3 kernel's shape)
  B. pallas_call, fori_loop over a VMEM-resident input block
  C. pallas_call like B but with the flush bookkeeping (emission write)
Reports cycles per madd per lane-element.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import lurk_tpu  # noqa: F401
from lurk_tpu.curves.weierstrass import BN254_G1
from lurk_tpu.msm import ec12 as E
from lurk_tpu.msm import fe12 as F

curve = BN254_G1
ctx = E.ec_ctx(curve)
L = F.L

LANES = 2048
STEPS = 32          # VMEM-resident input block [STEPS, LANES, 44] int16
REPEAT = 16         # fori_loop repeats over the block => STEPS*REPEAT madds


def _mat(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0][..., :1]
                         .astype(jnp.float32)))


rng = np.random.default_rng(0)
# valid-ish limb columns (bounded like canonical points); correctness of
# VALUES is irrelevant for timing, bounds structure is what matters
xy = rng.integers(0, 4096, size=(STEPS, LANES, 2 * L), dtype=np.int16)
xy_dev = jnp.asarray(xy)


def madd_step(carry, x2c, y2c):
    acc = E.assume_pt(curve, *carry)
    x2 = F.Fe(x2c, ctx.p, 4096)
    y2 = F.Fe(y2c, ctx.p, 4096)
    added = E.ec_madd(ctx, acc, x2, y2)
    return (added.x.cols, added.y.cols, added.z.cols)


# ---- A: XLA scan --------------------------------------------------------
@jax.jit
def xla_scan(stream):
    ident = E.identity(ctx, LANES)

    def step(carry, sl):
        s32 = sl.astype(jnp.int32)
        return madd_step(carry, s32[:, :L].T, s32[:, L:].T), None

    init = (ident.x.cols, ident.y.cols, ident.z.cols)
    out, _ = jax.lax.scan(step, init, jnp.tile(stream, (REPEAT, 1, 1)))
    return out[0]


# ---- B: pallas chain ----------------------------------------------------
def _whole(shape):
    return pl.BlockSpec(shape, lambda: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _collect_pool():
    """Trace the madd body once in collect mode to enumerate fe12's
    embedded constants."""
    pool = F.ConstPool()
    with F.const_pool(pool):
        def once(a, s):
            s32 = s.astype(jnp.int32)
            ident = E.identity(ctx, LANES)
            return madd_step((ident.x.cols, ident.y.cols, ident.z.cols),
                             s32[:, :L].T, s32[:, L:].T)
        jax.eval_shape(once, jnp.zeros((L, LANES), jnp.int32),
                       jnp.zeros((LANES, 2 * L), jnp.int16))
    return pool


def pallas_chain(emit: bool):
    pool = _collect_pool()
    consts_dev = [jnp.asarray(c) for c in pool.arrays]

    def kernel(*refs):
        crefs = refs[:len(consts_dev)]
        in_ref, out_ref = refs[len(consts_dev)], refs[len(consts_dev) + 1]
        cvals = [r[...] for r in crefs]
        with F.const_pool(pool, replay=cvals):
            ident = E.identity(ctx, LANES)

            def body(i, carry):
                ax, ay, az = carry
                t = i % STEPS
                sl = in_ref[t].astype(jnp.int32)
                if emit:
                    acc_rows = jnp.concatenate(
                        [ax.T, ay.T, az.T], axis=1).astype(jnp.int16)
                    out_ref[t, :, :66] = acc_rows
                return madd_step((ax, ay, az), sl[:, :L].T, sl[:, L:].T)

            init = (ident.x.cols, ident.y.cols, ident.z.cols)
            out = jax.lax.fori_loop(0, STEPS * REPEAT, body, init)
            if not emit:
                out_ref[0, :, :L] = out[0].T.astype(jnp.int16)

    return jax.jit(lambda x: pl.pallas_call(
        kernel,
        in_specs=[*[_whole(c.shape) for c in consts_dev], _whole(x.shape)],
        out_specs=_whole((STEPS, LANES, 2 * L)),
        out_shape=jax.ShapeDtypeStruct((STEPS, LANES, 2 * L), jnp.int16),
    )(*consts_dev, x))


def timeit(label, fn, arg, reps=4):
    _mat(fn(arg))
    ts = []
    for i in range(reps):
        a = jnp.asarray((np.asarray(arg) + i + 1) & np.int16(0x0FFF))
        t0 = time.perf_counter()
        _mat(fn(a))
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    n_madds = STEPS * REPEAT
    cyc = best * 0.94e9 / n_madds
    print(f"{label:28s} {best*1e3:7.1f} ms  {cyc:8.0f} cy/step "
          f"({cyc*1024/LANES:6.1f} cy/madd/vreg-lane)", flush=True)


if __name__ == "__main__":
    for r in range(3):
        timeit("A xla scan", xla_scan, xy_dev)
        timeit("B pallas chain", pallas_chain(False), xy_dev)
        timeit("C pallas chain + emit", pallas_chain(True), xy_dev)

"""HyperKZG multilinear polynomial-commitment engine over BN254.

The reference's default BN256 engine is `Bn256EngineKZG` whose
evaluation engine is HyperKZG (/root/reference/src/proof/nova.rs:56-71;
arecibo provider::hyperkzg): commitments are MSMs over a univariate
powers-of-tau SRS, and a multilinear evaluation claim is reduced to
univariate KZG openings through the Gemini even/odd folding trick —
O(log n) proof size, pairing-based verification, no per-proof
linear-time verifier work (unlike IPA).

Protocol (prove W~(x) = v for W committed as C = <W, [tau^i]_1>):
  1. Fold LSB-first: v_0 = W; v_{i+1}[j] = (1-x_i) v_i[2j] + x_i
     v_i[2j+1] (x_i binds the i-th lowest index bit). Commit
     v_1..v_{k-1}.
  2. Challenge r. Open every v_i at {r, -r, r^2}. The even/odd
     univariate split makes the fold verifiable from evaluations:
     v_{i+1}(r^2) = (1-x_i)(v_i(r)+v_i(-r))/2
                  + x_i  (v_i(r)-v_i(-r))/(2r),
     and for i = k-1 the right-hand side must equal the claimed v.
  3. Batch the 3k openings: gamma-RLC per point, one KZG quotient per
     point, then a delta-RLC across the three points into a single
     two-pairing check:
       e(sum_j d_j (C_Bj - [B_j(z_j)]_1 + z_j W_j), [1]_2)
         == e(sum_j d_j W_j, [tau]_2).

SRS: tau is derived from shake256 and used transiently to compute
[tau^i]_1 / [tau]_2, then discarded — a DEV SRS, functionally faithful
but not a trusted-setup ceremony (the reference's own test/bench params
are generated the same way; a production deployment would import a
ceremony transcript). Cached on disk like the Pedersen generators.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json

import numpy as np
from typing import List, Optional, Sequence, Tuple

from ..curves import pairing as pr
from ..curves.weierstrass import BN254_G1, Affine
from .transcript import Transcript

CURVE = BN254_G1
_TAU_LABEL = b"lurk_tpu.hyperkzg.tau.v1"


def _tau() -> int:
    """The dev-SRS toxic waste (see module docstring)."""
    d = hashlib.shake_256(_TAU_LABEL).digest(48)
    return int.from_bytes(d, "little") % CURVE.order


# ---------------------------------------------------------------------------
# SRS
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Srs:
    powers: List[Affine]            # [tau^i]_1, i < n
    g2: pr.G2Point                  # [1]_2
    tau_g2: pr.G2Point              # [tau]_2
    _packed: Optional[object] = None   # cached native point packing

    def packed(self):
        if self._packed is None:
            from ..native import msm as nmsm
            if nmsm.available():
                self._packed = nmsm.pack_points(self.powers)
        return self._packed


def _fixed_base_mul_table(gen: Affine, c: int = 8):
    """Window table for fast fixed-base scalar muls."""
    curve = CURVE
    n_win = (curve.scalar.num_bits + c - 1) // c
    table = []
    base = curve.jac_from_affine(gen)
    for _ in range(n_win):
        row = [(0, 1, 0)]
        acc = (0, 1, 0)
        for _ in range((1 << c) - 1):
            acc = curve.jac_add(acc, base)
            row.append(acc)
        table.append(row)
        for _ in range(c):
            base = curve.jac_double(base)
    return table, c


def _fixed_base_mul(table, c: int, k: int) -> Affine:
    curve = CURVE
    acc = (0, 1, 0)
    w = 0
    mask = (1 << c) - 1
    while k:
        d = k & mask
        if d:
            acc = curve.jac_add(acc, table[w][d])
        k >>= c
        w += 1
    return curve.jac_to_affine(acc)


_SRS_MEM: dict = {}


def load_srs(n: int) -> Srs:
    """Powers-of-tau SRS, grown and cached on disk (and in memory:
    compress re-opens call this 3+ times per proof, and unpacking 2^21
    points from disk costs seconds each time)."""
    for have, srs in _SRS_MEM.items():
        if have >= n:
            return srs
    srs = _load_srs_disk(n)
    _SRS_MEM.clear()
    _SRS_MEM[len(srs.powers)] = srs
    return srs


def _load_srs_disk(n: int) -> Srs:
    import fcntl
    from .params_cache import (_atomic_write, _gens_from_bytes,
                               _gens_to_bytes, cache_dir)
    key = "hyperkzg_srs_bn254"
    path = cache_dir() / f"{key}.bin"
    meta_path = cache_dir() / f"{key}.json"
    lock_path = cache_dir() / f"{key}.lock"
    tau = _tau()
    with open(lock_path, "w") as lock_f:
        fcntl.flock(lock_f, fcntl.LOCK_EX)
        powers: List[Affine] = []
        if path.exists() and meta_path.exists():
            have = json.loads(meta_path.read_text())["n"]
            if have >= n:
                powers = _gens_from_bytes(path.read_bytes(), n)
            else:
                powers = _gens_from_bytes(path.read_bytes(), have)
        if len(powers) < n:
            from ..native import srs as nsrs
            start = len(powers)
            got = (nsrs.srs_powers(CURVE, tau, start, n - start)
                   if nsrs.available() else None)
            if got is not None:
                # spot-check the native batch against the python
                # fixed-base oracle before trusting 2^21 points
                table, c = _fixed_base_mul_table(CURVE.generator)
                for probe in {0, len(got) // 2, len(got) - 1}:
                    expect = _fixed_base_mul(
                        table, c, pow(tau, start + probe, CURVE.order))
                    assert got[probe] == expect, "native SRS mismatch"
                powers.extend(got)
            else:
                table, c = _fixed_base_mul_table(CURVE.generator)
                t_pow = pow(tau, len(powers), CURVE.order)
                for _ in range(len(powers), n):
                    powers.append(_fixed_base_mul(table, c, t_pow))
                    t_pow = t_pow * tau % CURVE.order
            _atomic_write(path, _gens_to_bytes(powers))
            _atomic_write(meta_path,
                          json.dumps({"n": len(powers)}).encode())
    return Srs(powers, pr.G2_GEN, pr.g2_mul(tau, pr.G2_GEN))


# ---------------------------------------------------------------------------
# univariate KZG helpers
# ---------------------------------------------------------------------------


def _msm(scalars: Sequence[int], points: Sequence[Affine],
         srs: Optional[Srs] = None) -> Affine:
    from ..native import msm as nmsm
    from ..native.r1cs import PackedVec
    if not isinstance(scalars, PackedVec):
        # keep PackedVec packed: msm_packed reads .arr directly, and a
        # list() round-trip costs ~0.5 s per 2^21-size chain commit
        scalars = list(scalars)
    if len(scalars) >= 64 and nmsm.available():
        if srs is not None and srs.powers is points:
            packed = srs.packed()
            if packed is not None:
                return nmsm.msm_packed(CURVE, scalars, packed)
        return nmsm.msm(CURVE, scalars, list(points[:len(scalars)]))
    return CURVE.pippenger(scalars, list(points[:len(scalars)]))


def _poly_eval(coeffs: Sequence[int], z: int, q: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * z + c) % q
    return acc


def _quotient(coeffs: Sequence[int], z: int, q: int) -> List[int]:
    """(p(X) - p(z)) / (X - z), synthetic division."""
    out = [0] * (len(coeffs) - 1)
    acc = 0
    for i in range(len(coeffs) - 1, 0, -1):
        acc = (acc * z + coeffs[i]) % q
        out[i - 1] = acc
    return out


# ---------------------------------------------------------------------------
# HyperKZG prove / verify
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class HkzgProof:
    comms: List[Affine]             # commitments to v_1..v_{k-1}
    evals: List[Tuple[int, int, int]]   # (v_i(r), v_i(-r), v_i(r^2))
    quotients: List[Affine]         # W_r, W_{-r}, W_{r^2}


def prove(srs: Srs, poly: Sequence[int], point: Sequence[int],
          tr: Transcript) -> HkzgProof:
    """Open the MLE of `poly` (evaluations, length 2^k) at `point`
    (mle.mle_eval convention: point[0] binds the TOP index bit)."""
    q = CURVE.order
    n = len(poly)
    k = n.bit_length() - 1
    assert n == 1 << k and len(point) == k
    xs = [v % q for v in reversed(point)]    # LSB-first binding
    from ..native import spartan as nsc
    from ..native.r1cs import PackedVec
    if nsc.available():
        # native-resident chain: folds, evals, batching and quotients
        # all on packed buffers (the python loops were ~10s/proof at
        # 2^21)
        pvs = [PackedVec.pack([v % q for v in poly]
                              if not isinstance(poly, PackedVec)
                              else poly, q)]
        for i in range(k - 1):
            prev = pvs[-1]
            cp = PackedVec(prev.arr.copy(), prev.n, q)
            pvs.append(nsc.bind_eo(cp, xs[i]))
        comms = [_msm(pv, srs.powers, srs) for pv in pvs[1:]]
        for cm in comms:
            tr.absorb_point(cm)
        r = tr.squeeze() % q or 1
        zs = (r, (-r) % q, r * r % q)
        evals = [tuple(nsc.poly_eval(pv, z) for z in zs)
                 for pv in pvs]
        for ev in evals:
            for v in ev:
                tr.absorb_scalar(v)
        gamma = tr.squeeze() % q
        from ..native import r1cs as nr
        barr = pvs[0].arr.copy()
        g = 1
        for pv in pvs[1:]:
            g = g * gamma % q
            pref = PackedVec(barr[:4 * pv.n], pv.n, q)
            out = nr.vec_rlc_pv(q, pref, pv, g)
            barr[:4 * pv.n] = out.arr
        batched_pv = PackedVec(barr, n, q)
        quotients = [_msm(nsc.poly_quotient(batched_pv, z),
                          srs.powers, srs) for z in zs]
        for w in quotients:
            tr.absorb_point(w)
        tr.squeeze()
        return HkzgProof(comms, evals, quotients)
    polys = [[v % q for v in poly]]
    for i in range(k - 1):
        prev = polys[-1]
        x = xs[i]
        polys.append([(prev[2 * j] + x * (prev[2 * j + 1] - prev[2 * j]))
                      % q for j in range(len(prev) // 2)])
    comms = [_msm(pl, srs.powers, srs) for pl in polys[1:]]
    for cm in comms:
        tr.absorb_point(cm)
    r = tr.squeeze() % q or 1
    zs = (r, (-r) % q, r * r % q)
    evals = [tuple(_poly_eval(pl, z, q) for z in zs) for pl in polys]
    for ev in evals:
        for v in ev:
            tr.absorb_scalar(v)
    gamma = tr.squeeze() % q
    quotients = []
    for j, z in enumerate(zs):
        batched = [0] * n
        g = 1
        for pl in polys:
            for i, c in enumerate(pl):
                batched[i] = (batched[i] + g * c) % q
            g = g * gamma % q
        quotients.append(_msm(_quotient(batched, z, q),
                              srs.powers, srs))
    for w in quotients:
        tr.absorb_point(w)             # delta must bind the quotients
    tr.squeeze()                       # keep state aligned with verify
    return HkzgProof(comms, evals, quotients)


def verify(srs: Srs, comm: Affine, point: Sequence[int], value: int,
           proof: HkzgProof, tr: Transcript) -> bool:
    q = CURVE.order
    k = len(point)
    if len(proof.comms) != k - 1 or len(proof.evals) != k or \
            len(proof.quotients) != 3:
        return False
    xs = [v % q for v in reversed(point)]
    for cm in proof.comms:
        tr.absorb_point(cm)
    r = tr.squeeze() % q or 1
    zs = (r, (-r) % q, r * r % q)
    for ev in proof.evals:
        if len(ev) != 3:
            return False
        for v in ev:
            tr.absorb_scalar(v)
    gamma = tr.squeeze() % q
    for w in proof.quotients:
        tr.absorb_point(w)
    # fold-consistency chain at r^2
    inv2 = pow(2, q - 2, q)
    inv2r = pow(2 * r % q, q - 2, q)
    for i in range(k):
        er, enr, _ = proof.evals[i]
        nxt = ((1 - xs[i]) * (er + enr) % q * inv2 +
               xs[i] * (er - enr) % q * inv2r) % q
        want = proof.evals[i + 1][2] if i + 1 < k else value % q
        if nxt != want:
            return False
    # batched KZG check across the three points
    delta = tr.squeeze() % q
    all_comms = [comm] + list(proof.comms)
    agg_c: Affine = None
    agg_w: Affine = None
    d = 1
    for j, z in enumerate(zs):
        # C_B = sum_i gamma^i C_i ; B(z) = sum_i gamma^i evals[i][j]
        g = 1
        cb: Affine = None
        bz = 0
        for i, cm in enumerate(all_comms):
            cb = CURVE.add(cb, CURVE.mul(g, cm))
            bz = (bz + g * proof.evals[i][j]) % q
            g = g * gamma % q
        wj = proof.quotients[j]
        # d_j * (C_B - [bz]_1 + z W_j)
        term = CURVE.add(cb, CURVE.neg(CURVE.mul(bz, CURVE.generator)))
        term = CURVE.add(term, CURVE.mul(z, wj))
        agg_c = CURVE.add(agg_c, CURVE.mul(d, term))
        agg_w = CURVE.add(agg_w, CURVE.mul(d, wj))
        d = d * delta % q
    return pr.pairing_product_is_one([
        (agg_c, srs.g2),
        (CURVE.neg(agg_w) if agg_w else None, srs.tau_g2),
    ])


# ---------------------------------------------------------------------------
# Joint Shplonk (BDFG20) batch opening
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class HkzgBatchProof:
    """Joint opening of several MLEs: per-claim Gemini fold chains
    share ONE evaluation point set S = {r, -r, r^2}; all chain polys
    batch (gamma powers) into one f whose combined quotient
    h = (f - r_f)/Z_S commits as W, opened at a fresh challenge u via
    W' (BDFG20 with only [tau]_2 in the SRS). TWO size-n MSMs replace
    the 3-per-claim quotients — the compress-path prover is MSM-bound
    (PERF.md r5: kzg_open was 39 s of the 59 s compress)."""

    comms: List[List[Affine]]
    evals: List[List[Tuple[int, int, int]]]
    w: Affine
    wp: Affine


def _interp3(zs, fs, q):
    """Degree-<=2 Lagrange interpolation -> coefficients [c0,c1,c2]."""
    c = [0, 0, 0]
    for i in range(3):
        zi = zs[i]
        others = [zs[j] for j in range(3) if j != i]
        denom = 1
        for zo in others:
            denom = denom * (zi - zo) % q
        scale = fs[i] * pow(denom, q - 2, q) % q
        # (X - a)(X - b) = X^2 - (a+b)X + ab
        a, b = others
        c[0] = (c[0] + scale * (a * b % q)) % q
        c[1] = (c[1] - scale * ((a + b) % q)) % q
        c[2] = (c[2] + scale) % q
    return c


def _zs_coeffs(zs, q):
    z0, z1, z2 = zs
    s1 = (z0 + z1 + z2) % q
    s2 = (z0 * z1 + z0 * z2 + z1 * z2) % q
    s3 = z0 * z1 * z2 % q
    return [(-s3) % q, s2, (-s1) % q, 1]     # X^3 - s1 X^2 + s2 X - s3


def _fold_chain(poly, point, q):
    from ..native import spartan as nsc
    from ..native.r1cs import PackedVec
    n = len(poly)
    k = n.bit_length() - 1
    assert n == 1 << k and len(point) == k
    xs = [v % q for v in reversed(point)]
    if nsc.available():
        pvs = [PackedVec.pack([v % q for v in poly]
                              if not isinstance(poly, PackedVec)
                              else poly, q)]
        for i in range(k - 1):
            prev = pvs[-1]
            cp = PackedVec(prev.arr.copy(), prev.n, q)
            pvs.append(nsc.bind_eo(cp, xs[i]))
        return pvs
    polys = [[v % q for v in poly]]
    for i in range(k - 1):
        prev = polys[-1]
        x = xs[i]
        polys.append([(prev[2 * j] + x * (prev[2 * j + 1] - prev[2 * j]))
                      % q for j in range(len(prev) // 2)])
    return polys


def prove_batch(srs: Srs, opens, tr: Transcript) -> HkzgBatchProof:
    """opens: list of (poly, point) — poly a 2^k evaluation vector
    (list or PackedVec), point length-k (mle_eval convention)."""
    q = CURVE.order
    from ..native import spartan as nsc
    from ..native.r1cs import PackedVec
    native = nsc.available()
    chains = []
    comms: List[List[Affine]] = []
    for poly, point in opens:
        ch = _fold_chain(poly, point, q)
        cms = [_msm(pv, srs.powers, srs) for pv in ch[1:]]
        for cm in cms:
            tr.absorb_point(cm)
        chains.append(ch)
        comms.append(cms)
    r = tr.squeeze() % q or 1
    zs = (r, (-r) % q, r * r % q)
    evals = []
    for ch in chains:
        evs = [tuple((nsc.poly_eval(pv, z) if native
                      else _poly_eval(pv, z, q)) for z in zs)
               for pv in ch]
        for ev in evs:
            for v in ev:
                tr.absorb_scalar(v)
        evals.append(evs)
    gamma = tr.squeeze() % q

    n_max = max(len(ch[0]) for ch in chains)
    # batched f = sum over all chain polys of gamma^c * poly; batched
    # evals at each z accumulate the same weights
    f_evals = [0, 0, 0]
    g = 1
    if native:
        barr = np.zeros(4 * n_max, dtype=np.uint64)
        from ..native import r1cs as nr
        for ci, ch in enumerate(chains):
            for pi, pv in enumerate(ch):
                pref = PackedVec(barr[:4 * pv.n], pv.n, q)
                out = nr.vec_rlc_pv(q, pref, pv, g)
                barr[:4 * pv.n] = out.arr
                for j in range(3):
                    f_evals[j] = (f_evals[j]
                                  + g * evals[ci][pi][j]) % q
                g = g * gamma % q
        batched = PackedVec(barr, n_max, q)
    else:
        blist = [0] * n_max
        for ci, ch in enumerate(chains):
            for pi, pl in enumerate(ch):
                for i, c in enumerate(pl):
                    blist[i] = (blist[i] + g * c) % q
                for j in range(3):
                    f_evals[j] = (f_evals[j]
                                  + g * evals[ci][pi][j]) % q
                g = g * gamma % q
        batched = blist

    rf = _interp3(zs, f_evals, q)
    # h = (f - r_f) / (X-z0)(X-z1)(X-z2): subtract then divide thrice
    if native:
        from ..native import r1cs as nr
        garr = batched.arr.copy()
        pref = PackedVec(garr[:4 * 3], 3, q)
        out = nr.vec_rlc_pv(q, pref, PackedVec.pack(rf, q), q - 1)
        garr[:4 * 3] = out.arr
        h = PackedVec(garr, n_max, q)
        for z in zs:
            h = nsc.poly_quotient(h, z)
    else:
        h = list(batched)
        for i in range(3):
            h[i] = (h[i] - rf[i]) % q
        for z in zs:
            h = _quotient(h, z, q)
    w_cm = _msm(h, srs.powers, srs)
    tr.absorb_point(w_cm)
    u = tr.squeeze() % q
    zc = _zs_coeffs(zs, q)
    zu = sum(c * pow(u, i, q) for i, c in enumerate(zc)) % q
    ru = (rf[0] + rf[1] * u + rf[2] * u * u) % q
    if native:
        from ..native import r1cs as nr
        larr = batched.arr.copy()
        pref = PackedVec(larr[:4], 1, q)
        out = nr.vec_rlc_pv(q, pref, PackedVec.pack([ru], q), q - 1)
        larr[:4] = out.arr
        hn = len(h)
        pref = PackedVec(larr[:4 * hn], hn, q)
        out = nr.vec_rlc_pv(q, pref, h, (q - zu) % q)
        larr[:4 * hn] = out.arr
        lpv = PackedVec(larr, n_max, q)
        wp_poly = nsc.poly_quotient(lpv, u)
    else:
        lpoly = list(batched)
        lpoly[0] = (lpoly[0] - ru) % q
        for i, c in enumerate(h):
            lpoly[i] = (lpoly[i] - zu * c) % q
        wp_poly = _quotient(lpoly, u, q)
    wp_cm = _msm(wp_poly, srs.powers, srs)
    tr.absorb_point(wp_cm)
    tr.squeeze()
    return HkzgBatchProof(comms, evals, w_cm, wp_cm)


def verify_batch(srs: Srs, claims, proof: HkzgBatchProof,
                 tr: Transcript) -> bool:
    """claims: list of (comm, point, value) matching prove_batch's
    opens (comm may be None = identity)."""
    q = CURVE.order
    if len(proof.comms) != len(claims) or \
            len(proof.evals) != len(claims):
        return False
    for ci, (comm, point, value) in enumerate(claims):
        k = len(point)
        if len(proof.comms[ci]) != k - 1 or \
                len(proof.evals[ci]) != k:
            return False
        for cm in proof.comms[ci]:
            tr.absorb_point(cm)
    r = tr.squeeze() % q or 1
    zs = (r, (-r) % q, r * r % q)
    for ci, (comm, point, value) in enumerate(claims):
        for ev in proof.evals[ci]:
            if len(ev) != 3:
                return False
            for v in ev:
                tr.absorb_scalar(v)
    gamma = tr.squeeze() % q
    inv2 = pow(2, q - 2, q)
    inv2r = pow(2 * r % q, q - 2, q)
    for ci, (comm, point, value) in enumerate(claims):
        xs = [v % q for v in reversed(point)]
        k = len(point)
        for i in range(k):
            er, enr, _ = proof.evals[ci][i]
            nxt = ((1 - xs[i]) * (er + enr) % q * inv2 +
                   xs[i] * (er - enr) % q * inv2r) % q
            want = (proof.evals[ci][i + 1][2] if i + 1 < k
                    else value % q)
            if nxt != want:
                return False
    # batched commitment + evals with the same global gamma stream
    g = 1
    cf: Affine = None
    f_evals = [0, 0, 0]
    for ci, (comm, point, value) in enumerate(claims):
        chain_comms = [comm] + list(proof.comms[ci])
        for pi, cm in enumerate(chain_comms):
            if cm is not None:
                cf = CURVE.add(cf, CURVE.mul(g, cm))
            for j in range(3):
                f_evals[j] = (f_evals[j]
                              + g * proof.evals[ci][pi][j]) % q
            g = g * gamma % q
    rf = _interp3(zs, f_evals, q)
    tr.absorb_point(proof.w)
    u = tr.squeeze() % q
    zc = _zs_coeffs(zs, q)
    zu = sum(c * pow(u, i, q) for i, c in enumerate(zc)) % q
    ru = (rf[0] + rf[1] * u + rf[2] * u * u) % q
    tr.absorb_point(proof.wp)
    tr.squeeze()
    # C_L = C_f - [r_f(u)]G - Z(u) W;  e(C_L + u W', G2) e(-W', tauG2)=1
    cl = CURVE.add(cf, CURVE.neg(CURVE.mul(ru, CURVE.generator)))
    if proof.w is not None:
        cl = CURVE.add(cl, CURVE.neg(CURVE.mul(zu, proof.w)))
    lhs = CURVE.add(cl, CURVE.mul(u, proof.wp)
                    if proof.wp is not None else None)
    return pr.pairing_product_is_one([
        (lhs, srs.g2),
        (CURVE.neg(proof.wp) if proof.wp is not None else None,
         srs.tau_g2),
    ])

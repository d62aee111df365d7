"""BN254 pairing + HyperKZG engine (the reference's default BN256
engine class, nova.rs:56-71 Bn256EngineKZG): pairing bilinearity,
multilinear opening roundtrip, and a Spartan compression roundtrip on
the bn256 field that exercises the KZG path end-to-end."""

import random

import pytest

from lurk_tpu.curves import pairing as pr
from lurk_tpu.curves.weierstrass import BN254_G1
from lurk_tpu.fields import BN256_SCALAR
from lurk_tpu.proof import hyperkzg as hk
from lurk_tpu.proof import spartan
from lurk_tpu.proof.mle import mle_eval
from lurk_tpu.proof.nova import (
    PublicParams, R1CSShape, RecursiveSNARK,
)
from lurk_tpu.proof.transcript import Transcript
from lurk_tpu.r1cs.cs import ConstraintSystem


def test_pairing_bilinear():
    g1 = BN254_G1.generator
    assert pr.g2_is_on_curve(pr.G2_GEN)
    assert pr.g2_mul(pr.R, pr.G2_GEN) is None
    e = pr.pairing(g1, pr.G2_GEN)
    assert e != pr.F12_ONE
    assert pr.pairing(BN254_G1.mul(2, g1), pr.g2_mul(3, pr.G2_GEN)) == \
        pr.f12_pow(e, 6)
    assert pr.pairing_product_is_one(
        [(g1, pr.G2_GEN), (BN254_G1.neg(g1), pr.G2_GEN)])


def test_hyperkzg_roundtrip():
    q = BN254_G1.order
    k = 6
    n = 1 << k
    srs = hk.load_srs(n)
    r = random.Random(3)
    poly = [r.randrange(q) for _ in range(n)]
    point = [r.randrange(q) for _ in range(k)]
    v = mle_eval(poly, point, q)
    comm = hk._msm(poly, srs.powers)
    proof = hk.prove(srs, poly, point,
                     Transcript(BN254_G1, b"t.hkzg"))
    assert hk.verify(srs, comm, point, v, proof,
                     Transcript(BN254_G1, b"t.hkzg"))
    assert not hk.verify(srs, comm, point, (v + 1) % q, proof,
                         Transcript(BN254_G1, b"t.hkzg"))
    # tampered quotient must fail the pairing check
    bad = hk.HkzgProof(proof.comms, proof.evals,
                       [BN254_G1.generator] + proof.quotients[1:])
    assert not hk.verify(srs, comm, point, v, bad,
                         Transcript(BN254_G1, b"t.hkzg"))


def _cube_cs_bn(x_val):
    cs = ConstraintSystem(BN256_SCALAR)
    p = cs.p
    x = cs.alloc_input(x_val)
    y = cs.alloc_input((x_val ** 3 + x_val + 5) % p)
    x2 = cs.alloc(x_val * x_val % p)
    x3 = cs.alloc(x_val ** 3 % p)
    cs.enforce({x: 1}, {x: 1}, {x2: 1})
    cs.enforce({x2: 1}, {x: 1}, {x3: 1})
    cs.enforce({x3: 1, x: 1, ConstraintSystem.ONE_VAR: 5},
               {ConstraintSystem.ONE_VAR: 1}, {y: 1})
    return cs


def test_spartan_bn256_kzg_roundtrip():
    """Spartan compression on bn256 routes its PCS openings through
    HyperKZG (pairing-verified) instead of IPA."""
    pp = PublicParams.setup(R1CSShape(_cube_cs_bn(3)))
    assert spartan._uses_kzg(pp)
    rs = RecursiveSNARK(pp)
    for xv in (3, 7):
        cs = _cube_cs_bn(xv)
        rs.prove_step(cs.inputs[1:], list(cs.aux), check=True)
    rs.z0 = [0] * (pp.shape.num_inputs - 1)
    rs.zi = [0] * (pp.shape.num_inputs - 1)
    proof = rs.finish()
    comp = spartan.compress(pp, proof)
    assert comp.spartan.hkzg_joint is not None and comp.spartan.ipa_w is None
    assert spartan.verify_compressed(pp, comp)
    comp.spartan.claims = ((comp.spartan.claims[0] + 1) % pp.shape.p,
                           *comp.spartan.claims[1:])
    assert not spartan.verify_compressed(pp, comp)


def test_batch_shplonk_opening():
    """Joint Shplonk (BDFG20) opening: several MLEs of different sizes
    open with TWO MSMs total; tampered values/quotients rejected."""
    import dataclasses as dc
    import random
    from lurk_tpu.proof import hyperkzg as hk
    from lurk_tpu.proof.mle import mle_eval
    from lurk_tpu.proof.transcript import Transcript

    q = hk.CURVE.order
    r = random.Random(4)
    srs = hk.load_srs(64)

    def T():
        return Transcript(hk.CURVE, b"batch.test")

    opens, claims = [], []
    for k in (4, 5):
        poly = [r.randrange(q) for _ in range(1 << k)]
        point = [r.randrange(q) for _ in range(k)]
        opens.append((poly, point))
        claims.append((hk._msm(poly, srs.powers, srs), point,
                       mle_eval(poly, point, q)))
    proof = hk.prove_batch(srs, opens, T())
    assert hk.verify_batch(srs, claims, proof, T())
    bad = [(claims[0][0], claims[0][1], (claims[0][2] + 1) % q)] \
        + claims[1:]
    assert not hk.verify_batch(srs, bad, proof, T())
    assert not hk.verify_batch(
        srs, claims, dc.replace(proof, w=hk.CURVE.generator), T())
    assert not hk.verify_batch(
        srs, claims, dc.replace(proof, wp=hk.CURVE.generator), T())

"""Bit-exactness tests for host Poseidon against reference anchors.

Anchors are hex digests hard-coded in the Rust reference's tests:
  - commitment: /root/reference/src/lem/store.rs:1473
  - trie empty roots (chained hash8): /root/reference/src/coprocessor/trie/mod.rs:932-1010
Round-number table: neptune round_numbers.rs published values.
"""

from lurk_tpu.fields import BN256_SCALAR, PALLAS_SCALAR, VESTA_SCALAR
from lurk_tpu.poseidon.host import hash_preimage, permute
from lurk_tpu.poseidon.spec import calc_round_numbers, poseidon_spec


def test_round_numbers_match_neptune_table():
    # (t, (R_F, R_P)) from neptune's round_numbers.rs for standard strength
    assert calc_round_numbers(3) == (8, 55)
    assert calc_round_numbers(5) == (8, 56)
    assert calc_round_numbers(9) == (8, 57)
    assert calc_round_numbers(17) == (8, 59)
    # Lurk arities 3 and 6 (t = 4, 7)
    assert calc_round_numbers(4) == (8, 56)
    assert calc_round_numbers(7) == (8, 56)


def test_commitment_anchor_bn256():
    # store.commit(num_u64(0)) = hash3([0, ExprTag::Num = 4, 0])
    digest = hash_preimage(BN256_SCALAR, [0, 4, 0])
    assert digest == int(
        "1d501baeefe83acf0e7137180b091834f542a5059dbaf99ec82c5e19d3bb9201", 16
    )


def test_trie_empty_root_anchors_bn256():
    roots = [
        "1ca5b207085f3f0f324a2e0704b18fff1cda2e2d686aa85343fea91df77bf35b",
        "0637ddaef5cd53ba6711c328952208d846222066701e10c34d3a6df7350de8aa",
        "08127a45502f5939273edd1957c8748ae39992e2a459d99f999992a842df99a5",
        "12c2ef2ab5df25442fe23d8711bf985f02c39e83930517f7103d4bd4228c6cfb",
    ]
    h = 0
    for want in roots:
        h = hash_preimage(BN256_SCALAR, [h] * 8)
        assert h == int(want, 16)


def test_specs_build_for_all_lurk_arities_and_fields():
    for field in (BN256_SCALAR, PALLAS_SCALAR, VESTA_SCALAR):
        for arity in (3, 4, 6, 8):
            spec = poseidon_spec(field, arity)
            assert spec.width == arity + 1
            assert len(spec.round_constants) == (
                (spec.full_rounds + spec.partial_rounds) * spec.width
            )
            assert all(0 <= c < field.modulus for c in spec.round_constants)
            # permutation runs and stays in-field
            out = permute(spec, list(range(spec.width)))
            assert all(0 <= x < field.modulus for x in out)


def test_hash_zeros_all_arities_deterministic():
    # hash{3,4,6,8}zeros used by Store (src/lem/store.rs:124-132); pin values
    # so regressions in the constant pipeline are caught immediately.
    vals = {a: hash_preimage(BN256_SCALAR, [0] * a) for a in (3, 4, 6, 8)}
    assert vals[8] == int(
        "1ca5b207085f3f0f324a2e0704b18fff1cda2e2d686aa85343fea91df77bf35b", 16
    )
    assert len(set(vals.values())) == 4

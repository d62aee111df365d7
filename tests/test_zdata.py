"""ZData binary format + ZDag/ZStore serialization roundtrips."""

import random

import pytest

from lurk_tpu.fields import BN256_SCALAR
from lurk_tpu.parser import read_with_default_state
from lurk_tpu.store.core import Store
from lurk_tpu.store.z_data import Atom, Cell, from_bytes, to_bytes
from lurk_tpu.store.zdag import ZDag, ZStore


def test_zdata_roundtrip_random():
    r = random.Random(42)

    def rand_z(depth=0):
        if depth > 2 or r.random() < 0.6:
            n = r.choice([0, 1, 5, 63, 64, 65, 200])
            return Atom(bytes(r.randrange(256) for _ in range(n)))
        return Cell([rand_z(depth + 1)
                     for _ in range(r.choice([0, 1, 3, 5, 65]))])

    for _ in range(100):
        z = rand_z()
        assert from_bytes(to_bytes(z)) == z


def test_zdata_doc_example():
    z = Cell([Atom(b"\x01"), Atom(b"\x02\x03")])
    assert from_bytes(to_bytes(z)) == z
    # tag bytes: small cell of 2, small atoms of 1 and 2
    enc = to_bytes(z)
    assert enc[0] == 0b1100_0010
    assert enc[1] == 0b0100_0001


def test_zdag_roundtrip():
    store = Store(BN256_SCALAR, use_device=False)
    expr = read_with_default_state(
        store, '(cons "hello" (cons 42u64 (quote (a b . c))))')
    store.hydrate_z_cache()
    z_dag = ZDag()
    root = z_dag.populate_with(expr, store)
    data = z_dag.to_json()
    # reload into a FRESH store and compare content addresses
    store2 = Store(BN256_SCALAR, use_device=False)
    z_dag2 = ZDag.from_json(data)
    ptr2 = z_dag2.populate_store(root, store2)
    assert store2.hash_ptr(ptr2) == root
    # printing survives the roundtrip
    from lurk_tpu.store.printer import fmt_to_string
    from lurk_tpu.symbol import State
    st = State.init_lurk_state()
    assert fmt_to_string(ptr2, store2, st) == \
        fmt_to_string(expr, store, st)


def test_zstore_commitments_roundtrip(tmp_path):
    store = Store(BN256_SCALAR, use_device=False)
    payload = read_with_default_state(store, "(1 2 3)")
    digest, _ = store.hide_and_return_z_payload(99, payload)
    zs = ZStore()
    zs.populate_with_commitment(digest, store)
    data = zs.to_json()
    store2 = Store(BN256_SCALAR, use_device=False)
    zs2 = ZStore.from_json(data)
    zs2.populate_store(store2)
    secret, payload2 = store2.open(digest)
    assert secret == 99
    assert store2.hash_ptr(payload2) == store.hash_ptr(payload)

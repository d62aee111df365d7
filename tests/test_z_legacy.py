"""Legacy ZExpr/ZCont/ZStore model (z_expr.rs:23-161, z_cont.rs:22-342,
z_store.rs:23-138): per-variant 8-ary continuation hashing, legacy
string/symbol chains (which must coincide with the current-gen store's
interning digests — a bit-exact cross-model anchor), and the ZData
serde encoding roundtrip (serde/ser.rs + de.rs rules)."""

import random

from lurk_tpu.fields import BN256_SCALAR
from lurk_tpu.store.core import PoseidonMemo as PoseidonCache
from lurk_tpu.store.core import Store, ZPtr
from lurk_tpu.store import z_data as zd
from lurk_tpu.store.z_legacy import (
    ZCont, ZExpr, ZStoreLegacy, zcont_from_z_data, zcont_to_z_data,
    zexpr_from_z_data, zexpr_to_z_data, zstore_from_z_data,
    zstore_to_z_data,
)
from lurk_tpu.symbol import Symbol
from lurk_tpu.tags import ContTag, ExprTag, Op1, Op2


def test_legacy_string_symbol_match_store():
    """Legacy put_string/put_symbol reproduce the current-gen store's
    interning digests (both are hash4 char/sym cons chains)."""
    store = Store(BN256_SCALAR, use_device=False)
    cache = PoseidonCache(BN256_SCALAR)
    zs = ZStoreLegacy()
    for s in ("", "a", "abc", "hello world"):
        ptr, _ = zs.put_string(s, cache, BN256_SCALAR)
        want = store.hash_ptr(store.intern_string(s))
        assert (ptr.tag, ptr.digest) == (want.tag, want.digest)
    sym = Symbol(("lurk", "user", "square"))
    ptr, _ = zs.put_symbol(sym, cache, BN256_SCALAR)
    want = store.hash_ptr(store.intern_symbol(sym))
    assert ptr.digest == want.digest
    # nil: ZExpr::Nil z_ptr = Nil-tagged digest of .lurk.nil
    nil_ptr = ZExpr("Nil").z_ptr(cache, BN256_SCALAR)
    want_nil = store.hash_ptr(store.intern_nil())
    assert (nil_ptr.tag, nil_ptr.digest) == (want_nil.tag,
                                             want_nil.digest)


def test_zcont_hash_components():
    """8-ary zero-padded hashing (z_cont.rs:91-233): trivial conts
    hash to hash8(zeros); components land in declaration order."""
    cache = PoseidonCache(BN256_SCALAR)
    h80 = cache.hash((0,) * 8)
    for v in ("Outermost", "Error", "Dummy", "Terminal"):
        z = ZCont(v).z_ptr(cache)
        assert z.digest == h80 and z.tag == getattr(ContTag, v)
    env = ZPtr(ExprTag.Env, 7)
    cont = ZPtr(ContTag.Outermost, h80)
    zc = ZCont("Call0", (env, cont))
    comps = zc.hash_components()
    assert comps == [ExprTag.Env, 7, ContTag.Outermost, h80, 0, 0, 0, 0]
    unop = ZCont("Unop", (Op1.Car, cont))
    assert unop.hash_components()[:4] == [0x2000, 0, ContTag.Outermost,
                                          h80]
    binop = ZCont("Binop", (Op2.Sum, env, ZPtr(ExprTag.Cons, 9), cont))
    assert binop.hash_components() == [
        0x3000, 0, ExprTag.Env, 7, ExprTag.Cons, 9, ContTag.Outermost,
        h80]


def test_zexpr_zdata_roundtrip():
    r = random.Random(4)
    p = BN256_SCALAR.modulus

    def zp(tag):
        return ZPtr(tag, r.randrange(p))

    cases = [
        ZExpr("Nil"), ZExpr("RootSym"), ZExpr("RootKey"),
        ZExpr("EmptyStr"),
        ZExpr("Cons", (zp(ExprTag.Num), zp(ExprTag.Cons))),
        ZExpr("Comm", (r.randrange(p), zp(ExprTag.Fun))),
        ZExpr("Sym", (zp(ExprTag.Str), zp(ExprTag.Sym))),
        ZExpr("Key", (zp(ExprTag.Str), zp(ExprTag.Key))),
        ZExpr("Fun", (zp(ExprTag.Sym), zp(ExprTag.Cons),
                      zp(ExprTag.Env))),
        ZExpr("Num", (r.randrange(p),)),
        ZExpr("Str", (zp(ExprTag.Char), zp(ExprTag.Str))),
        ZExpr("Thunk", (zp(ExprTag.Num), ZPtr(ContTag.Tail, 5))),
        ZExpr("Char", ("z",)),
        ZExpr("UInt", (123456789,)),
    ]
    for e in cases:
        data = zexpr_to_z_data(e)
        # byte-level roundtrip through the ZData tree format too
        data2 = zd.from_bytes(zd.to_bytes(data))
        assert zexpr_from_z_data(data2) == e


def test_zcont_zdata_roundtrip():
    r = random.Random(9)
    p = BN256_SCALAR.modulus

    def zp(tag):
        return ZPtr(tag, r.randrange(p))

    cont = ZPtr(ContTag.Outermost, r.randrange(p))
    cases = [
        ZCont("Outermost"), ZCont("Error"), ZCont("Dummy"),
        ZCont("Terminal"),
        ZCont("Call0", (zp(ExprTag.Env), cont)),
        ZCont("Call", (zp(ExprTag.Env), zp(ExprTag.Num), cont)),
        ZCont("Call2", (zp(ExprTag.Env), zp(ExprTag.Fun), cont)),
        ZCont("Tail", (zp(ExprTag.Env), cont)),
        ZCont("Lookup", (zp(ExprTag.Env), cont)),
        ZCont("Unop", (Op1.Cdr, cont)),
        ZCont("Binop", (Op2.Product, zp(ExprTag.Env),
                        zp(ExprTag.Cons), cont)),
        ZCont("Binop2", (Op2.Diff, zp(ExprTag.Num), cont)),
        ZCont("If", (zp(ExprTag.Cons), cont)),
        ZCont("Let", (zp(ExprTag.Sym), zp(ExprTag.Cons),
                      zp(ExprTag.Env), cont)),
        ZCont("LetRec", (zp(ExprTag.Sym), zp(ExprTag.Cons),
                         zp(ExprTag.Env), cont)),
        ZCont("Emit", (cont,)),
    ]
    for c in cases:
        data = zcont_to_z_data(c)
        data2 = zd.from_bytes(zd.to_bytes(data))
        assert zcont_from_z_data(data2) == c


def test_zstore_roundtrip_and_get():
    cache = PoseidonCache(BN256_SCALAR)
    zs = ZStoreLegacy()
    zs.put_symbol(Symbol(("lurk", "user", "f")), cache, BN256_SCALAR)
    zs.put_string("chain", cache, BN256_SCALAR)
    zc = ZCont("Emit", (ZPtr(ContTag.Outermost,
                             cache.hash((0,) * 8)),))
    zs.insert_z_cont(zc.z_ptr(cache), zc)
    data = zstore_to_z_data(zs)
    zs2 = zstore_from_z_data(zd.from_bytes(zd.to_bytes(data)))
    assert zs2.expr_map == zs.expr_map
    assert zs2.cont_map == zs.cont_map
    # immediates resolve without map entries
    assert zs2.get_expr(ZPtr(ExprTag.U64, 7)) == ZExpr("UInt", (7,))
    assert zs2.get_expr(ZPtr(ExprTag.Str, 0)) == ZExpr("EmptyStr")
    # z_store.rs:71 faithfulness: Key(0) resolves to RootSym
    assert zs2.get_expr(ZPtr(ExprTag.Key, 0)) == ZExpr("RootSym")

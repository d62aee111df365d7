"""Tests for the minimal wasm interpreter (coproc.wasm_interp).

Modules are hand-assembled with a tiny builder (no external toolchain);
semantics checked against python oracles."""

import struct

import pytest

from lurk_tpu.coproc import wasm_interp as W


# ---------------------------------------------------------------------------
# mini assembler
# ---------------------------------------------------------------------------


def uleb(v):
    out = b""
    while True:
        c = v & 0x7F
        v >>= 7
        if v:
            out += bytes([c | 0x80])
        else:
            return out + bytes([c])


def sleb(v):
    out = b""
    while True:
        c = v & 0x7F
        v >>= 7
        done = (v == 0 and not (c & 0x40)) or (v == -1 and (c & 0x40))
        out += bytes([c | (0 if done else 0x80)])
        if done:
            return out


def section(sid, payload):
    return bytes([sid]) + uleb(len(payload)) + payload


def vec(items):
    return uleb(len(items)) + b"".join(items)


I32, I64 = 0x7F, 0x7E


def functype(params, results):
    return (bytes([0x60]) + vec([bytes([p]) for p in params])
            + vec([bytes([r]) for r in results]))


def module(types=(), funcs=(), codes=(), exports=(), mem_pages=None,
           globals_=(), tables=None, elems=(), datas=(), imports=()):
    """codes: list of (locals list, body bytes)."""
    out = b"\0asm" + struct.pack("<I", 1)
    if types:
        out += section(1, vec(list(types)))
    if imports:
        out += section(2, vec(list(imports)))
    if funcs:
        out += section(3, vec([uleb(t) for t in funcs]))
    if tables is not None:
        out += section(4, vec([bytes([0x70, 0]) + uleb(tables)]))
    if mem_pages is not None:
        out += section(5, vec([bytes([0]) + uleb(mem_pages)]))
    if globals_:
        out += section(6, vec([bytes([vt, mut]) + init
                               for vt, mut, init in globals_]))
    if exports:
        out += section(7, vec([uleb(len(n.encode())) + n.encode()
                               + bytes([k]) + uleb(i)
                               for n, k, i in exports]))
    if elems:
        out += section(9, vec([uleb(0) + off + vec([uleb(f) for f in fs])
                               for off, fs in elems]))
    if codes:
        bodies = []
        for locs, body in codes:
            loc = vec([uleb(cnt) + bytes([vt]) for cnt, vt in locs])
            code = loc + body
            bodies.append(uleb(len(code)) + code)
        out += section(10, vec(bodies))
    if datas:
        out += section(11, vec([uleb(0) + off + uleb(len(d)) + d
                                for off, d in datas]))
    return out


def i32c(v):
    return bytes([0x41]) + sleb(v)


def i64c(v):
    return bytes([0x42]) + sleb(v)


END = bytes([0x0B])
LOCAL_GET = lambda i: bytes([0x20]) + uleb(i)       # noqa: E731
LOCAL_SET = lambda i: bytes([0x21]) + uleb(i)       # noqa: E731
LOCAL_TEE = lambda i: bytes([0x22]) + uleb(i)       # noqa: E731
GLOBAL_GET = lambda i: bytes([0x23]) + uleb(i)      # noqa: E731
GLOBAL_SET = lambda i: bytes([0x24]) + uleb(i)      # noqa: E731
CALL = lambda i: bytes([0x10]) + uleb(i)            # noqa: E731


def test_i32_arith_and_compare():
    # f(a, b) = (a*b + a - b) ^ (a << 3) with u32 wrap
    body = (LOCAL_GET(0) + LOCAL_GET(1) + bytes([0x6C])
            + LOCAL_GET(0) + bytes([0x6A])
            + LOCAL_GET(1) + bytes([0x6B])
            + LOCAL_GET(0) + i32c(3) + bytes([0x74])
            + bytes([0x73]) + END)
    m = module(types=[functype([I32, I32], [I32])], funcs=[0],
               codes=[([], body)], exports=[("f", 0, 0)])
    inst = W.Instance(W.parse_module(m))
    f = inst.export("f")
    for a, b in [(3, 5), (0xFFFFFFFF, 2), (12345, 67890)]:
        exp = (((a * b) + a - b) ^ ((a << 3) & 0xFFFFFFFF)) & 0xFFFFFFFF
        assert f(a, b) == exp


def test_div_rem_signed():
    # f(a, b) = a div_s b
    body = LOCAL_GET(0) + LOCAL_GET(1) + bytes([0x6D]) + END
    m = module(types=[functype([I32, I32], [I32])], funcs=[0],
               codes=[([], body)], exports=[("f", 0, 0)])
    f = W.Instance(W.parse_module(m)).export("f")
    assert f(7, 2) == 3
    assert f((-7) & 0xFFFFFFFF, 2) == (-3) & 0xFFFFFFFF
    assert f(7, (-2) & 0xFFFFFFFF) == (-3) & 0xFFFFFFFF
    with pytest.raises(W.WasmTrap):
        f(1, 0)


def test_factorial_recursion_i64():
    # fact(n) = n == 0 ? 1 : n * fact(n-1)
    body = (LOCAL_GET(0) + bytes([0x50])          # i64.eqz
            + bytes([0x04, I64])                  # if (result i64)
            + i64c(1)
            + bytes([0x05])                       # else
            + LOCAL_GET(0)
            + LOCAL_GET(0) + i64c(1) + bytes([0x7D]) + CALL(0)
            + bytes([0x7E])
            + END + END)
    m = module(types=[functype([I64], [I64])], funcs=[0],
               codes=[([], body)], exports=[("fact", 0, 0)])
    f = W.Instance(W.parse_module(m)).export("fact")
    import math
    assert f(10) == math.factorial(10)
    assert f(20) == math.factorial(20)


def test_loop_br_if_sum():
    # sum 1..n via loop + br_if: local1 = acc, local0 = n
    body = (
        bytes([0x02, 0x40])                       # block
        + bytes([0x03, 0x40])                     # loop
        + LOCAL_GET(0) + bytes([0x45])            # i32.eqz
        + bytes([0x0D]) + uleb(1)                 # br_if 1 (exit block)
        + LOCAL_GET(1) + LOCAL_GET(0) + bytes([0x6A]) + LOCAL_SET(1)
        + LOCAL_GET(0) + i32c(1) + bytes([0x6B]) + LOCAL_SET(0)
        + bytes([0x0C]) + uleb(0)                 # br 0 (continue loop)
        + END + END
        + LOCAL_GET(1) + END)
    m = module(types=[functype([I32], [I32])], funcs=[0],
               codes=[([(1, I32)], body)], exports=[("sum", 0, 0)])
    f = W.Instance(W.parse_module(m)).export("sum")
    assert f(10) == 55
    assert f(1000) == 500500


def test_br_table():
    # f(i) = [11, 22, 33][i] or 99
    body = (
        bytes([0x02, 0x40]) * 4
        + LOCAL_GET(0)
        + bytes([0x0E]) + uleb(3) + uleb(0) + uleb(1) + uleb(2) + uleb(3)
        + END + i32c(11) + bytes([0x0F])
        + END + i32c(22) + bytes([0x0F])
        + END + i32c(33) + bytes([0x0F])
        + END + i32c(99) + END)
    m = module(types=[functype([I32], [I32])], funcs=[0],
               codes=[([], body)], exports=[("f", 0, 0)])
    f = W.Instance(W.parse_module(m)).export("f")
    assert [f(i) for i in range(5)] == [11, 22, 33, 99, 99]


def test_memory_globals_and_data():
    # g += mem32[a]; mem32[a] = g; returns g   (global 0 mutable i32=7)
    body = (GLOBAL_GET(0)
            + LOCAL_GET(0) + bytes([0x28]) + uleb(2) + uleb(0)
            + bytes([0x6A]) + GLOBAL_SET(0)
            + LOCAL_GET(0) + GLOBAL_GET(0)
            + bytes([0x36]) + uleb(2) + uleb(0)
            + GLOBAL_GET(0) + END)
    m = module(types=[functype([I32], [I32])], funcs=[0],
               codes=[([], body)], exports=[("f", 0, 0), ("mem", 2, 0)],
               mem_pages=1, globals_=[(I32, 1, i32c(7) + END)],
               datas=[(i32c(16) + END, struct.pack("<I", 100))])
    inst = W.Instance(W.parse_module(m))
    f = inst.export("f")
    assert f(16) == 107
    assert struct.unpack("<I", bytes(inst.mem[16:20]))[0] == 107
    assert f(16) == 214


def test_call_indirect():
    # table [add, mul]; f(i, a, b) = table[i](a, b)
    add = LOCAL_GET(0) + LOCAL_GET(1) + bytes([0x6A]) + END
    mul = LOCAL_GET(0) + LOCAL_GET(1) + bytes([0x6C]) + END
    disp = (LOCAL_GET(1) + LOCAL_GET(2) + LOCAL_GET(0)
            + bytes([0x11]) + uleb(0) + uleb(0) + END)
    m = module(types=[functype([I32, I32], [I32]),
                      functype([I32, I32, I32], [I32])],
               funcs=[0, 0, 1],
               codes=[([], add), ([], mul), ([], disp)],
               exports=[("f", 0, 2)], tables=2,
               elems=[(i32c(0) + END, [0, 1])])
    f = W.Instance(W.parse_module(m)).export("f")
    assert f(0, 3, 4) == 7
    assert f(1, 3, 4) == 12


def test_imports_and_i64_ops():
    # f(a) = host_mul3(a) + (a >> 2 rotl 1)  over i64
    imp = (uleb(3) + b"env" + uleb(4) + b"mul3" + bytes([0])
           + uleb(0))
    body = (LOCAL_GET(0) + CALL(0)
            + LOCAL_GET(0) + i64c(2) + bytes([0x88])
            + i64c(1) + bytes([0x89])
            + bytes([0x7C]) + END)
    m = module(types=[functype([I64], [I64])], funcs=[0],
               codes=[([], body)], exports=[("f", 0, 1)],
               imports=[imp])
    inst = W.Instance(W.parse_module(m),
                      imports={("env", "mul3"): lambda a: (a * 3)
                               & 0xFFFFFFFFFFFFFFFF})
    f = inst.export("f")
    for a in (5, 1 << 62, 0xFFFFFFFFFFFFFFFF):
        shr = (a & 0xFFFFFFFFFFFFFFFF) >> 2
        rot = ((shr << 1) | (shr >> 63)) & 0xFFFFFFFFFFFFFFFF
        assert f(a) == ((a * 3) + rot) & 0xFFFFFFFFFFFFFFFF


def test_memory_grow_and_size():
    body = (bytes([0x3F, 0x00])                   # memory.size
            + bytes([0x40, 0x00]) if False else None)
    # grow by arg, return old size
    body = (LOCAL_GET(0) + bytes([0x40, 0x00]) + END)
    m = module(types=[functype([I32], [I32])], funcs=[0],
               codes=[([], body)], exports=[("grow", 0, 0)],
               mem_pages=1)
    inst = W.Instance(W.parse_module(m))
    assert inst.export("grow")(2) == 1
    assert len(inst.mem) == 3 * W.PAGE

"""End-to-end test of the circom witness-calculator protocol over the
offline wasm interpreter: a hand-assembled multiplier witness module
(w = [1, a*b, a, b] mod 2^31-1) driven through WitnessCalculator and a
CircomGadget."""

import struct

from lurk_tpu.coproc import circom as C
from lurk_tpu.coproc.wasm_witness import WitnessCalculator, fnv1a_64
from tests.test_wasm_interp import (
    CALL, END, GLOBAL_GET, GLOBAL_SET, I32, I64, LOCAL_GET, LOCAL_SET,
    functype, i32c, i64c, module, uleb,
)

P = (1 << 31) - 1


def build_multiplier_wasm() -> bytes:
    """Witness calculator for c = a*b over P. Memory: shared rw buffer
    @0 (one u32; n32 = 1), a @16, b @20."""
    lsb_a = fnv1a_64("a") & 0xFFFFFFFF
    lsb_b = fnv1a_64("b") & 0xFFFFFFFF

    t_v_i = functype([I32], [])          # init / getWitness
    t_i_v = functype([], [I32])          # getFieldNumLen32 / sizes
    t_v_v = functype([], [])             # getRawPrime
    t_ii_v = functype([I32, I32], [])    # writeSharedRWMemory
    t_i_i = functype([I32], [I32])       # readSharedRWMemory
    t_iii_v = functype([I32, I32, I32], [])   # setInputSignal
    types = [t_v_i, t_i_v, t_v_v, t_ii_v, t_i_i, t_iii_v]

    def store32(addr_code, val_code):
        return addr_code + val_code + bytes([0x36]) + uleb(2) + uleb(0)

    def load32(addr_code):
        return addr_code + bytes([0x28]) + uleb(2) + uleb(0)

    init = END                                        # no-op
    get_n32 = i32c(1) + END
    get_raw_prime = store32(i32c(0), i32c(P)) + END
    read_shared = load32(LOCAL_GET(0) + i32c(4) + bytes([0x6C])) + END
    write_shared = store32(LOCAL_GET(0) + i32c(4) + bytes([0x6C]),
                           LOCAL_GET(1)) + END
    # setInputSignal(msb, lsb, pos): a @16 when lsb == lsb_a, b @20
    set_input = (
        LOCAL_GET(1) + i32c(lsb_a) + bytes([0x46])    # i32.eq
        + bytes([0x04, 0x40])                         # if
        + store32(i32c(16), load32(i32c(0)))
        + bytes([0x05])                               # else
        + LOCAL_GET(1) + i32c(lsb_b) + bytes([0x46])
        + bytes([0x04, 0x40])
        + store32(i32c(20), load32(i32c(0)))
        + END
        + END + END)
    get_witness_size = i32c(4) + END
    # getWitness(i): shared[0] = w_i
    mul_mod = (
        load32(i32c(16)) + bytes([0xAD])              # i64.extend_u
        + load32(i32c(20)) + bytes([0xAD])
        + bytes([0x7E])                               # i64.mul
        + i64c(P) + bytes([0x82])                     # i64.rem_u
        + bytes([0xA7]))                              # i32.wrap
    get_witness = (
        LOCAL_GET(0) + bytes([0x45])                  # i == 0
        + bytes([0x04, 0x40]) + store32(i32c(0), i32c(1))
        + bytes([0x05])
        + LOCAL_GET(0) + i32c(1) + bytes([0x46])
        + bytes([0x04, 0x40]) + store32(i32c(0), mul_mod)
        + bytes([0x05])
        + LOCAL_GET(0) + i32c(2) + bytes([0x46])
        + bytes([0x04, 0x40]) + store32(i32c(0), load32(i32c(16)))
        + bytes([0x05]) + store32(i32c(0), load32(i32c(20)))
        + END + END + END + END)

    funcs = [0, 1, 2, 4, 3, 5, 1, 0]
    codes = [([], init), ([], get_n32), ([], get_raw_prime),
             ([], read_shared), ([], write_shared), ([], set_input),
             ([], get_witness_size), ([], get_witness)]
    exports = [("init", 0, 0), ("getFieldNumLen32", 0, 1),
               ("getRawPrime", 0, 2), ("readSharedRWMemory", 0, 3),
               ("writeSharedRWMemory", 0, 4), ("setInputSignal", 0, 5),
               ("getWitnessSize", 0, 6), ("getWitness", 0, 7),
               ("memory", 2, 0)]
    return module(types=types, funcs=funcs, codes=codes,
                  exports=exports, mem_pages=1)


def test_witness_calculator_protocol():
    calc = WitnessCalculator(build_multiplier_wasm())
    assert calc.n32 == 1
    assert calc.prime == P
    w = calc.calculate_witness({"a": [123456], "b": [9876]})
    assert w == [1, (123456 * 9876) % P, 123456, 9876]
    w = calc.calculate_witness({"b": 3, "a": P - 1})
    assert w == [1, ((P - 1) * 3) % P, P - 1, 3]


def test_circom_gadget_wasm_witness(tmp_path):
    wasm = tmp_path / "mul.wasm"
    wasm.write_bytes(build_multiplier_wasm())
    r1cs = C.R1cs(prime=P, n_wires=4, n_pub_out=1, n_pub_in=0,
                  n_prv_in=2, n_labels=4,
                  constraints=[({2: 1}, {3: 1}, {1: 1})])
    gadget = C.CircomGadget("test/mul", r1cs, wasm_path=str(wasm))
    w = gadget.calculate_witness({"a": [777], "b": [1001]})
    assert w[1] == (777 * 1001) % P
    assert gadget.check_witness(w)
    bad = list(w)
    bad[1] = (bad[1] + 1) % P
    assert not gadget.check_witness(bad)

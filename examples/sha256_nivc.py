"""SuperNova NIVC proof with the sha256 coprocessor — parity with the
reference's examples/sha256_nivc.rs:59-100.

Usage: python3 examples/sha256_nivc.py [n_args]
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1

    from lurk_tpu.coproc.sha256 import sha256_coprocessor
    from lurk_tpu.fields import BN256_SCALAR
    from lurk_tpu.lem.evaluation import Lang
    from lurk_tpu.proof import supernova as sn
    from lurk_tpu.proof.supernova import SuperNovaProver
    from lurk_tpu.store.core import Store
    from lurk_tpu.symbol import user_sym

    store = Store(BN256_SCALAR)
    lang = Lang()
    sym = user_sym(f"sha256_nivc_{n}")
    lang.add_coprocessor(sym, sha256_coprocessor(n))

    args = [store.num(i + 1) for i in range(n)]
    expr = store.list([store.intern_symbol(sym)] + args)
    prover = SuperNovaProver(rc=10, lang=lang)

    t0 = time.time()
    pp, proof, frames = prover.evaluate_and_prove(store, expr)
    t_prove = time.time() - t0
    assert sn.verify(pp, proof), "NIVC verification failed"
    pcs = sorted({pc for pc, _, _ in proof.steps})
    print(f"sha256_nivc_{n}: {len(frames)} frames, "
          f"{len(proof.steps)} NIVC steps over circuits {pcs}, "
          f"proved+verified in {t_prove:.1f}s")


if __name__ == "__main__":
    main()

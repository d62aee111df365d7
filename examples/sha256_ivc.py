"""Nova IVC proof with the sha256 coprocessor — parity with the
reference's examples/sha256_ivc.rs (same program shape; IVC folds every
frame through ONE universal circuit that inlines the coprocessor,
unlike sha256_nivc.py's per-circuit NIVC dispatch).

Usage: python3 examples/sha256_ivc.py [n_args]
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1

    from lurk_tpu.coproc.sha256 import sha256_coprocessor
    from lurk_tpu.fields import BN256_SCALAR
    from lurk_tpu.lem.evaluation import Lang
    from lurk_tpu.proof import prover as nova_prover
    from lurk_tpu.proof.prover import NovaProver
    from lurk_tpu.store.core import Store
    from lurk_tpu.symbol import user_sym

    store = Store(BN256_SCALAR)
    lang = Lang()
    sym = user_sym(f"sha256_ivc_{n}")
    lang.add_coprocessor(sym, sha256_coprocessor(n))

    args = [store.num(i + 1) for i in range(n)]
    expr = store.list([store.intern_symbol(sym)] + args)
    prover = NovaProver(rc=10, lang=lang)

    t0 = time.time()
    pp, proof, frames = prover.evaluate_and_prove(store, expr)
    t_prove = time.time() - t0
    assert NovaProver.verify(pp, proof), "IVC verification failed"
    print(f"sha256_ivc_{n}: {len(frames)} frames, "
          f"proved+verified in {t_prove:.1f}s")


if __name__ == "__main__":
    main()

"""Multilinear-extension utilities over a prime field (host side).

Building blocks for the Spartan compression SNARK (spartan.py): dense
MLE evaluation/binding, eq/chi tables, and a generic sumcheck prover/
verifier exchanging round polynomials in evaluation form.

Functionality parity target: arecibo's `spartan::polys::{multilinear,
eq}` and `spartan::sumcheck` (external crate driven by
/root/reference/src/proof/nova.rs:232-251 `CompressedSNARK`). Host
Python big-int arithmetic: compression runs once per proof; the MSMs it
feeds (ipa.py) are the device-acceleratable part.

Convention: an array `a` of length 2^k represents the MLE
a~(r_0..r_{k-1}) where r_0 binds the MOST significant index bit — i.e.
binding r_0 folds the second half onto the first:
    a'[i] = a[i] + r_0 * (a[i + 2^(k-1)] - a[i]).
The chi/eq table and the IPA fold (ipa.py) use the same order.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple


def next_pow2(n: int) -> int:
    return 1 if n <= 1 else 1 << (n - 1).bit_length()


def pad_pow2(vec: Sequence[int], n: int) -> List[int]:
    out = list(vec)
    assert len(out) <= n
    out.extend([0] * (n - len(out)))
    return out


def bind_top(a: List[int], r: int, p: int) -> List[int]:
    """Bind the top variable of the MLE to r (halves the array)."""
    half = len(a) // 2
    return [(a[i] + r * (a[i + half] - a[i])) % p for i in range(half)]


def chi_table(rs: Sequence[int], p: int) -> List[int]:
    """chi[i] = prod_j (r_j if bit_j(i) else 1-r_j), bit_0 = MSB.

    This is the vector of Lagrange-basis evaluations: for any array a,
    a~(rs) = <a, chi_table(rs)>. Built LSB-inward (iterate reversed) so
    rs[0] lands on the MSB, matching bind_top/mle_eval."""
    chi = [1]
    for r in reversed(rs):
        lo = [(c * (1 - r)) % p for c in chi]
        hi = [(c * r) % p for c in chi]
        chi = lo + hi
    return chi


def mle_eval(a: Sequence[int], rs: Sequence[int], p: int) -> int:
    """Evaluate the MLE of `a` (length 2^len(rs)) at point rs."""
    cur = list(a)
    for r in rs:
        cur = bind_top(cur, r, p)
    return cur[0] % p


def eq_eval(rs: Sequence[int], xs: Sequence[int], p: int) -> int:
    """eq(rs, xs) = prod_j (r_j x_j + (1-r_j)(1-x_j))."""
    acc = 1
    for r, x in zip(rs, xs):
        acc = acc * (r * x + (1 - r) * (1 - x)) % p
    return acc


def lagrange_eval(evals: Sequence[int], t: int, p: int) -> int:
    """Evaluate the degree-(len-1) polynomial with values evals[j] at
    j = 0..len-1, at point t (Lagrange interpolation)."""
    n = len(evals)
    acc = 0
    for j in range(n):
        num, den = 1, 1
        for m in range(n):
            if m == j:
                continue
            num = num * (t - m) % p
            den = den * (j - m) % p
        acc = (acc + evals[j] * num * pow(den, -1, p)) % p
    return acc


# ---------------------------------------------------------------------------
# Generic sumcheck over products of dense MLEs
# ---------------------------------------------------------------------------


def sumcheck_prove(
    claim: int,
    num_rounds: int,
    polys: List[List[int]],
    comb: Callable[[Sequence[int]], int],
    degree: int,
    p: int,
    challenge: Callable[[Sequence[int]], int],
) -> Tuple[List[List[int]], List[int], List[int]]:
    """Prove sum_{x in {0,1}^k} comb(polys_0(x), ..) == claim.

    polys: dense arrays (same length 2^num_rounds), bound in place per
    round. comb: multilinear combination of the per-point values, total
    degree `degree` in each variable. challenge(round_evals) -> r_i is
    the Fiat-Shamir callback (absorbs the round poly, squeezes).

    Returns (round_polys [each degree+1 evals at t=0..degree],
    challenges r, final per-poly values)."""
    cur = [list(q) for q in polys]
    round_polys: List[List[int]] = []
    rs: List[int] = []
    for _ in range(num_rounds):
        half = len(cur[0]) // 2
        evals = []
        for t in range(degree + 1):
            s = 0
            for i in range(half):
                vals = [
                    (q[i] + t * (q[i + half] - q[i])) % p for q in cur
                ]
                s = (s + comb(vals)) % p
            evals.append(s)
        round_polys.append(evals)
        r = challenge(evals)
        rs.append(r)
        cur = [bind_top(q, r, p) for q in cur]
    finals = [q[0] % p for q in cur]
    return round_polys, rs, finals


def sumcheck_verify(
    claim: int,
    round_polys: List[List[int]],
    degree: int,
    p: int,
    challenge: Callable[[Sequence[int]], int],
) -> Tuple[int, List[int]]:
    """Walk the round polynomials; returns (final_claim, challenges).

    Raises ValueError on a malformed round (degree or sum check)."""
    e = claim % p
    rs: List[int] = []
    for evals in round_polys:
        if len(evals) != degree + 1:
            raise ValueError("sumcheck round poly has wrong degree")
        if (evals[0] + evals[1]) % p != e:
            raise ValueError("sumcheck round sum mismatch")
        r = challenge(evals)
        rs.append(r)
        e = lagrange_eval(evals, r, p)
    return e, rs

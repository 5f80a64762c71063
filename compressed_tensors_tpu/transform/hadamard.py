"""Hadamard / rotation matrix construction.

The reference ships Sloane's library of known Hadamard matrices as a binary
data file (`transform/utils/hadamard.py:91` + hadamards.safetensors); here
the non-power-of-2 base matrices are *constructed* via the Paley I / Paley II
constructions instead (no data file), then extended with Sylvester doubling.
This covers the divisors LLM dims need (12, 20, 28, 36, 44, 60, ...).
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np

__all__ = [
    "deterministic_hadamard_matrix",
    "hadamard_matrix",
    "random_hadamard_matrix",
    "random_matrix",
    "high_precision_invert",
    "is_pow2",
]


def is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1) == 0)


def _is_prime(n: int) -> bool:
    if n < 2:
        return False
    for p in range(2, int(math.isqrt(n)) + 1):
        if n % p == 0:
            return False
    return True


def _prime_power(n: int):
    """(p, m) with n == p**m and p prime, or None."""
    for p in range(2, int(math.isqrt(n)) + 1):
        if n % p == 0:
            m, v = 0, n
            while v % p == 0:
                v //= p
                m += 1
            return (p, m) if v == 1 and _is_prime(p) else None
    return (n, 1) if _is_prime(n) else None


@lru_cache(maxsize=None)
def _gf_tables(q: int):
    """Field tables for GF(q), q = p^m: (elements as int tuples indexed
    0..q-1 with 0 at index 0, subtraction table sub[i, j] -> element index,
    quadratic-residue membership per index). Elements are polynomials over
    GF(p) reduced mod a monic irreducible of degree m (found by search)."""
    p, m = _prime_power(q)
    if m == 1:
        idx = np.arange(q)
        sub = (idx[:, None] - idx[None, :]) % q
        qr = np.zeros(q, dtype=bool)
        qr[[(i * i) % q for i in range(1, q)]] = True
        return sub, qr

    # polynomial arithmetic over GF(p), coefficients low-to-high
    def poly_mul(a, b, mod):
        res = [0] * (len(a) + len(b) - 1)
        for i, ai in enumerate(a):
            for j, bj in enumerate(b):
                res[i + j] = (res[i + j] + ai * bj) % p
        # reduce by the monic irreducible `mod` (degree m)
        while len(res) > m:
            lead = res[-1]
            if lead:
                for k in range(m + 1):
                    res[len(res) - 1 - k] = (
                        res[len(res) - 1 - k] - lead * mod[m - k]) % p
            res.pop()
        return tuple(res + [0] * (m - len(res)))

    def poly_rem(f, g):
        # remainder of f mod monic g, coefficients low-to-high over GF(p)
        f = list(f)
        dg = len(g) - 1
        while len(f) > dg:
            lead = f[-1]
            if lead:
                for k in range(dg + 1):
                    f[len(f) - 1 - k] = (f[len(f) - 1 - k]
                                         - lead * g[dg - k]) % p
            f.pop()
        return f

    def irreducible():
        # search monic irreducibles of degree m over GF(p) by trial
        # division: f (monic, degree m) is irreducible iff no monic
        # divisor of degree 1..m//2 divides it — valid for every m,
        # unlike a root-only test (sufficient only for m <= 3)
        from itertools import product as iproduct

        divisors = [
            list(c) + [1]
            for d in range(1, m // 2 + 1)
            for c in iproduct(range(p), repeat=d)
        ]
        for coeffs in iproduct(range(p), repeat=m):
            mod = list(coeffs) + [1]  # monic
            if mod[0] == 0:  # divisible by x
                continue
            if all(any(poly_rem(mod, g)) for g in divisors):
                return mod
        raise ValueError(f"no irreducible found for GF({p}^{m})")

    mod = irreducible()
    from itertools import product as iproduct

    elements = [tuple(e) for e in iproduct(range(p), repeat=m)]
    # order with 0 first (iproduct emits (0,...,0) first)
    index = {e: i for i, e in enumerate(elements)}

    sub = np.zeros((q, q), dtype=np.int32)
    for i, a in enumerate(elements):
        for j, b in enumerate(elements):
            sub[i, j] = index[tuple((x - y) % p for x, y in zip(a, b))]
    qr = np.zeros(q, dtype=bool)
    for e in elements[1:]:
        qr[index[poly_mul(list(e), list(e), mod)]] = True
    return sub, qr


def _jacobsthal(q: int) -> np.ndarray:
    """Jacobsthal matrix Q[i, j] = chi(x_i - x_j) over GF(q) (chi the
    quadratic character; q any odd prime power)."""
    sub, qr = _gf_tables(q)
    chi = np.where(qr, 1, -1).astype(np.int8)
    out = chi[sub]
    np.fill_diagonal(out, 0)
    return out


def _paley_I(q: int) -> np.ndarray:
    """Hadamard matrix of order q+1 for prime q = 3 (mod 4): H = I + S with
    S the skew conference matrix built from the Jacobsthal matrix."""
    Q = _jacobsthal(q)
    n = q + 1
    H = np.ones((n, n), dtype=np.int8)
    H[1:, 1:] = Q + np.eye(q, dtype=np.int8)
    H[1:, 0] = -1
    return H


def _paley_II_standard(q: int) -> np.ndarray:
    """Standard Paley II: H = kron(S, [[1,1],[1,-1]]) + kron(I_m, [[1,-1],[-1,-1]])
    for the (m x m) symmetric conference matrix S (zero diagonal)."""
    Q = _jacobsthal(q)
    m = q + 1
    S = np.zeros((m, m), dtype=np.int8)
    S[0, 1:] = 1
    S[1:, 0] = 1
    S[1:, 1:] = Q
    H = np.kron(S, np.array([[1, 1], [1, -1]], dtype=np.int8)) + np.kron(
        np.eye(m, dtype=np.int8), np.array([[1, -1], [-1, -1]], dtype=np.int8)
    )
    return H


def _verified(H: np.ndarray) -> np.ndarray:
    """Assert H is genuinely Hadamard (H @ H.T == nI) before returning —
    guards the constructed (Paley) paths against any silent field-math
    defect producing a non-orthogonal rotation."""
    n = H.shape[0]
    prod = H.astype(np.int64) @ H.astype(np.int64).T
    if not np.array_equal(prod, n * np.eye(n, dtype=np.int64)):
        raise AssertionError(
            f"constructed matrix of order {n} is not Hadamard"
        )
    return H


@lru_cache(maxsize=None)
def _base_hadamard(k: int) -> np.ndarray | None:
    """A Hadamard matrix of order k (not necessarily a power of 2), or None."""
    if k == 1:
        return np.array([[1]], dtype=np.int8)
    if is_pow2(k):
        return _sylvester(k)
    if k % 4 != 0:
        return None
    # Paley I: k = q + 1, q an odd prime power, q = 3 mod 4
    q = k - 1
    if _prime_power(q) and q % 4 == 3:
        return _verified(_paley_I(q))
    # Paley II: k = 2(q + 1), q an odd prime power, q = 1 mod 4
    # (prime powers cover 52 = 2(25+1), 100 = 2(49+1), 244 = 2(121+1))
    if k % 2 == 0:
        q = k // 2 - 1
        if _prime_power(q) and q % 4 == 1:
            return _verified(_paley_II_standard(q))
    # classical computer-search orders (Williamson/Baumert-Hall type):
    # embedded table from Sloane's public library (see hadamard_data.py)
    from compressed_tensors_tpu.transform.hadamard_data import known_hadamard

    known = known_hadamard(k)
    if known is not None:
        return known
    # doubling: k = 2 * k2 with k2 constructible
    if k % 2 == 0:
        half = _base_hadamard(k // 2)
        if half is not None:
            H2 = np.array([[1, 1], [1, -1]], dtype=np.int8)
            return np.kron(H2, half)
    return None


@lru_cache(maxsize=None)
def _sylvester(size: int) -> np.ndarray:
    log2 = int(math.log2(size))
    H = np.array([[1]], dtype=np.int8)
    for _ in range(log2):
        H = np.block([[H, H], [H, -H]])
    return H


def deterministic_hadamard_matrix(size: int, dtype=np.float64) -> np.ndarray:
    """Sylvester construction; size must be a power of 2
    (ref utils/hadamard.py:21-50)."""
    if size <= 0:
        raise ValueError("Cannot construct deterministic hadamard of size <= 0")
    log2 = int(math.log2(size))
    if size != 2**log2:
        raise ValueError(
            "Cannot construct deterministic hadamard of size != 2^n"
        )
    return _sylvester(size).astype(dtype)


def hadamard_matrix(size: int, dtype=np.float64) -> np.ndarray:
    """A Hadamard matrix of the given order: Sylvester for powers of 2,
    otherwise kron(base, sylvester) with a Paley-constructed base divisor
    (the role of the reference's hadamards.safetensors lookup)."""
    if is_pow2(size):
        return _sylvester(size).astype(dtype)
    # find the largest base k such that size % k == 0 and size/k is pow2
    best = None
    for k in sorted(
        (d for d in range(1, size + 1) if size % d == 0 and
         is_pow2(size // d)),
        reverse=True,
    ):
        base = _base_hadamard(k)
        if base is not None:
            best = (k, base)
            break
    if best is None:
        raise ValueError(f"Cannot construct hadamard matrix of size {size}")
    k, base = best
    return np.kron(base, _sylvester(size // k)).astype(dtype)


def random_hadamard_matrix(
    size: int, seed: int = 0, dtype=np.float64
) -> np.ndarray:
    """Randomized Hadamard: H @ diag(+-1) (ref utils/hadamard.py:53-78)."""
    rng = np.random.default_rng(seed)
    q = rng.integers(0, 2, size=size) * 2 - 1
    H = hadamard_matrix(size, dtype=np.float64)
    return (H * q[None, :]).astype(dtype)


def random_matrix(size: int, seed: int = 0, dtype=np.float64) -> np.ndarray:
    """Uniform random (invertible with prob. 1) matrix
    (ref factory/matrix_multiply.py:52-60)."""
    rng = np.random.default_rng(seed)
    return rng.random((size, size)).astype(dtype)


def high_precision_invert(weight: np.ndarray) -> np.ndarray:
    """float64 inverse (ref factory/matrix_multiply.py:113-124)."""
    return np.linalg.inv(weight.astype(np.float64)).astype(weight.dtype)

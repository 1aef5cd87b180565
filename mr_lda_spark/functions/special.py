"""Vectorized special functions for the variational-Bayes updates (F1).

The reference uses cloud9's `edu.umd.cloud9.math.Gamma`
(pom.xml:127-131; call sites DocumentMapper.java:209-258,
TermReducer.java:173-195, VariationalInference.java:434-449).  scipy is
not available in this environment, so these are self-contained numpy
implementations of the classical algorithms:

- digamma / trigamma: upward recurrence to shift the argument above 6,
  then the standard asymptotic (Stirling-type) series — the same
  scheme used by Minka's lightspeed, Abramowitz & Stegun 6.3.18/6.4.12.
- gammaln: Lanczos approximation (g=7, n=9 coefficients — the widely
  published Godfrey/Pugh parameter set), with reflection for x<0.5.

Accuracy is ~1e-13 relative over the positive reals, comfortably inside
the 1e-10 tolerance of the reference's golden tests
(VariationalInferenceTest.java:25).
"""

from __future__ import annotations

import numpy as np

_SHIFT = 10.0

# Asymptotic series coefficients: psi(x) ~ ln x - 1/2x - sum B_2n / (2n x^2n)
_DIGAMMA_COEF = np.array(
    [
        1.0 / 12,
        -1.0 / 120,
        1.0 / 252,
        -1.0 / 240,
        1.0 / 132,
        -691.0 / 32760,
        1.0 / 12,
    ]
)

_LANCZOS_G = 7.0
_LANCZOS = np.array(
    [
        0.99999999999980993,
        676.5203681218851,
        -1259.1392167224028,
        771.32342877765313,
        -176.61502916214059,
        12.507343278686905,
        -0.13857109526572012,
        9.9843695780195716e-6,
        1.5056327351493116e-7,
    ]
)


def digamma(x):
    """psi(x) for x > 0, vectorized."""
    x = np.asarray(x, dtype=np.float64)
    scalar = x.ndim == 0
    x = np.atleast_1d(x).copy()
    result = np.zeros_like(x)
    # Recurrence psi(x) = psi(x+1) - 1/x until x >= SHIFT.
    mask = x < _SHIFT
    while np.any(mask):
        result[mask] -= 1.0 / x[mask]
        x[mask] += 1.0
        mask = x < _SHIFT
    inv = 1.0 / x
    inv2 = inv * inv
    series = np.zeros_like(x)
    p = inv2.copy()
    for c in _DIGAMMA_COEF:
        series += c * p
        p *= inv2
    result += np.log(x) - 0.5 * inv - series
    return result[0] if scalar else result


def trigamma(x):
    """psi'(x) for x > 0, vectorized (A&S 6.4.12 + recurrence)."""
    x = np.asarray(x, dtype=np.float64)
    scalar = x.ndim == 0
    x = np.atleast_1d(x).copy()
    result = np.zeros_like(x)
    mask = x < _SHIFT
    while np.any(mask):
        result[mask] += 1.0 / (x[mask] * x[mask])
        x[mask] += 1.0
        mask = x < _SHIFT
    inv = 1.0 / x
    inv2 = inv * inv
    # psi'(x) ~ 1/x + 1/2x^2 + sum B_2n / x^(2n+1)
    series = 1.0 + inv * 0.5 + inv2 * (
        1.0 / 6
        + inv2
        * (
            -1.0 / 30
            + inv2
            * (
                1.0 / 42
                + inv2
                * (-1.0 / 30 + inv2 * (5.0 / 66 + inv2 * (-691.0 / 2730)))
            )
        )
    )
    result += series * inv
    return result[0] if scalar else result


def gammaln(x):
    """log|Gamma(x)| for x > 0, vectorized Lanczos (g=7)."""
    x = np.asarray(x, dtype=np.float64)
    scalar = x.ndim == 0
    x = np.atleast_1d(x)
    out = np.empty_like(x, dtype=np.float64)

    small = x < 0.5
    # Reflection: Gamma(x)Gamma(1-x) = pi / sin(pi x)
    if np.any(small):
        xs = x[small]
        out[small] = (
            np.log(np.pi / np.abs(np.sin(np.pi * xs))) - _gammaln_core(1.0 - xs)
        )
    if np.any(~small):
        out[~small] = _gammaln_core(x[~small])
    return out[0] if scalar else out


def _gammaln_core(x):
    z = x - 1.0
    acc = np.full_like(z, _LANCZOS[0])
    for i in range(1, len(_LANCZOS)):
        acc = acc + _LANCZOS[i] / (z + i)
    t = z + _LANCZOS_G + 0.5
    return 0.5 * np.log(2 * np.pi) + (z + 0.5) * np.log(t) - t + np.log(acc)


def polygamma(n: int, x):
    """Only n=1 (trigamma) is needed by the engine; kept scipy-shaped."""
    if n == 1:
        return trigamma(x)
    raise NotImplementedError("only polygamma(1, x) is implemented")


# scipy-compatible alias used across the engine.
psi = digamma

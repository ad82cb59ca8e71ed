"""Shared inverse normal CDF for the normal-scores rank tests.

Neither engine ships a builtin probit, so BOTH evaluate the same
closed-form rational approximation (Peter Acklam's algorithm, 2003 —
the widely reproduced public-domain coefficients, |relative error|
< 1.15e-9 over (0,1)).  The SCALE.md battery-G caveat ("verify both
engines' erfinv digit parity or quantize") is resolved by
construction: ``ppf_col`` (Spark) and ``ppf_sql`` (DuckDB) are
generated from ONE coefficient table with the identical Horner
evaluation order, so the two expression trees compute the same IEEE
doubles; consumers additionally QUANTIZE the score
(round(ppf·1e9) -> bigint) before any aggregation so every downstream
sum is exact integer arithmetic.

The approximation itself is part of the statistic's definition here
(disclosed): the differential certifies both engines agree on it, and
the known-value tests pin the full pipeline against an independent
Python evaluation of the same formula.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Acklam (2003) coefficients.
_A = (-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
_B = (-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01,
      -1.328068155288572e+01)
_C = (-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
_D = (7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
PLOW = 0.02425


def _horner_col(coeffs, x: Column) -> Column:
    acc = F.lit(coeffs[0])
    for c in coeffs[1:]:
        acc = acc * x + F.lit(c)
    return acc


def _horner_sql(coeffs, x: str) -> str:
    acc = repr(coeffs[0])
    for c in coeffs[1:]:
        acc = f"({acc} * {x} + {c!r})"
    return acc


def _tail_col(q: Column) -> Column:
    return _horner_col(_C, q) / (_horner_col(_D, q) * q + F.lit(1.0))


def _tail_sql(q: str) -> str:
    return f"({_horner_sql(_C, q)} / ({_horner_sql(_D, q)} * {q} + 1.0))"


def ppf_col(p: Column) -> Column:
    """Acklam inverse normal CDF as a Spark Column (NULL outside (0,1))."""
    qc = p - F.lit(0.5)
    rc = qc * qc
    central = (
        _horner_col(_A, rc) * qc
        / (_horner_col(_B, rc) * rc + F.lit(1.0))
    )
    ql = F.sqrt(F.lit(-2.0) * F.log(p))
    qh = F.sqrt(F.lit(-2.0) * F.log(F.lit(1.0) - p))
    return (
        F.when((p > 0) & (p < PLOW), _tail_col(ql))
        .when((p >= PLOW) & (p <= 1.0 - PLOW), central)
        .when((p > 1.0 - PLOW) & (p < 1), -_tail_col(qh))
    )


def ppf_sql(p: str) -> str:
    """The identical expression as ANSI SQL over the expression ``p``."""
    qc = f"({p} - 0.5)"
    rc = f"({qc} * {qc})"
    central = (
        f"({_horner_sql(_A, rc)} * {qc}"
        f" / ({_horner_sql(_B, rc)} * {rc} + 1.0))"
    )
    ql = f"sqrt(-2.0 * ln({p}))"
    qh = f"sqrt(-2.0 * ln(1.0 - {p}))"
    return (
        f"(CASE WHEN {p} > 0 AND {p} < {PLOW} THEN {_tail_sql(ql)} "
        f"WHEN {p} >= {PLOW} AND {p} <= {1.0 - PLOW!r} THEN {central} "
        f"WHEN {p} > {1.0 - PLOW!r} AND {p} < 1 THEN -{_tail_sql(qh)} "
        f"END)"
    )


def ppf_py(p: float) -> float:
    """Reference Python evaluation (same formula) for known-value tests."""
    import math

    def horner(cs, x):
        acc = cs[0]
        for c in cs[1:]:
            acc = acc * x + c
        return acc

    def tail(q):
        return horner(_C, q) / (horner(_D, q) * q + 1.0)

    if not (0.0 < p < 1.0):
        return float("nan")
    if p < PLOW:
        return tail(math.sqrt(-2.0 * math.log(p)))
    if p <= 1.0 - PLOW:
        q = p - 0.5
        r = q * q
        return horner(_A, r) * q / (horner(_B, r) * r + 1.0)
    return -tail(math.sqrt(-2.0 * math.log(1.0 - p)))

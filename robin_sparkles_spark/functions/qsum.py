"""Cross-engine-exact summation of FULL-MANTISSA doubles.

The registry's decimal-sum rule (sum exact DECIMALs, then cast to
double) has a hidden precondition: the double→decimal cast itself must
agree across engines. For values that are exact k-decimal quantities
(prices, 2-decimal event values) it does — the scaled value sits
~1e-9 ulps from an integer, far from any rounding boundary. For
full-mantissa doubles (sqrt, divisions, centered products,
interpolated percentiles) it does NOT: Spark rounds the double's
shortest decimal representation (Java ``BigDecimal.valueOf``) while
DuckDB rounds a scaled double, and the two disagree whenever the
scaled value lands within ~1 ulp of a rounding boundary — measured at
88/200k values for DECIMAL(38,4) at 1e9 magnitude, 25/200k for
DECIMAL(38,10) at 3e2 (see operators/stats.py for the first in-repo
hit).

The fix is to quantize with operations that are EXACT in IEEE-754 and
therefore identical in any engine: multiply by 2^bits (exact —
power-of-two scaling only changes the exponent), ``floor`` (exactly
defined), cast the resulting integer-valued double to DECIMAL(38,0)
(exact below 2^53), sum (exact), convert back (one correctly-rounded
conversion while the sum < 2^53), multiply by 2^-bits (exact).

Choosing ``bits``: quantization error is 2^-bits per term (one-sided,
so Σ biases down by ≤ n·2^-bits); headroom needs
max|v|·2^bits·n < 2^53. Callers pick the trade per column and
document it.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def qsum(col: Column, bits: int) -> Column:
    """Order-independent, cross-engine-exact sum of a double column:
    Σ floor(v·2^bits) accumulated in DECIMAL(38,0), returned as
    double × 2^-bits. SQL twin: ``qsum_sql``."""
    scaled = F.floor(col * F.lit(float(2**bits))).cast("decimal(38,0)")
    return F.sum(scaled).cast("double") * F.lit(float(2**-bits))


def qsum_sql(expr: str, bits: int) -> str:
    """DuckDB twin of ``qsum`` as a SQL fragment (aggregate position)."""
    return (
        f"CAST(SUM(CAST(FLOOR(({expr}) * {float(2**bits)!r}) "
        f"AS DECIMAL(38,0))) AS DOUBLE) * {float(2**-bits)!r}"
    )

"""Engine-independent exact aggregation of floating-point columns.

Problem: ``SUM(double)`` is order-dependent — Spark and the DuckDB oracle
sum partitions in different orders, so results differ in the last bits and
an exact value-hash comparison fails nondeterministically.

Solution: cast to DECIMAL before aggregating. Decimal addition is exact and
associative, so any summation order yields the same value on any engine.
The final cast back to double is a single correctly-rounded conversion on
both engines **provided** the scaled integer fits in 2^53 (so the
int→double step is exact and the one division by 10^scale is the only
rounding). With scale=2 that holds up to |sum| ≈ 9e13.

Choosing the scale: both Spark (BigDecimal.valueOf → HALF_UP) and DuckDB
convert double→decimal via the double's *shortest decimal representation*,
but they use different tie rules at exact midpoints (measured: Spark
HALF_UP, DuckDB HALF_EVEN-ish). So the scale MUST be ≥ the true decimal
precision of the summed expression, making the cast an identity (no
rounding → no tie → engines agree). E.g. a 2-dp price × (1 ± 2-dp rate)
has 4 true decimals → scale 4; × two rates → scale 6. For genuinely
full-precision doubles (vector norms), a midpoint at scale 6 has
probability ~1e-10 per row — accepted.

The reference keeps prices exact end-to-end as BigDecimal
(marketdb-api/.../model/Payload.scala:13 and the sbinary round-trip test
TradeProtocolSpec.scala:20-35); this module is the same exactness contract
applied to distributed aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 18 total digits, scale 2 → 16 integer digits; sums promote precision so
# Spark gives decimal(28,2) / DuckDB decimal(38,2): no overflow in practice.
PRECISION = 18
SCALE = 2


def dsum(col: Column | str, scale: int = SCALE) -> Column:
    """Exact, order-independent sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({PRECISION},{scale})")).cast("double")


def davg(col: Column | str, scale: int = SCALE) -> Column:
    """Order-independent mean: exact decimal sum, then one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def oracle_dsum(expr: str, scale: int = SCALE) -> str:
    """DuckDB SQL equivalent of :func:`dsum` — must stay in lockstep."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({PRECISION},{scale}))) AS DOUBLE)"


def oracle_davg(expr: str, scale: int = SCALE) -> str:
    return f"({oracle_dsum(expr, scale)} / COUNT({expr}))"

"""Risk-score expression pieces (SURVEY.md §2.8 F7-F12).

The reference's daily risk formula (config/flink/sink_risk_score_daily.sql:34-77):

    rs   = overspeed / total          -- overspeed ratio
    rn   = night / total              -- night ratio
    x    = 0.55*rs^1.7 + 0.30*rn^1.3 + 0.15*(rs*rn)
    raw  = 100 / (1 + exp(-12 * (x - 0.1155)))
    score = LEAST(100, GREATEST(0, ROUND(raw)))
    level = NULL-total<10 -> 'Sin evidencia'
            score <= 20   -> 'Seguro'
            score <= 60   -> 'Menos seguro'
            else          -> 'Inseguro'

Everything is built-in arithmetic (POWER/EXP/ROUND/LEAST/GREATEST/CASE)
so the whole pipeline stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Formula constants (sink_risk_score_daily.sql:44-46,52,58)
W_SPEED, W_NIGHT, W_INTERACT = 0.55, 0.30, 0.15
P_SPEED, P_NIGHT = 1.7, 1.3
LOGISTIC_K, LOGISTIC_MID = 12.0, 0.1155
MIN_EVIDENCE = 10
OVERSPEED_KMH = 110.0
NIGHT_START, NIGHT_END = 23, 4


def clamp(col: Column, lo: float, hi: float) -> Column:
    """LEAST(hi, GREATEST(lo, col)) (F11)."""
    return F.least(F.lit(hi), F.greatest(F.lit(lo), col))


def weighted_risk(rs: Column, rn: Column) -> Column:
    """Power-law features + interaction + weighted sum
    (sink_risk_score_daily.sql:44-52)."""
    return (
        F.lit(W_SPEED) * F.pow(rs, F.lit(P_SPEED))
        + F.lit(W_NIGHT) * F.pow(rn, F.lit(P_NIGHT))
        + F.lit(W_INTERACT) * (rs * rn)
    )


def logistic_score(x: Column) -> Column:
    """0-100 logistic squash, rounded then clamped
    (sink_risk_score_daily.sql:58,66)."""
    raw = F.lit(100.0) / (F.lit(1.0) + F.exp(F.lit(-LOGISTIC_K) * (x - F.lit(LOGISTIC_MID))))
    return clamp(F.round(raw, 0), 0.0, 100.0)


def risk_level(score: Column, total: Column) -> Column:
    """3-way banding + low-evidence NULL band
    (sink_risk_score_daily.sql:64-73)."""
    return (
        F.when(total < MIN_EVIDENCE, F.lit("Sin evidencia"))
        .when(score <= 20, F.lit("Seguro"))
        .when(score <= 60, F.lit("Menos seguro"))
        .otherwise(F.lit("Inseguro"))
    )

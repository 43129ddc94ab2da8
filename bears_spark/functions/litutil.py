"""One-py4j-call array literals.

``F.lit`` on a (nested) Python list recurses into ``array(*[lit(x) ...])`` —
one JVM round-trip PER ELEMENT. For the fit-state matrices the ANN paths
bake into plans (an 8x64 centroid matrix + 8x16 ADC table ≈ 650 elements)
that is ~650 py4j calls ≈ 0.6 s of driver wall on EVERY plan build
(measured with cProfile on ann_ivfpq_topk: 692 lit() calls, 0.58 s of its
0.80 s build). Rendering the literal as SQL text and parsing it with ONE
``F.expr`` call hands the whole matrix to the JVM in a single round-trip;
the parsed ``array(...)`` tree is foldable, so Catalyst constant-folds it
to the identical Literal the element-wise path produced.

Exactness: ``repr(float)`` emits the shortest string that round-trips under
correctly-rounded parsing, and Java's ``Double.parseDouble`` is correctly
rounded, so every element reconstructs bit-identically. The ``D`` suffix
pins the SQL literal type to DOUBLE (a bare ``0.1`` would parse as
DECIMAL). Non-finite values (inf/nan) have no SQL literal spelling — those
fall back to the element-wise ``F.lit`` path.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import functions as F


def _render(v) -> str | None:
    """SQL text for a float scalar or (nested) sequence; None if any value
    is non-finite (caller falls back to F.lit)."""
    if isinstance(v, (list, tuple)):
        parts = []
        for x in v:
            r = _render(x)
            if r is None:
                return None
            parts.append(r)
        return "array(" + ",".join(parts) + ")"
    f = float(v)
    if not math.isfinite(f):
        return None
    return repr(f) + "D"


def double_lit(values: Sequence) -> "F.Column":
    """Array<double> literal (any nesting depth) in one py4j call."""
    if not isinstance(values, (list, tuple)):
        values = list(values)
    rendered = _render(list(values))
    if rendered is None or not values:
        return F.lit([_deep_float(x) for x in values])
    return F.expr(rendered)


def _deep_float(v):
    if isinstance(v, (list, tuple)):
        return [_deep_float(x) for x in v]
    return float(v)

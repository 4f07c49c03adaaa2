"""Set-reordering scoring prep — the reference's ``sort_and_pad`` (U1,
base_processor.py:1571-1595) as pure Catalyst array expressions.

Semantics: given per-query pred/true entity lists,
1. dedup both (the reference works on sets),
2. put the intersection FIRST in both lists (aligned positionally, in a
   canonical sort order so position i of pred equals position i of true for
   every common item),
3. truncate both to k (=10, base_processor.py:1580-1584),
4. pad pred with 'NONE' up to len(true) so positional multiclass F1 is
   well-defined.

This converts set overlap into a positional classification problem — the
trick that lets micro/macro F1 (operators.metrics) grade a generative list
task. Everything below is whole-stage-codegen'd; no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PAD = "NONE"


def sort_and_pad(pred: Column, true: Column, k: int = 10) -> tuple[Column, Column]:
    """Returns (pred_out, true_out) column pair."""
    p = F.array_distinct(pred)
    t = F.array_distinct(true)
    common = F.array_sort(F.array_intersect(p, t))
    p_rest = F.array_sort(F.array_except(p, t))
    t_rest = F.array_sort(F.array_except(t, p))
    p_k = F.slice(F.concat(common, p_rest), 1, k)
    t_k = F.slice(F.concat(common, t_rest), 1, k)
    pad_n = F.greatest(F.lit(0), F.size(t_k) - F.size(p_k))
    p_padded = F.concat(p_k, F.array_repeat(F.lit(PAD), pad_n))
    return p_padded, t_k


def py_sort_and_pad(
    pred: list[str], true: list[str], k: int = 10
) -> tuple[list[str], list[str]]:
    """Pure-Python reference twin (property-test oracle)."""
    p, t = list(dict.fromkeys(pred)), list(dict.fromkeys(true))
    common = sorted(set(p) & set(t))
    p_out = (common + sorted(set(p) - set(t)))[:k]
    t_out = (common + sorted(set(t) - set(p)))[:k]
    p_out = p_out + [PAD] * max(0, len(t_out) - len(p_out))
    return p_out, t_out

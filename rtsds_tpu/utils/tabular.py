"""Console table printing (reference: ``tabular_print``, ``utils.py:77-94``).

The reference depends on pandas + optionally PrettyTable (and its fallback
crashes on a missing ``import sys``); ours is dependency-free.
"""

from __future__ import annotations

from typing import Mapping


def _fmt(v) -> str:
    if isinstance(v, float):
        return f"{v:.6g}"
    return str(v)


def tabular_print(log_dict: Mapping[str, object]) -> str:
    """Print a one-row ASCII table of the mapping; returns the rendered text."""
    keys = [str(k) for k in log_dict.keys()]
    vals = [_fmt(v) for v in log_dict.values()]
    widths = [max(len(k), len(v)) for k, v in zip(keys, vals)]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    header = "|" + "|".join(f" {k:<{w}} " for k, w in zip(keys, widths)) + "|"
    row = "|" + "|".join(f" {v:<{w}} " for v, w in zip(vals, widths)) + "|"
    text = "\n".join([sep, header, sep, row, sep])
    print(text)
    return text

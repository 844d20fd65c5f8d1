"""Declarative cross-column EXPRESSION constraints — the
Deequ / Great-Expectations-style "expect <predicate> per row" rule
the fixed single-column RangeCheck cannot express: arbitrary
arithmetic/boolean predicates over SEVERAL columns ("n_chars ==
length(text)", "l_discount <= l_tax", "w * h <= max_pixels"),
declared as data (a pure-tuple AST), compiled ONCE per actor into a
chain of pyarrow.compute kernel closures, and evaluated vectorized
per batch — no eval(), no Python per row, nothing but Arrow kernels
in the hot path.

AST (nested tuples, hashable → frozen-dataclass/config-hash safe):

    ("col", name)          column reference
    ("lit", value)         constant
    ("len", x)             utf8 length        (pc.utf8_length)
    ("bytelen", x)         binary byte length (pc.binary_length)
    ("+", a, b) ("-", a, b) ("*", a, b) ("/", a, b)
    ("==", a, b) ("!=", a, b) ("<", a, b) ("<=", a, b)
    (">", a, b) (">=", a, b)
    ("and", a, b) ("or", a, b) ("not", a)    Kleene three-valued
    ("is_null", a)

Null semantics match SQL: a rule PASSES only where the predicate is
TRUE; rows where it is FALSE **or NULL** are violations (``expr IS
NOT TRUE``), so the DuckDB oracle is literally ``WHERE NOT
COALESCE(expr, FALSE)``.

Scale shape: embarrassingly parallel map — rules compile in actor
``__init__`` (ST4 discipline), each batch pays only the kernel chain;
no shuffle, no driver state.  `ExprCheck` in ``config.py`` routes the
same rules through the Pass-A `ValidatorStage` so the image pipeline
can declare cross-column invariants (e.g. "phash != 0 when decodable")
next to its nullity/range rules.

RAQC analog: ``[R] mask_advanced (rec.)`` generalized — RAQC's
conditional masks compare two arrays with an operator/value pair;
this is the arbitrary-expression closure of that idea.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["compile_expr", "expr_violations"]

_BINOPS = {
    "+": pc.add, "-": pc.subtract, "*": pc.multiply,
    "/": pc.divide,
    "==": pc.equal, "!=": pc.not_equal,
    "<": pc.less, "<=": pc.less_equal,
    ">": pc.greater, ">=": pc.greater_equal,
    "and": pc.and_kleene, "or": pc.or_kleene,
}


def compile_expr(expr):
    """Compile a tuple AST into ``fn(batch: pa.Table) -> pa.Array``.
    Raises ``ValueError`` on malformed nodes at COMPILE time (once per
    actor), never per batch."""
    if not isinstance(expr, (tuple, list)) or not expr:
        raise ValueError(f"expr node must be a non-empty tuple: {expr!r}")
    op, *args = expr
    if op == "col":
        (name,) = args
        return lambda b: b[name]
    if op == "lit":
        (v,) = args
        s = pa.scalar(v)
        return lambda b: s
    if op in ("len", "bytelen"):
        (sub,) = args
        f = compile_expr(sub)
        kern = pc.utf8_length if op == "len" else pc.binary_length
        return lambda b: kern(f(b))
    if op == "is_null":
        (sub,) = args
        f = compile_expr(sub)
        return lambda b: pc.is_null(f(b))
    if op == "not":
        (sub,) = args
        f = compile_expr(sub)
        return lambda b: pc.invert(f(b))
    if op in _BINOPS:
        a, c = args
        fa, fc = compile_expr(a), compile_expr(c)
        kern = _BINOPS[op]
        return lambda b: kern(fa(b), fc(b))
    raise ValueError(f"unknown expr op {op!r}")


def violation_mask(fn, batch: pa.Table) -> np.ndarray:
    """Boolean numpy mask of rows violating a compiled rule:
    ``NOT (expr IS TRUE)`` — FALSE and NULL both violate (SQL
    ``IS NOT TRUE`` semantics)."""
    res = fn(batch)
    if isinstance(res, pa.ChunkedArray):
        res = res.combine_chunks()
    ok = pc.fill_null(res, False)
    return pc.invert(ok).to_numpy(zero_copy_only=False)


def expr_violations(ds, id_cols, rules):
    """Dataset of ``(*id_cols, rule)`` — one row per (row, violated
    rule).  ``rules``: iterable of ``(name, expr_ast)`` pairs (or
    objects with ``.name`` / ``.expr``)."""
    norm = []
    for r in rules:
        if isinstance(r, tuple) and len(r) == 2 and isinstance(r[0], str):
            norm.append((r[0], r[1]))
        else:
            norm.append((r.name, r.expr))
    id_cols = list(id_cols)

    class _Stage:
        def __init__(self):
            # compile once per actor/worker (ST4 discipline)
            self.rules = [(name, compile_expr(ast)) for name, ast in norm]

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            ids = batch.select(id_cols)
            outs = [ids.slice(0, 0).to_pandas().assign(
                rule=pd.Series(dtype=str))]   # typed empty anchor
            for name, fn in self.rules:
                bad = violation_mask(fn, batch)
                if not bad.any():
                    continue
                sub = ids.filter(pa.array(bad)).to_pandas()
                sub["rule"] = name
                outs.append(sub)
            return pd.concat(outs, ignore_index=True)

    return ds.map_batches(_Stage, batch_format="pyarrow",
                          concurrency=(1, 8))

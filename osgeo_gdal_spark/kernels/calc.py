"""Raster-calc infix expression compiler (gdal_calc / VRT pixel funcs).

``gdal_calc.py`` evaluates a numpy infix expression over named input
bands (A, B, ...); VRT derived bands expose the same idea as pixel
functions (``frmts/vrt/vrtderivedrasterband.cpp`` and the builtin set in
``frmts/vrt/pixelfunctions.cpp``). Here the expression string compiles
ONCE (driver-side) through Python's ``ast`` into a whitelisted-node
evaluator, then every tile task applies it to aligned numpy arrays —
no ``eval``, no attribute access, no names beyond the declared bands
and the allowed function table.

Grammar: numbers, band names, + - * / ** % unary-,
comparisons (< <= > >= == !=) producing 0/1 arrays,
``where(cond, a, b)``, and the function table below (numpy ufuncs:
sqrt, abs, exp, log, log10, sin, cos, tan, arctan, floor, ceil,
minimum, maximum, clip, power).
"""

from __future__ import annotations

import ast

import numpy as np

_FUNCS = {
    "sqrt": np.sqrt,
    "abs": np.abs,
    "exp": np.exp,
    "log": np.log,
    "log10": np.log10,
    "sin": np.sin,
    "cos": np.cos,
    "tan": np.tan,
    "arctan": np.arctan,
    "floor": np.floor,
    "ceil": np.ceil,
    "minimum": np.minimum,
    "maximum": np.maximum,
    "clip": np.clip,
    "power": np.power,
    "where": np.where,
}

_BINOPS = {
    ast.Add: np.add,
    ast.Sub: np.subtract,
    ast.Mult: np.multiply,
    ast.Div: np.true_divide,
    ast.Pow: np.power,
    ast.Mod: np.mod,
}

_CMPOPS = {
    ast.Lt: np.less,
    ast.LtE: np.less_equal,
    ast.Gt: np.greater,
    ast.GtE: np.greater_equal,
    ast.Eq: np.equal,
    ast.NotEq: np.not_equal,
}


def compile_expr(expr: str, band_names):
    """Compile an infix expression to ``fn(bands: dict[str, ndarray]) ->
    ndarray``. Unknown names/functions/nodes raise at COMPILE time, so a
    bad expression fails on the driver, not in 10^4 tasks."""
    names = set(band_names)
    tree = ast.parse(expr, mode="eval")

    def build(node):
        if isinstance(node, ast.Expression):
            return build(node.body)
        if isinstance(node, ast.Constant):
            if not isinstance(node.value, (int, float)):
                raise ValueError(f"non-numeric constant {node.value!r}")
            v = float(node.value)
            return lambda b: v
        if isinstance(node, ast.Name):
            if node.id not in names:
                raise ValueError(f"unknown band {node.id!r}")
            key = node.id
            return lambda b: b[key]
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
            sub = build(node.operand)
            return lambda b: np.negative(sub(b))
        if isinstance(node, ast.BinOp) and type(node.op) in _BINOPS:
            op = _BINOPS[type(node.op)]
            lf, rf = build(node.left), build(node.right)
            return lambda b: op(lf(b), rf(b))
        if isinstance(node, ast.Compare):
            if len(node.ops) != 1:
                raise ValueError("chained comparisons unsupported")
            if type(node.ops[0]) not in _CMPOPS:
                raise ValueError(f"comparison {node.ops[0]!r} unsupported")
            op = _CMPOPS[type(node.ops[0])]
            lf = build(node.left)
            rf = build(node.comparators[0])
            return lambda b: op(lf(b), rf(b)).astype(np.float64)
        if isinstance(node, ast.Call):
            if not isinstance(node.func, ast.Name) or node.func.id not in _FUNCS:
                raise ValueError(f"function not allowed: {ast.dump(node.func)}")
            fn = _FUNCS[node.func.id]
            if node.keywords:
                raise ValueError("keyword arguments unsupported")
            args = [build(a) for a in node.args]
            return lambda b: fn(*[a(b) for a in args])
        raise ValueError(f"unsupported syntax: {ast.dump(node)}")

    fn = build(tree)
    # compile-time shape check with scalar zeros
    fn({k: np.zeros(1) for k in names})
    return fn

"""Row-level predicate filter — the aviator EL event-filter analog.

The reference filters events by a user expression over event *content*, not
just the `schema.table` regex: ``filter/CanalEventFilter.java`` (SPI),
``filter/aviater/AviaterELFilter.java:20-44`` (EL expression evaluated
against the CanalEntry). This module is that surface, Ray-Data-first: the
expression is parsed ONCE (Python ``ast`` with a strict whitelist — no
``eval``) and compiled to a closure of vectorized pyarrow/numpy kernels that
produces a keep-mask per decode batch. No per-row Python in the hot path.

Expression grammar (whitelisted ``ast`` nodes only):

  - names: ``op``, ``lsn``, ``schema_name``, ``table_name``, any payload
    column name (resolved from the event's own ``cols`` name list, so it
    works for full AND minimal row images and across RENAME — pre-rename
    events naming the old column simply carry that name in ``cols``)
  - literals: strings, numbers, ``None``; lists/tuples of literals for ``in``
  - operators: ``and`` ``or`` ``not``, ``== != < <= > >=``, ``in`` /
    ``not in``
  - helpers: ``matches(col, r"regex")`` (full match, compiled once),
    ``contains(col, "sub")``, ``startswith(col, "pre")``, ``length(col)``

Null semantics are SQL-ish: a payload name missing from a row's image (a
DELETE carries no after-image; a minimal row image carries only changed
columns) evaluates to null, and any comparison with null is False — the row
is dropped, exactly as the reference's EL filter fails to match an absent
column. ``col == None`` / ``col != None`` test absence explicitly, and ``op``
is always present, so delete-preserving predicates are expressible:
``op == 'DELETE' or lang == 'python'``.

CDC caveat (inherent to event filtering, identical in the reference): a
content predicate filters *events*, not final state — an UPDATE that moves a
row out of the predicate is dropped, leaving the row's last matching version
in the lake (the reference's filtered subscription behaves the same way).
Numeric comparisons safe-cast the string transport to float64; rows whose
value fails the cast compare as null (dropped).
"""

from __future__ import annotations

import ast
import re
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_META_COLUMNS = {"op", "lsn", "schema_name", "table_name"}
_HELPERS = {"matches", "contains", "startswith", "length"}


class _Ctx:
    """Per-batch column materialization cache (each referenced column is
    extracted at most once per batch)."""

    def __init__(self, batch: pa.Table, pk_map: dict[str, str]):
        self.batch = batch
        self.n = batch.num_rows
        self.pk_map = pk_map  # payload pk name -> wire column (pk_repo/pk_path)
        self._cache: dict[str, pa.Array] = {}
        self._image_pos: tuple[np.ndarray, np.ndarray] | None = None

    def column(self, name: str) -> pa.Array:
        got = self._cache.get(name)
        if got is None:
            got = self._materialize(name)
            self._cache[name] = got
        return got

    def _materialize(self, name: str) -> pa.Array:
        b = self.batch
        if name in _META_COLUMNS:
            return b[name].combine_chunks()
        wire = self.pk_map.get(name)
        if wire is not None:
            return b[wire].combine_chunks()
        # payload column: resolve by name against each row's own cols list —
        # one vectorized pass over the flattened name values (no row loop)
        carr = b["cols"].combine_chunks()
        varr = b["vals"].combine_chunks()
        # hit positions are ABSOLUTE into the flattened child (offsets need
        # not start at 0 for sliced/rechunked arrays) -> map hit->row with
        # searchsorted over the offsets instead of assuming offset[0] == 0
        hit = pc.equal(carr.values, pa.scalar(name))
        hit_idx = np.flatnonzero(
            pc.fill_null(hit, False).to_numpy(zero_copy_only=False)
        )
        if not hit_idx.size:
            return pa.nulls(self.n, pa.string())
        coffsets = carr.offsets.to_numpy(zero_copy_only=False)
        voffsets = varr.offsets.to_numpy(zero_copy_only=False)
        rows = np.searchsorted(coffsets, hit_idx, side="right") - 1
        in_range = (rows >= 0) & (rows < self.n)
        hit_idx, rows = hit_idx[in_range], rows[in_range]
        first = np.ones(rows.size, dtype=bool)
        first[1:] = rows[1:] != rows[:-1]  # hit_idx ascending => rows grouped
        sel_rows = rows[first]
        # position within the row's cols == position within its vals
        within = hit_idx[first] - coffsets[sel_rows]
        out_idx = np.zeros(self.n, dtype=np.int64)
        ok = np.zeros(self.n, dtype=bool)
        out_idx[sel_rows] = voffsets[sel_rows] + within
        ok[sel_rows] = True
        taken = varr.values.take(pa.array(out_idx))
        return pc.if_else(pa.array(ok), taken, pa.nulls(self.n, pa.string()))


def _as_float(arr: pa.Array) -> pa.Array:
    if pa.types.is_floating(arr.type) or pa.types.is_integer(arr.type):
        return arr
    return pc.cast(arr, pa.float64(), safe=False)


_CMP = {
    ast.Eq: pc.equal,
    ast.NotEq: pc.not_equal,
    ast.Lt: pc.less,
    ast.LtE: pc.less_equal,
    ast.Gt: pc.greater,
    ast.GtE: pc.greater_equal,
}


def _as_array(arr, n: int) -> pa.Array:
    """Normalize an evaluator result to a plain (combined) arrow array —
    for boolean expressions this keeps nulls intact:
    boolean logic is three-valued (SQL/Kleene): null propagates through
    and/or/not exactly as in SQL, so ``not (x == v)`` and ``x != v`` agree
    on rows where the column is absent (both null -> dropped at the top)."""
    if isinstance(arr, np.ndarray):
        return pa.array(arr)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr


class _Compiler(ast.NodeVisitor):
    """ast -> evaluator(Ctx) -> nullable arrow boolean | pa.Array value."""

    def compile(self, expr: str) -> Callable[[_Ctx], np.ndarray]:
        tree = ast.parse(expr, mode="eval")
        fn = self._expr(tree.body)

        def run(ctx: _Ctx) -> np.ndarray:
            # the single null->False coercion happens HERE, after the full
            # three-valued evaluation (null = unknown = row dropped)
            return pc.fill_null(_as_array(fn(ctx), ctx.n), False).to_numpy(
                zero_copy_only=False
            )

        return run

    # ---- boolean level (Kleene) -----------------------------------------
    def _expr(self, node: ast.AST) -> Callable[[_Ctx], pa.Array]:
        if isinstance(node, ast.BoolOp):
            parts = [self._expr(v) for v in node.values]
            kernel = pc.and_kleene if isinstance(node.op, ast.And) else pc.or_kleene

            def f_bool(ctx):
                m = _as_array(parts[0](ctx), ctx.n)
                for p in parts[1:]:
                    m = kernel(m, _as_array(p(ctx), ctx.n))
                return m

            return f_bool
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.Not):
            inner = self._expr(node.operand)
            return lambda ctx: pc.invert(_as_array(inner(ctx), ctx.n))  # null stays null
        if isinstance(node, ast.Compare):
            return self._compare(node)
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Name)
            and node.func.id in ("matches", "contains", "startswith")
        ):
            fn = self._call(node)  # boolean-valued helpers usable bare
            return lambda ctx: _as_array(fn(ctx), ctx.n)
        raise ValueError(
            f"unsupported expression node {type(node).__name__!r} "
            "(allowed: and/or/not, comparisons, in, boolean helpers)"
        )

    # ---- comparisons -----------------------------------------------------
    def _compare(self, node: ast.Compare) -> Callable[[_Ctx], np.ndarray]:
        if len(node.ops) != 1:
            raise ValueError("chained comparisons are not supported")
        op, right = node.ops[0], node.comparators[0]
        left_fn = self._value(node.left)

        if isinstance(op, (ast.In, ast.NotIn)):
            items = self._literal_list(right)
            numeric_set = all(
                isinstance(i, (int, float)) and not isinstance(i, bool)
                for i in items
            )
            if not numeric_set and any(
                isinstance(i, (int, float)) and not isinstance(i, bool)
                for i in items
            ):
                raise ValueError("`in` lists must be all-string or all-numeric")
            negate = isinstance(op, ast.NotIn)
            def f_in(ctx):
                arr = left_fn(ctx)
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                if numeric_set:
                    # numeric membership coerces the string transport like
                    # the comparison path (invalid values -> null -> dropped)
                    try:
                        arr = _as_float(arr)
                    except pa.ArrowInvalid:
                        arr = _safe_float(arr)
                    vs = pa.array([float(i) for i in items], type=pa.float64())
                else:
                    vs = pa.array(items, type=pa.string())
                    if not pa.types.is_string(arr.type):
                        arr = pc.cast(arr, pa.string())
                m = pc.is_in(arr, value_set=vs)
                # SQL semantics: null IN (...) and null NOT IN (...) are both
                # null (is_in itself returns non-null False for nulls)
                m = pc.if_else(pc.is_valid(arr), m, pa.nulls(ctx.n, pa.bool_()))
                return pc.invert(m) if negate else m
            return f_in

        rv = self._literal(right)
        if rv is None and type(op) in (ast.Eq, ast.NotEq):
            want_null = isinstance(op, ast.Eq)
            def f_null(ctx):
                # IS [NOT] NULL is two-valued even in SQL — never null
                valid = pc.is_valid(_as_array(left_fn(ctx), ctx.n))
                return pc.invert(valid) if want_null else valid
            return f_null
        kernel = _CMP.get(type(op))
        if kernel is None:
            raise ValueError(f"unsupported comparison {type(op).__name__!r}")
        numeric = isinstance(rv, (int, float)) and not isinstance(rv, bool)
        def f_cmp(ctx):
            arr = left_fn(ctx)
            if numeric:
                try:
                    arr = _as_float(arr)
                except pa.ArrowInvalid:
                    # mixed batch: per-value safe cast, invalid -> null
                    arr = _safe_float(arr)
            return kernel(arr, pa.scalar(rv))
        return f_cmp

    # ---- value level -----------------------------------------------------
    def _value(self, node: ast.AST) -> Callable[[_Ctx], pa.Array]:
        if isinstance(node, ast.Name):
            name = node.id
            return lambda ctx: ctx.column(name)
        if isinstance(node, ast.Call):
            return self._call(node)
        raise ValueError(
            f"unsupported value node {type(node).__name__!r} "
            "(a comparison's left side must be a column or helper call)"
        )

    def _call(self, node: ast.Call) -> Callable[[_Ctx], pa.Array]:
        if not isinstance(node.func, ast.Name) or node.func.id not in _HELPERS:
            raise ValueError(f"unknown function (allowed: {sorted(_HELPERS)})")
        fname = node.func.id
        if node.keywords:
            raise ValueError(f"{fname}() takes positional arguments only")
        want = 1 if fname == "length" else 2
        if len(node.args) != want:
            raise ValueError(f"{fname}() takes exactly {want} argument(s)")
        if fname == "length":
            col = self._value(node.args[0])

            def f_len(ctx):
                arr = _as_array(col(ctx), ctx.n)
                if not pa.types.is_string(arr.type):
                    # length of the value's string form (lsn etc. are usable)
                    arr = pc.cast(arr, pa.string())
                return pc.utf8_length(arr)

            return f_len
        col_fn = self._value(node.args[0])
        arg = self._literal(node.args[1])
        if not isinstance(arg, str):
            raise ValueError(f"{fname}() needs a string literal argument")
        if fname == "matches":
            try:
                pattern = re.compile(arg)  # validate eagerly
            except re.error as e:
                # the module contract: bad expressions fail with ValueError
                raise ValueError(f"invalid regex in matches(): {e}") from e
            return lambda ctx: pc.match_substring_regex(
                col_fn(ctx), f"^(?:{pattern.pattern})$"
            )
        if fname == "contains":
            return lambda ctx: pc.match_substring(col_fn(ctx), arg)
        return lambda ctx: pc.starts_with(col_fn(ctx), arg)

    # ---- literals --------------------------------------------------------
    def _literal(self, node: ast.AST):
        if isinstance(node, ast.Constant) and (
            node.value is None or isinstance(node.value, (str, int, float))
        ):
            return node.value
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
            v = self._literal(node.operand)
            if isinstance(v, (int, float)):
                return -v
        raise ValueError("only string/number/None literals are supported")

    def _literal_list(self, node: ast.AST) -> list:
        if not isinstance(node, (ast.List, ast.Tuple)):
            raise ValueError("`in` needs a list/tuple of literals")
        items = [self._literal(e) for e in node.elts]
        if any(i is None for i in items):
            raise ValueError("None is not allowed inside `in` lists")
        return items


def _safe_float(arr: pa.Array) -> pa.Array:
    """Element-wise safe cast string->float64 (invalid -> null) — pyarrow's
    cast has no per-value error_ok, so pre-mask with a numeric regex."""
    ok = pc.match_substring_regex(arr, r"^\s*-?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?\s*$")
    masked = pc.if_else(pc.fill_null(ok, False), arr, pa.nulls(len(arr), pa.string()))
    return pc.cast(masked, pa.float64())


def compile_predicate(
    expr: str, pk_columns: tuple[str, str] = ("repo", "path")
) -> Callable[[pa.Table], np.ndarray]:
    """Compile ``expr`` to ``fn(raw_log_batch) -> keep_mask`` (numpy bool).

    The mask covers DML rows only by contract: the decode stage exempts
    DDL/TRUNCATE/heartbeat rows before applying it (the reference applies the
    EL filter to ROWDATA entries, not to meta entries)."""
    evaluator = _Compiler().compile(expr)
    pk_map = {pk_columns[0]: "pk_repo", pk_columns[1]: "pk_path"}

    def predicate(batch: pa.Table) -> np.ndarray:
        if batch.num_rows == 0:
            return np.zeros(0, dtype=bool)
        return evaluator(_Ctx(batch, pk_map))

    return predicate

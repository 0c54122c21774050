"""The scalar/array processor library (reference:
/root/reference/dabstract/dataprocessor/processors/processors.py:16-611).

Every processor implements::

    expr(col, info) -> (Column, info_updates)     # plan-compile time
    inv_expr(col, info) -> Column                 # optional inverse
    fit(df, col, info) -> None                    # optional estimator

``info`` is the static metadata dict (``fs``, ``time_step``, ``nfft``,
``dtype`` — the reference's per-example info side-channel, resolved at
chain-compile time; SURVEY §7 "info propagation"). ``dtype`` is the Spark
simpleString of the input column so elementwise processors dispatch
between scalar and array form.

Numerics note: the container has numpy but not scipy/librosa, so window
functions, FIR design (windowed sinc) and FFT resampling are implemented
from their public textbook definitions in numpy; divergences from scipy
(e.g. firwin's scaling convention) are documented inline.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf


def _is_array(info: dict) -> bool:
    return str(info.get("dtype", "")).startswith("array")


def _elementwise(col: Column, f, info: dict) -> Column:
    """Apply a scalar Column function over a scalar or (possibly nested)
    array column, dispatching on the compile-time dtype."""
    dt = str(info.get("dtype", ""))
    if dt.startswith("array<array"):
        return F.transform(col, lambda row: F.transform(row, f))
    if dt.startswith("array"):
        return F.transform(col, f)
    return f(col)


# --------------------------------------------------------------------- #
# One-parse SQL twins (optimization r12, guide §1.2 driver-side work).
#
# ``expr()`` builds its Column tree one py4j round trip per operation —
# for the unrolled-literal processors (Filterbank, FIRFilter) that is
# hundreds to >1500 round trips per plan build on a host whose IPC
# round trip costs 0.2-6 ms. ``sql()`` composes the IDENTICAL expression
# tree as ONE SQL string that the chain parses with a single F.expr.
# Identical means: same operator nesting and associativity (SQL + and *
# are left-associative like Column operator chaining, parentheses add
# no AST node), literals via core.sql_double (repr round-trips exactly,
# and Spark parses D-suffixed literals with Double.parseDouble — bit-
# identical to F.lit), lambda-variable names irrelevant to results.
# Every sql() body mirrors its expr() line by line; tests pin
# equality of results on the fixture tables (test_processing.py).
#
# A processor without a SQL form (Arrow-UDF stages, opaque callables)
# returns None and the chain falls back to Column composition from that
# stage on — correctness never depends on this path.
# --------------------------------------------------------------------- #
def _elementwise_sql(col_sql: str, f, info: dict) -> str:
    """SQL twin of _elementwise: f maps an operand SQL string to the
    scalar expression SQL."""
    dt = str(info.get("dtype", ""))
    if dt.startswith("array<array"):
        return f"transform({col_sql}, __pr -> transform(__pr, __px -> {f('__px')}))"
    if dt.startswith("array"):
        return f"transform({col_sql}, __px -> {f('__px')})"
    return f(f"({col_sql})")


class Processor:
    """Base class (reference processing_chain.py:14-24). Subclasses are
    Column-expression factories with optional inverse and fit."""

    #: JSON-able constructor parameters (for chain save/load)
    def __init__(self, **params):
        self.params = params

    def expr(self, col: Column, info: dict) -> tuple[Column, dict]:
        return col, {}

    def sql(self, col_sql: str, info: dict) -> tuple[str, dict] | None:
        """Optional one-parse SQL twin of ``expr`` (see module comment
        above ``_elementwise_sql``). None = no SQL form; the chain then
        composes this stage (and the rest) Column-wise."""
        return None

    def inv_expr(self, col: Column, info: dict) -> Column:
        raise NotImplementedError(
            f"{type(self).__name__} has no inverse (reference chains assert the same)"
        )

    # fitted state (JSON-able) — None for stateless processors
    fitted: dict | None = None

    def to_spec(self) -> dict:
        spec = {"name": type(self).__name__, "parameters": self.params}
        if self.fitted is not None:
            spec["fitted"] = self.fitted
        return spec


class ExternalProcessor(Processor):
    """Wrap a bare ``Column -> Column`` callable
    (reference processing_chain.py:27-35)."""

    def __init__(self, fct):
        super().__init__()
        self.fct = fct

    def expr(self, col, info):
        return self.fct(col), {}

    def to_spec(self):
        raise ValueError("ExternalProcessor (opaque callable) is not serializable")


class Dummy(Processor):
    """Identity (reference processors.py:613)."""

    def sql(self, col_sql, info):
        return col_sql, {}


class Scaler(Processor):
    """Static amplitude scaling (reference processors.py:168-195):
    ``uint16`` → x/2^16, ``int16`` → x/(2^15-1), ``wav_2_01`` → (x+1)/2.
    Invertible. Pure elementwise expression."""

    def __init__(self, type: str):
        super().__init__(type=type)
        if type not in ("uint16", "int16", "wav_2_01"):
            raise ValueError(f"unknown Scaler type '{type}'")
        self.type = type

    def _fwd(self, x):
        if self.type == "uint16":
            return x / F.lit(float(2**16))
        if self.type == "int16":
            return x / F.lit(float(2**15 - 1))
        return (x + F.lit(1.0)) / F.lit(2.0)

    def _bwd(self, x):
        if self.type == "uint16":
            return x * F.lit(float(2**16))
        if self.type == "int16":
            return x * F.lit(float(2**15 - 1))
        return x * F.lit(2.0) - F.lit(1.0)

    def expr(self, col, info):
        return _elementwise(col, self._fwd, info), {}

    def sql(self, col_sql, info):
        from dabstract_spark.core import sql_double

        if self.type == "uint16":
            f = lambda x: f"{x} / {sql_double(float(2**16))}"  # noqa: E731
        elif self.type == "int16":
            f = lambda x: f"{x} / {sql_double(float(2**15 - 1))}"  # noqa: E731
        else:
            f = lambda x: f"({x} + 1.0D) / 2.0D"  # noqa: E731
        return _elementwise_sql(col_sql, f, info), {}

    def inv_expr(self, col, info):
        return _elementwise(col, self._bwd, info)


class Logarithm(Processor):
    """``base10`` → 20*log10(x), ``natural`` → ln(x) (reference
    processors.py:464-480). The inverse here is the TRUE inverse
    (10^(x/20) / e^x); the reference's ``(10**x)/20`` (processors.py:475)
    is a documented upstream bug we do not reproduce."""

    def __init__(self, type: str = "base10"):
        super().__init__(type=type)
        if type not in ("base10", "natural"):
            raise ValueError(f"unknown Logarithm type '{type}'")
        self.type = type

    def expr(self, col, info):
        # NB: 1-param lambdas only — HOF transform() counts the callable's
        # parameters, and F.log's optional base arg would trigger
        # (element, index) semantics
        f = (
            (lambda x: F.lit(20.0) * F.log10(x))
            if self.type == "base10"
            else (lambda x: F.log(x))
        )
        return _elementwise(col, f, info), {}

    def sql(self, col_sql, info):
        f = (
            (lambda x: f"20.0D * log10({x})")
            if self.type == "base10"
            else (lambda x: f"ln({x})")
        )
        return _elementwise_sql(col_sql, f, info), {}

    def inv_expr(self, col, info):
        f = (
            (lambda x: F.pow(F.lit(10.0), x / F.lit(20.0)))
            if self.type == "base10"
            else (lambda x: F.exp(x))
        )
        return _elementwise(col, f, info)


def window_values(window_func: str, n: int, periodic: bool = True) -> np.ndarray:
    """Window samples from the public cosine-sum definitions (scipy-free).
    ``periodic=True`` matches scipy.signal.get_window(..., fftbins=True),
    the reference Windowing default (symmetry=True → fftbins=True)."""
    if window_func in (None, "none", "None", "rect", "boxcar"):
        return np.ones(n)
    m = float(n if periodic else n - 1) or 1.0
    i = np.arange(n)
    if window_func == "hamming":
        return 0.54 - 0.46 * np.cos(2 * np.pi * i / m)
    if window_func in ("hann", "hanning"):
        return 0.5 - 0.5 * np.cos(2 * np.pi * i / m)
    if window_func == "blackman":
        return (
            0.42 - 0.5 * np.cos(2 * np.pi * i / m) + 0.08 * np.cos(4 * np.pi * i / m)
        )
    raise ValueError(f"unknown window '{window_func}'")


def _window_expr(window_func: str, periodic: bool):
    """(x, i, n) -> windowed x as a Column expression with DYNAMIC length
    (handles ragged arrays — no literal window table needed)."""
    if window_func in (None, "none", "None", "rect", "boxcar"):
        return lambda x, i, n: x
    two_pi = F.lit(2.0 * math.pi)

    def w(i, n):
        m = n.cast("double") if periodic else (n - 1).cast("double")
        phase = two_pi * i.cast("double") / m
        if window_func == "hamming":
            return F.lit(0.54) - F.lit(0.46) * F.cos(phase)
        if window_func in ("hann", "hanning"):
            return F.lit(0.5) - F.lit(0.5) * F.cos(phase)
        if window_func == "blackman":
            return (
                F.lit(0.42)
                - F.lit(0.5) * F.cos(phase)
                + F.lit(0.08) * F.cos(F.lit(2.0) * phase)
            )
        raise ValueError(f"unknown window '{window_func}'")

    return lambda x, i, n: x * w(i, n)


def _window_sql(window_func: str, periodic: bool):
    """SQL twin of _window_expr: (x_sql, i_sql, n_sql) -> windowed x.
    Identical tree: same literals (two_pi = repr(2*math.pi)), same
    Multiply/Subtract/Divide nesting, same CAST placement."""
    if window_func in (None, "none", "None", "rect", "boxcar"):
        return lambda x, i, n: x
    from dabstract_spark.core import sql_double

    two_pi = sql_double(2.0 * math.pi)

    def w(i, n):
        m = f"CAST({n} AS DOUBLE)" if periodic else f"CAST(({n}) - 1 AS DOUBLE)"
        phase = f"{two_pi} * CAST({i} AS DOUBLE) / {m}"
        if window_func == "hamming":
            return f"(0.54D - 0.46D * cos({phase}))"
        if window_func in ("hann", "hanning"):
            return f"(0.5D - 0.5D * cos({phase}))"
        if window_func == "blackman":
            return f"(0.42D - 0.5D * cos({phase}) + 0.08D * cos(2.0D * ({phase})))"
        raise ValueError(f"unknown window '{window_func}'")

    return lambda x, i, n: f"{x} * {w(i, n)}"


def _bind_operand_sql(col_sql: str, body_fn) -> str:
    """Multi-reference guard for SQL twins (r13, per ADVICE.md): a stage
    whose SQL references its operand k times would copy the accumulated
    prefix k times — after an unrolled-literal stage (Filterbank ~KBs)
    the one-parse string grows multiplicatively per stage, unlike the
    Column path where every reference shares one Java expression object.
    Non-trivial operands are therefore bound ONCE as a lambda variable
    (the core.bind_once element_at/transform/array spelling — value-
    identical, evaluated once per row). Trivial operands (a quoted name
    or short expression) keep splicing directly, so every currently
    declared chain's plan stays byte-identical."""
    if len(col_sql) <= 64:
        return body_fn(f"({col_sql})")
    return f"element_at(transform(array({col_sql}), __pc -> {body_fn('__pc')}), 1)"


class Windowing(Processor):
    """Multiply an array by a window function (reference
    processors.py:264-293). Native: transform with (element, index)
    lambda and the cosine-sum window formula — ragged-safe, codegen'd."""

    def __init__(self, window_func: str = "hamming", symmetry: bool = True, axis: int = -1):
        super().__init__(window_func=window_func, symmetry=symmetry, axis=axis)
        self.window_func = window_func
        # reference passes fftbins=symmetry to scipy.get_window: True → periodic
        self.periodic = bool(symmetry)

    def expr(self, col, info):
        wf = _window_expr(self.window_func, self.periodic)
        n = F.size(col)
        return F.transform(col, lambda x, i: wf(x, i, n)), {}

    def sql(self, col_sql, info):
        wf = _window_sql(self.window_func, self.periodic)
        return (
            _bind_operand_sql(
                col_sql,
                lambda c: f"transform({c}, (__px, __pi) -> "
                f"{wf('__px', '__pi', f'size({c})')})",
            ),
            {},
        )


class ExpandDims(Processor):
    """np.expand_dims for 1-D arrays (reference processors.py:603-611):
    axis=0 → [arr] (1×n), axis=-1/1 → column vectors (n×1)."""

    def __init__(self, axis: int = -1):
        super().__init__(axis=axis)
        self.axis = axis

    def expr(self, col, info):
        if self.axis == 0:
            return F.array(col), {}
        return F.transform(col, lambda x: F.array(x)), {}

    def sql(self, col_sql, info):
        if self.axis == 0:
            return f"array({col_sql})", {}
        return f"transform({col_sql}, __px -> array(__px))", {}


def _arr_mean(c: Column) -> Column:
    return F.aggregate(
        c, F.lit(0.0), lambda acc, x: acc + x.cast("double")
    ) / F.size(c).cast("double")


def _arr_moment(c: Column, mu: Column, p: int) -> Column:
    return F.aggregate(
        c, F.lit(0.0), lambda acc, x: acc + F.pow(x.cast("double") - mu, float(p))
    ) / F.size(c).cast("double")


def _arr_mean_sql(c: str) -> str:
    return (
        f"(aggregate({c}, 0.0D, (__pa, __px) -> __pa + CAST(__px AS DOUBLE))"
        f" / CAST(size({c}) AS DOUBLE))"
    )


def _arr_moment_sql(c: str, mu: str, p: int) -> str:
    from dabstract_spark.core import sql_double

    return (
        f"(aggregate({c}, 0.0D, (__pa, __px) -> __pa +"
        f" pow(CAST(__px AS DOUBLE) - ({mu}), {sql_double(float(p))}))"
        f" / CAST(size({c}) AS DOUBLE))"
    )


class Aggregation(Processor):
    """Per-row array statistics (reference processors.py:483-520):
    mean / std (population, np default) / kurtosis (Fisher, biased —
    scipy default). 1-D arrays → array of one scalar per method; 2-D
    arrays with axis=0 → per-column stats (mean/std), combined per
    ``combine`` ('concat' flattens). Pure HOF expressions."""

    _METHODS = ("mean", "std", "kurtosis")

    def __init__(self, methods=("mean", "std"), axis: int = 0, combine: str | None = None):
        methods = list(methods)
        super().__init__(methods=methods, axis=axis, combine=combine)
        bad = [m for m in methods if m not in self._METHODS]
        if bad:
            raise ValueError(f"unsupported Aggregation methods {bad}")
        self.methods = methods
        self.axis = axis
        self.combine = combine

    def _scalar_stats(self, c: Column, mu: Column) -> list[Column]:
        """Stats given an already-BOUND mean (a lambda variable, not the
        mean aggregate expression — capturing the aggregate inside the
        moment lambdas would re-evaluate it per array element, O(n²))."""
        out = []
        for m in self.methods:
            if m == "mean":
                out.append(mu)
            elif m == "std":
                out.append(F.sqrt(_arr_moment(c, mu, 2)))
            else:
                # kurtosis: m4/m2^2 - 3; NULL for a constant array
                # (m2 = 0 — undefined, and ANSI would raise
                # DIVIDE_BY_ZERO; scipy emits nan there). Oracles carry
                # the matching CASE WHEN m2 = 0 THEN NULL leg.
                m2 = _arr_moment(c, mu, 2)
                out.append(
                    F.when(m2 == F.lit(0.0), F.lit(None).cast("double")).otherwise(
                        _arr_moment(c, mu, 4) / F.pow(m2, 2.0) - 3.0
                    )
                )
        return out

    def _scalar_stats_sql(self, c: str, mu: str) -> list[str]:
        """SQL twin of _scalar_stats (same bound-mean discipline)."""
        out = []
        for m in self.methods:
            if m == "mean":
                out.append(mu)
            elif m == "std":
                out.append(f"sqrt({_arr_moment_sql(c, mu, 2)})")
            else:
                m2 = _arr_moment_sql(c, mu, 2)
                m4 = _arr_moment_sql(c, mu, 4)
                out.append(
                    f"(CASE WHEN {m2} = 0.0D THEN CAST(NULL AS DOUBLE)"
                    f" ELSE {m4} / pow({m2}, 2.0D) - 3.0D END)"
                )
        return out

    def sql(self, col_sql, info):
        dt = str(info.get("dtype", "array<double>"))
        upd = {"time_step": 0} if self.axis == 0 else {}
        if not dt.startswith("array<array"):
            return (
                _bind_operand_sql(
                    col_sql,
                    lambda c: f"element_at(transform(array({_arr_mean_sql(c)}),"
                    f" __pm -> array("
                    + ", ".join(self._scalar_stats_sql(c, "__pm"))
                    + ")), 1)",
                ),
                upd,
            )
        if self.axis in (1, -1):
            stats = ", ".join(self._scalar_stats_sql("__pin", "__pm"))
            per_row = _bind_operand_sql(
                col_sql,
                lambda c: f"transform({c}, __pin ->"
                f" element_at(transform(array({_arr_mean_sql('__pin')}),"
                f" __pm -> array({stats})), 1))",
            )
            if self.combine == "concat":
                return f"flatten({per_row})", upd
            return per_row, upd

        # 2-D, axis=0: per-column stats, same shapes as the Column form
        def _axis0(c):
            n_rows = f"CAST(size({c}) AS DOUBLE)"
            width = f"size(element_at({c}, 1))"

            def col_mean(j):
                return (
                    f"(aggregate({c}, 0.0D, (__pa, __pr) -> __pa +"
                    f" CAST(element_at(__pr, {j}) AS DOUBLE)) / {n_rows})"
                )

            def col_moment(j, mu, p):
                from dabstract_spark.core import sql_double

                return (
                    f"(aggregate({c}, 0.0D, (__pa, __pr) -> __pa +"
                    f" pow(CAST(element_at(__pr, {j}) AS DOUBLE) - ({mu}),"
                    f" {sql_double(float(p))})) / {n_rows})"
                )

            def col_std(j):
                return (
                    f"element_at(transform(array({col_mean(j)}),"
                    f" __pm -> sqrt({col_moment(j, '__pm', 2)})), 1)"
                )

            def col_kurt(j):
                return (
                    f"element_at(transform(array({col_mean(j)}), __pm ->"
                    f" {col_moment(j, '__pm', 4)} / pow({col_moment(j, '__pm', 2)}, 2.0D)"
                    f" - 3.0D), 1)"
                )

            per_method = []
            for m in self.methods:
                fn = {"mean": col_mean, "std": col_std, "kurtosis": col_kurt}[m]
                per_method.append(
                    f"transform(sequence(1, {width}), __pj -> {fn('__pj')})"
                )
            if self.combine == "concat":
                return f"flatten(array({', '.join(per_method)}))"
            return f"array({', '.join(per_method)})"

        return _bind_operand_sql(col_sql, _axis0), upd

    def expr(self, col, info):
        from dabstract_spark.core import bind_once

        dt = str(info.get("dtype", "array<double>"))
        upd = {"time_step": 0} if self.axis == 0 else {}
        if not dt.startswith("array<array"):
            return (
                bind_once(
                    _arr_mean(col), lambda mu: F.array(*self._scalar_stats(col, mu))
                ),
                upd,
            )
        if self.axis in (1, -1):
            # 2-D, axis=-1: stats per ROW (over each inner array), like
            # np.mean(data, axis=-1) — one stats array per frame
            per_row = F.transform(
                col,
                lambda inner: bind_once(
                    _arr_mean(inner),
                    lambda mu: F.array(*self._scalar_stats(inner, mu)),
                ),
            )
            if self.combine == "concat":
                return F.flatten(per_row), upd
            return per_row, upd
        # 2-D, axis=0: stats per column j across the rows
        n_rows = F.size(col).cast("double")
        width = F.size(F.element_at(col, 1))
        js = F.sequence(F.lit(1), width)

        def col_mean(j):
            return (
                F.aggregate(col, F.lit(0.0), lambda acc, r: acc + F.element_at(r, j).cast("double"))
                / n_rows
            )

        def col_moment(j, mu, p):
            return (
                F.aggregate(
                    col,
                    F.lit(0.0),
                    lambda acc, r: acc + F.pow(F.element_at(r, j).cast("double") - mu, float(p)),
                )
                / n_rows
            )

        def col_std(j):
            return bind_once(col_mean(j), lambda mu: F.sqrt(col_moment(j, mu, 2)))

        def col_kurt(j):
            return bind_once(
                col_mean(j),
                lambda mu: col_moment(j, mu, 4) / F.pow(col_moment(j, mu, 2), 2.0) - 3.0,
            )

        per_method = []
        for m in self.methods:
            fn = {"mean": col_mean, "std": col_std, "kurtosis": col_kurt}[m]
            per_method.append(F.transform(js, fn))
        if self.combine == "concat":
            return F.flatten(F.array(*per_method)), upd
        return F.array(*per_method), upd


class Normalizer(Processor):
    """Fitted minmax/standard normalization (reference
    processors.py:93-165). ``fit`` is a distributed two-pass aggregate
    whose result is folded into the transform as literals — the
    reference's sklearn-scaler state → broadcast constants.

    1-D arrays fit GLOBAL statistics (the reference reshapes 1-D data to
    a single sklearn feature); 2-D arrays fit per-column statistics."""

    def __init__(self, type: str, feature_range=(0.0, 1.0)):
        super().__init__(type=type, feature_range=list(feature_range))
        if type not in ("minmax", "standard"):
            raise ValueError(f"unknown Normalizer type '{type}'")
        self.type = type
        self.feature_range = tuple(feature_range)
        self.fitted = None

    # -- fitting ------------------------------------------------------- #
    def fit(self, df: DataFrame, col: Column, info: dict) -> None:
        dt = str(info.get("dtype", ""))
        if dt.startswith("array<array"):
            self._fit_2d(df, col)
        elif dt.startswith("array"):
            self._fit_1d(df, col)
        else:
            self._fit_scalar(df, col)

    def _fit_scalar(self, df, col):
        x = col.cast("double")
        if self.type == "minmax":
            row = df.select(F.min(x), F.max(x)).first()
            self.fitted = {"min": [row[0]], "max": [row[1]]}
        else:
            row = df.select(F.avg(x), F.stddev_pop(x)).first()
            self.fitted = {"mean": [row[0]], "std": [row[1] or 1.0]}

    def _fit_1d(self, df, col):
        if self.type == "minmax":
            row = df.select(
                F.min(F.array_min(col)), F.max(F.array_max(col))
            ).first()
            self.fitted = {"min": [float(row[0])], "max": [float(row[1])]}
        else:
            s = df.select(
                F.sum(F.aggregate(col, F.lit(0.0), lambda a, x: a + x.cast("double"))).alias("s1"),
                F.sum(
                    F.aggregate(col, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double"))
                ).alias("s2"),
                F.sum(F.size(col).cast("bigint")).alias("n"),
            ).first()
            mu = s["s1"] / s["n"]
            var = max(s["s2"] / s["n"] - mu * mu, 0.0)
            self.fitted = {"mean": [mu], "std": [math.sqrt(var) or 1.0]}

    def _fit_2d(self, df, col):
        # per-column stats across every row of every example: explode the
        # outer axis, then aggregate column-vector sums elementwise
        rows = df.select(F.explode(col).alias("__r"))
        if self.type == "minmax":
            agg = rows.select(
                F.min(F.array_min("__r")).alias("lo"), F.max(F.array_max("__r")).alias("hi"),
                F.first(F.size("__r")).alias("w"),
            ).first()
            w = agg["w"]
            mins = rows.select(
                *[F.min(F.element_at("__r", j + 1)).alias(f"m{j}") for j in range(w)]
            ).first()
            maxs = rows.select(
                *[F.max(F.element_at("__r", j + 1)).alias(f"m{j}") for j in range(w)]
            ).first()
            self.fitted = {"min": [float(v) for v in mins], "max": [float(v) for v in maxs]}
        else:
            w = rows.select(F.first(F.size("__r"))).first()[0]
            stats = rows.select(
                *[F.avg(F.element_at("__r", j + 1)).alias(f"a{j}") for j in range(w)],
                *[F.stddev_pop(F.element_at("__r", j + 1)).alias(f"s{j}") for j in range(w)],
            ).first()
            self.fitted = {
                "mean": [float(stats[j]) for j in range(w)],
                "std": [float(stats[w + j]) or 1.0 for j in range(w)],
            }

    # -- transform ----------------------------------------------------- #
    def _require_fit(self):
        if self.fitted is None:
            raise RuntimeError("Normalizer.fit must run before process (reference parity)")

    def _fwd1(self, x, j=0):
        lo, hi = self.feature_range
        if self.type == "minmax":
            mn, mx = self.fitted["min"][j], self.fitted["max"][j]
            scale = (mx - mn) or 1.0
            return (x.cast("double") - F.lit(mn)) / F.lit(scale) * F.lit(hi - lo) + F.lit(lo)
        mu, sd = self.fitted["mean"][j], self.fitted["std"][j]
        return (x.cast("double") - F.lit(mu)) / F.lit(sd)

    def _bwd1(self, x, j=0):
        lo, hi = self.feature_range
        if self.type == "minmax":
            mn, mx = self.fitted["min"][j], self.fitted["max"][j]
            scale = (mx - mn) or 1.0
            return (x.cast("double") - F.lit(lo)) / F.lit(hi - lo) * F.lit(scale) + F.lit(mn)
        mu, sd = self.fitted["mean"][j], self.fitted["std"][j]
        return x.cast("double") * F.lit(sd) + F.lit(mu)

    def _apply(self, col, info, f1):
        self._require_fit()
        dt = str(info.get("dtype", ""))
        per_col = len(self.fitted.get("min", self.fitted.get("mean", [0]))) > 1
        if dt.startswith("array<array"):
            if per_col:
                return F.transform(
                    col,
                    lambda row: F.transform(row, lambda x, i: _pick(f1, x, i, self.fitted)),
                )
            return F.transform(col, lambda row: F.transform(row, lambda x: f1(x, 0)))
        if dt.startswith("array"):
            return F.transform(col, lambda x: f1(x, 0))
        return f1(col, 0)

    def expr(self, col, info):
        return self._apply(col, info, self._fwd1), {}

    def inv_expr(self, col, info):
        return self._apply(col, info, self._bwd1)


def _pick(f1, x, i, fitted):
    """Dispatch per-column fitted params on a runtime index: build a CASE
    over the (small) fitted vector."""
    n = len(next(iter(fitted.values())))
    out = f1(x, 0)
    for j in range(1, n):
        out = F.when(i == j, f1(x, j)).otherwise(out)
    return out


class Framing(Processor):
    """Overlapping frames in seconds (reference processors.py:198-261):
    frame_length = round(windowsize*fs), step = round(stepsize*fs), then
    the window function per frame. Native explode-free version — output
    is array<array<double>> (one row stays one row; use
    operators/split.frame_array for the cardinality-changing form)."""

    def __init__(
        self,
        windowsize: float,
        stepsize: float | None = None,
        window_func: str = "hamming",
        fs: float | None = None,
        axis: int = -1,
    ):
        super().__init__(
            windowsize=windowsize, stepsize=stepsize, window_func=window_func, fs=fs, axis=axis
        )
        self.windowsize = windowsize
        self.stepsize = stepsize
        self.window_func = window_func
        self.fs = fs

    def expr(self, col, info):
        fs = info.get("fs", self.fs)
        if fs is None and info.get("time_step"):
            fs = 1.0 / info["time_step"]
        if fs is None:
            raise ValueError("fs not provided in Framing (init, info, or chain)")
        frame_len = int(round(self.windowsize * fs))
        step = 1 if self.stepsize is None else int(round(self.stepsize * fs))
        n = F.size(col)
        n_frames = (F.floor((n - frame_len) / step) + 1).cast("int")
        idx = F.when(n_frames > 0, F.sequence(F.lit(0), n_frames - 1)).otherwise(
            F.array().cast("array<int>")
        )
        wf = _window_expr(self.window_func, periodic=True)
        frames = F.transform(
            idx,
            lambda i: F.transform(
                F.slice(col, i * step + 1, frame_len),
                lambda x, k: wf(x.cast("double"), k, F.lit(frame_len)),
            ),
        )
        return frames, ({"time_step": self.stepsize} if self.stepsize else {})

    def sql(self, col_sql, info):
        fs = info.get("fs", self.fs)
        if fs is None and info.get("time_step"):
            fs = 1.0 / info["time_step"]
        if fs is None:
            raise ValueError("fs not provided in Framing (init, info, or chain)")
        frame_len = int(round(self.windowsize * fs))
        step = 1 if self.stepsize is None else int(round(self.stepsize * fs))
        wf = _window_sql(self.window_func, periodic=True)
        body = wf("CAST(__px AS DOUBLE)", "__pk", str(frame_len))

        def _frames(c):
            nf = f"CAST(FLOOR((size({c}) - {frame_len}) / {step}) + 1 AS INT)"
            idx = (
                f"(CASE WHEN {nf} > 0 THEN sequence(0, {nf} - 1)"
                f" ELSE CAST(array() AS ARRAY<INT>) END)"
            )
            return (
                f"transform({idx}, __pi -> transform("
                f"slice({c}, __pi * {step} + 1, {frame_len}),"
                f" (__px, __pk) -> {body}))"
            )

        frames = _bind_operand_sql(col_sql, _frames)
        return frames, ({"time_step": self.stepsize} if self.stepsize else {})


# --------------------------------------------------------------------- #
# pandas-UDF processors (no native Spark primitive)
# --------------------------------------------------------------------- #
class FFT(Processor):
    """Real/full FFT with nextpow2 padding and magnitude/power/split
    output (reference processors.py:296-351). Arrow-batched pandas UDF
    over array<double> — np.fft on the executor, never row-at-a-time."""

    def __init__(
        self,
        type: str = "real",
        nfft: str | int = "nextpow2",
        format: str = "magnitude",
        dc_reset: bool = False,
        norm: str | None = None,
    ):
        super().__init__(type=type, nfft=nfft, format=format, dc_reset=dc_reset, norm=norm)
        if type not in ("real", "full"):
            raise ValueError(f"unknown FFT type '{type}'")
        if format not in ("magnitude", "power", "split", "complex"):
            raise ValueError(f"unknown FFT format '{format}'")
        self.type = type
        self.nfft = nfft
        self.format = format
        self.dc_reset = dc_reset
        self.norm = norm

    def _nfft_for(self, n: int) -> int:
        if self.nfft == "nextpow2":
            return int(2 ** math.ceil(math.log2(n)))
        if self.nfft == "original":
            return n
        return int(self.nfft)

    def expr(self, col, info):
        typ, fmt, dc, norm = self.type, self.format, self.dc_reset, self.norm
        nfft_of = self._nfft_for

        @pandas_udf("array<double>")
        def fft_udf(s):
            import pandas as pd

            # batched by signal length: one 2-D rfft per distinct length
            # in the Arrow batch instead of a Python-loop rfft per row —
            # for the common fixed-length case this is a single
            # vectorized transform over the whole batch.
            vals = s.to_numpy()
            lengths = np.fromiter((len(x) for x in vals), dtype=np.int64, count=len(vals))
            out = np.empty(len(vals), dtype=object)
            for n in np.unique(lengths):
                idx = np.nonzero(lengths == n)[0]
                mat = np.empty((len(idx), n), dtype=np.float64)
                for row, i in enumerate(idx):
                    mat[row] = vals[i]
                nfft = nfft_of(int(n))
                spec = (
                    np.fft.rfft(mat, n=nfft, axis=1, norm=norm)
                    if typ == "real"
                    else np.fft.fft(mat, n=nfft, axis=1, norm=norm)
                )
                if fmt == "magnitude":
                    y = np.abs(spec)
                elif fmt == "power":
                    y = np.abs(spec) ** 2
                else:  # split
                    y = np.concatenate([np.real(spec), np.imag(spec)], axis=1)
                if dc:
                    y[:, 0] = 0.0
                for row, i in enumerate(idx):
                    out[i] = y[row]
            return pd.Series(out)

        upd = {}
        n_in = info.get("n_samples")
        if n_in:
            upd["nfft"] = self._nfft_for(int(n_in))
            upd["n_samples"] = (
                upd["nfft"] // 2 + 1 if self.type == "real" else upd["nfft"]
            )
        return fft_udf(col), upd


def mel_filterbank(
    n_bands: int,
    nfft: int,
    fs: float,
    fmin: float = 0.0,
    fmax: float | None = None,
    scale: str = "mel",
    norm: str | None = None,
) -> np.ndarray:
    """Triangular mel/linear filterbank matrix (n_bands × nfft//2+1) from
    the public HTK-style construction (reference processors.py:354-461
    describes the same math). Built once at plan-compile time."""
    high = min(fs / 2.0, fmax if fmax is not None else np.inf)
    if scale == "mel":
        lo_mel = 2595.0 * np.log10(1.0 + fmin / 700.0)
        hi_mel = 2595.0 * np.log10(1.0 + high / 700.0)
        start_hz = 700.0 * (10 ** ((lo_mel + np.arange(0, n_bands) / (n_bands + 1) * (hi_mel - lo_mel)) / 2595.0) - 1.0)
        stop_hz = 700.0 * (10 ** ((lo_mel + np.arange(2, n_bands + 2) / (n_bands + 1) * (hi_mel - lo_mel)) / 2595.0) - 1.0)
    elif scale == "linear":
        pts = np.linspace(fmin, high, n_bands + 2)
        start_hz, stop_hz = pts[:-2], pts[2:]
    else:
        raise ValueError(f"unknown filterbank scale '{scale}'")
    start_bin = np.round(nfft / fs * start_hz)
    stop_bin = np.round(nfft / fs * stop_hz)
    middle_bin = np.append(start_bin[1:], stop_bin[-2])
    low_len = middle_bin - start_bin + 1
    high_len = (stop_bin - start_bin + 1) - low_len + 1
    fbank = np.zeros((n_bands, int(nfft // 2 + 1)))
    for m in range(n_bands):
        rise = np.arange(1, low_len[m] + 1) / low_len[m]
        for k in range(int(low_len[m])):
            fbank[m, int(start_bin[m] + k)] = rise[k]
        fall = np.arange(high_len[m], 0, -1) / high_len[m]
        for k in range(int(high_len[m])):
            fbank[m, int(middle_bin[m] + k)] = fall[k]
    if norm == "slaney":
        fbank *= (2.0 / (stop_hz - start_hz))[:, np.newaxis]
    return fbank


class Filterbank(Processor):
    """Apply a precomputed mel/linear filterbank by matmul (reference
    processors.py:354-461): the matrix is built ONCE driver-side.

    Triangular mel/linear filters are sparse — each frequency bin feeds
    at most two overlapping bands — so when the matrix has few nonzeros
    the matmul unrolls into pure JVM expressions (one literal-weighted
    sum per band over the lambda-bound input; zeros skipped). Dense /
    very large banks fall back to an Arrow pandas UDF. Zero outputs are
    eps-floored like the reference."""

    #: beyond this many nonzero coefficients the unrolled expression
    #: tree stops being worth it; fall back to the Arrow UDF matmul
    MAX_NATIVE_NNZ = 2048

    def __init__(
        self,
        n_bands: int,
        scale: str = "mel",
        nfft: int | None = None,
        fmin: float = 0.0,
        fmax: float | None = None,
        norm: str | None = None,
        fs: float | None = None,
    ):
        super().__init__(
            n_bands=n_bands, scale=scale, nfft=nfft, fmin=fmin, fmax=fmax, norm=norm, fs=fs
        )
        self.n_bands = n_bands
        self.scale = scale
        self.nfft = nfft
        self.fmin = fmin
        self.fmax = fmax
        self.norm = norm
        self.fs = fs

    def expr(self, col, info):
        fs = info.get("fs", self.fs)
        if fs is None:
            raise ValueError("no fs given in Filterbank (init or chain info)")
        nfft = info.get("nfft", self.nfft)
        if nfft is None:
            raise ValueError("no nfft provided in Filterbank (init or prior FFT stage)")
        if self.nfft is not None and "nfft" in info and info["nfft"] != self.nfft:
            raise ValueError(
                f"nfft mismatch: Filterbank configured {self.nfft}, prior stage emits {info['nfft']}"
                " (reference processors.py:387-394 asserts the same at process time;"
                " here it fails at plan-build)"
            )
        fb = mel_filterbank(
            self.n_bands, int(nfft), float(fs), self.fmin, self.fmax, self.scale, self.norm
        ).T  # (nfft//2+1, n_bands)
        eps = float(np.finfo(float).eps)

        if int(np.count_nonzero(fb)) <= self.MAX_NATIVE_NNZ:
            from dabstract_spark.core import bind_once

            band_terms = [
                [(j, float(fb[j, b])) for j in range(fb.shape[0]) if fb[j, b] != 0.0]
                for b in range(self.n_bands)
            ]

            def apply(x):
                outs = []
                for terms in band_terms:
                    acc = F.lit(0.0)
                    for j, c in terms:  # ascending j: left-assoc fold, same
                        acc = acc + F.lit(c) * F.element_at(x, j + 1)  # order as SQL
                    outs.append(F.when(acc == 0.0, F.lit(eps)).otherwise(acc))
                return F.array(*outs)

            return bind_once(col, apply), {"n_samples": self.n_bands}

        @pandas_udf("array<double>")
        def fbank_udf(s):
            import pandas as pd

            mat = np.stack([np.asarray(x, dtype=np.float64) for x in s]) if len(s) else np.zeros((0, fb.shape[0]))
            out = mat @ fb
            out = np.where(out == 0, eps, out)
            return pd.Series(list(out))

        return fbank_udf(col), {"n_samples": self.n_bands}

    def sql(self, col_sql, info):
        """One-parse twin of the sparse-unrolled native path: the same
        left-associative literal-weighted sums (ascending j), the same
        eps-floor CASE, the same bind-once-through-array. The measured
        win: q91's plan build was ~1.6k py4j round trips Column-wise,
        ~10 with the single parse. Dense banks (the Arrow-UDF fallback)
        return None — a Python stage has no SQL form."""
        fs = info.get("fs", self.fs)
        nfft = info.get("nfft", self.nfft)
        if fs is None or nfft is None:
            # same contract failures as expr(); raise there, not here
            return None
        if self.nfft is not None and "nfft" in info and info["nfft"] != self.nfft:
            return None  # expr() raises the detailed mismatch error
        fb = mel_filterbank(
            self.n_bands, int(nfft), float(fs), self.fmin, self.fmax, self.scale, self.norm
        ).T
        if int(np.count_nonzero(fb)) > self.MAX_NATIVE_NNZ:
            return None
        from dabstract_spark.core import sql_double

        eps = sql_double(float(np.finfo(float).eps))
        bands = []
        for b in range(self.n_bands):
            acc = "0.0D"
            for j in range(fb.shape[0]):
                v = float(fb[j, b])
                if v != 0.0:
                    acc += f" + {sql_double(v)} * element_at(__pc, {j + 1})"
            bands.append(f"(CASE WHEN ({acc}) = 0.0D THEN {eps} ELSE ({acc}) END)")
        return (
            f"element_at(transform(array({col_sql}),"
            f" __pc -> array({', '.join(bands)})), 1)",
            {"n_samples": self.n_bands},
        )


def firwin(
    taps: int, f, window: str = "hamming", fs: float = 2.0, pass_zero: bool = True
) -> np.ndarray:
    """Windowed-sinc FIR design (public textbook method; scipy-free).
    ``f``: cutoff Hz (scalar) or [low, high]. Returns ``taps`` coefficients
    (taps forced odd by callers). Scaling normalizes unit gain at the
    center of the passband (DC / Nyquist / band center), matching
    scipy.firwin's convention."""
    fc = np.atleast_1d(np.asarray(f, dtype=np.float64)) / (fs / 2.0)
    n = np.arange(taps) - (taps - 1) / 2.0
    w = window_values(window, taps, periodic=False)

    def lp(c):
        return c * np.sinc(c * n)

    delta = np.sinc(n)  # allpass (1 at center tap)
    if pass_zero:
        h = lp(fc[0]) if len(fc) == 1 else delta - (lp(fc[1]) - lp(fc[0]))
        gain_freq = 0.0
    else:
        h = (delta - lp(fc[0])) if len(fc) == 1 else lp(fc[1]) - lp(fc[0])
        gain_freq = 1.0 if len(fc) == 1 else (fc[0] + fc[1]) / 2.0
    h = h * w
    # normalize gain at gain_freq (in normalized-Nyquist units) to 1
    resp = np.sum(h * np.cos(np.pi * gain_freq * n))
    return h / resp


class FIRFilter(Processor):
    """Design-once, apply-per-row FIR filtering (reference
    processors.py:523-575): coefficients from windowed-sinc design at
    plan-compile time. Short filters (taps <= 33, the common audio case)
    apply as a fully JVM-side unrolled causal convolution — the tap
    constants fold into the plan as literals and the input array is
    bound once through a lambda variable, so no Python stage and no
    re-evaluation of upstream chain stages. Longer filters fall back to
    an Arrow pandas UDF (identical to scipy.signal.lfilter(b, 1, x))."""

    #: above this tap count the unrolled expression outgrows its benefit
    MAX_NATIVE_TAPS = 33

    def __init__(
        self,
        type: str,
        f,
        taps: int,
        window: str = "hamming",
        fs: float | None = None,
        axis: int = -1,
    ):
        taps = int(taps) | 1  # odd taps, like the reference
        super().__init__(type=type, f=f, taps=taps, window=window, fs=fs, axis=axis)
        if type not in ("lowpass", "highpass", "bandpass", "bandstop"):
            raise ValueError(f"unknown FIRFilter type '{type}'")
        self.type = type
        self.f = f
        self.taps = taps
        self.window = window
        self.fs = fs

    def coefficients(self, fs: float) -> np.ndarray:
        pass_zero = self.type in ("lowpass", "bandstop")
        return firwin(self.taps, self.f, self.window, fs=fs, pass_zero=pass_zero)

    def expr(self, col, info):
        fs = info.get("fs", self.fs)
        if fs is None:
            raise ValueError("sampling frequency must reach FIRFilter (init or chain info)")
        h = self.coefficients(float(fs))

        if self.taps <= self.MAX_NATIVE_TAPS:
            taps = [float(v) for v in h]

            def conv(x):
                # y[i] = sum_k h[k] * x[i-k], accumulated in ascending-k
                # order (matches DuckDB list_sum fold order bit for bit)
                def y(i):
                    acc = F.lit(0.0)
                    for k, hk in enumerate(taps, start=1):
                        acc = acc + F.when(
                            i - k + 1 >= 1, F.lit(hk) * F.element_at(x, i - k + 1)
                        ).otherwise(F.lit(0.0))
                    return acc

                # sequence(1, 0) DESCENDS to [1, 0] — empty inputs must
                # map to empty outputs (like np.convolve), not two
                # spurious rows / an out-of-bounds element_at
                return F.when(
                    F.size(x) > 0, F.transform(F.sequence(F.lit(1), F.size(x)), y)
                ).otherwise(F.array().cast("array<double>"))

            # bind the (possibly composed) input expression ONCE via a
            # lambda variable: element_at over a lambda var is O(1), while
            # element_at over an inlined expression re-evaluates it per
            # (i, k) term — the pushdown/inline O(n^2) trap
            return F.element_at(F.transform(F.array(col), conv), 1), {}

        @pandas_udf("array<double>")
        def fir_udf(s):
            import pandas as pd

            out = []
            for x in s:
                arr = np.asarray(x, dtype=np.float64)
                out.append(np.convolve(arr, h, mode="full")[: arr.shape[0]])
            return pd.Series(out)

        return fir_udf(col), {}

    def sql(self, col_sql, info):
        """One-parse twin of the unrolled causal convolution (same
        ascending-k fold, same boundary CASE, same bind-once). Long
        filters (Arrow-UDF fallback) return None."""
        fs = info.get("fs", self.fs)
        if fs is None:
            return None  # expr() raises the contract error
        if self.taps > self.MAX_NATIVE_TAPS:
            return None
        from dabstract_spark.core import sql_double

        h = self.coefficients(float(fs))
        acc = "0.0D"
        for k, hk in enumerate((float(v) for v in h), start=1):
            acc += (
                f" + (CASE WHEN __pi - {k} + 1 >= 1 THEN"
                f" {sql_double(hk)} * element_at(__pa, __pi - {k} + 1)"
                f" ELSE 0.0D END)"
            )
        conv = (
            f"(CASE WHEN size(__pa) > 0 THEN"
            f" transform(sequence(1, size(__pa)), __pi -> {acc})"
            f" ELSE CAST(array() AS ARRAY<DOUBLE>) END)"
        )
        return (
            f"element_at(transform(array({col_sql}), __pa -> {conv}), 1)",
            {},
        )


class Resample(Processor):
    """FFT-method resampling (reference processors.py:578-600 uses
    scipy.signal.resample, which is the same rfft-truncate/pad-irfft
    construction; implemented directly in numpy)."""

    def __init__(self, target_fs: float, fs: float | None = None, axis: int = 0, window=None):
        super().__init__(target_fs=target_fs, fs=fs, axis=axis, window=window)
        self.target_fs = target_fs
        self.fs = fs

    def expr(self, col, info):
        fs = info.get("fs", self.fs)
        if fs is None:
            raise ValueError("fs must reach Resample (init or chain info)")
        ratio = self.target_fs / float(fs)

        @pandas_udf("array<double>")
        def resample_udf(s):
            import pandas as pd

            # batched by input length (same pattern as FFT): one 2-D
            # rfft/irfft per distinct length instead of per row
            vals = s.to_numpy()
            lengths = np.fromiter((len(x) for x in vals), dtype=np.int64, count=len(vals))
            out = np.empty(len(vals), dtype=object)
            for n in np.unique(lengths):
                idx = np.nonzero(lengths == n)[0]
                n = int(n)
                mat = np.empty((len(idx), n), dtype=np.float64)
                for row, i in enumerate(idx):
                    mat[row] = vals[i]
                num = int(round(ratio * n))
                spec = np.fft.rfft(mat, axis=1)
                target = np.zeros((len(idx), num // 2 + 1), dtype=complex)
                ncopy = min(spec.shape[1], target.shape[1])
                target[:, :ncopy] = spec[:, :ncopy]
                y = np.fft.irfft(target, num, axis=1) * (num / n)
                for row, i in enumerate(idx):
                    out[i] = y[row]
            return pd.Series(out)

        return resample_udf(col), {
            "fs": self.target_fs,
            "time_step": 1.0 / self.target_fs,
        }


PROCESSORS = {
    p.__name__: p
    for p in (
        Dummy,
        Scaler,
        Normalizer,
        Logarithm,
        Windowing,
        ExpandDims,
        Aggregation,
        Framing,
        FFT,
        Filterbank,
        FIRFilter,
        Resample,
    )
}


def resolve(name: str):
    """Name → processor class (reference processing_chain.py:69-80's
    string resolution, including the dynamic custom-module import:
    unknown names fall back to <DABSTRACT_SPARK_CUSTOM_DIR>/processors.py)."""
    if name in PROCESSORS:
        return PROCESSORS[name]
    from dabstract_spark.custom import resolve_custom

    hit = resolve_custom("processors", name)
    if hit is not None:
        return hit
    raise KeyError(f"unknown processor '{name}'; have {sorted(PROCESSORS)}")

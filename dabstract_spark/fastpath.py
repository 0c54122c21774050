"""Cached py4j member resolution for PySpark's hot plan-build helpers
(optimization r12, guide §1.2 — driver-side per-task work).

Every ``F.<fn>(...)`` call in PySpark classic resolves the JVM-side
``org.apache.spark.sql.functions`` class and the named member afresh
through TWO py4j reflection round trips (``r u`` class lookup + ``r m``
member lookup) before the one ``c`` call command that does the work —
measured with a send_command tap: ``F.element_at(c, 3)`` = 6 commands,
of which 4 are repeated reflection. The resolved ``JavaMember`` is
stable for the lifetime of the JVM, so caching it per (gateway, name)
cuts every builtin-function invocation from 3 round trips to 1 —
across the whole catalog, not per query. On this round's host one
round trip costs 0.2-6 ms depending on contention, and plan build is
round-trip-bound (see OPTIMIZATION_r12.md "Host calibration").

Patched (all three replicate the upstream body exactly, swapping only
the per-call ``getattr(jvm, ...)`` resolution for the cache):

- ``pyspark.sql.functions.builtin._get_jvm_function`` — the resolver
  behind every ``F.*`` builtin.
- ``pyspark.sql.classic.column._create_column_from_literal`` /
  ``_create_column_from_name`` — the ``functions.lit`` / ``functions.col``
  constructors used by Column operator sugar and string→Column coercion.
- ``pyspark.sql.classic.column._to_seq`` / ``_to_list`` — the
  ``PythonUtils.toSeq/toList`` converters behind every multi-column
  builtin (``F.array``, ``F.struct``, ``df.select(*cols)``, ...).

The cache is keyed on the live ``JVMView`` via a WeakKeyDictionary: a
stopped/recreated SparkContext gets a fresh view object, so stale
members can never be served to a new JVM, and dead views drop their
entries with the view itself. Results are byte-identical — the same
JavaMember executes the same JVM call; only the redundant reflection
disappears.
"""

from __future__ import annotations

import weakref

#: JVMView -> {name: JavaMember} (see module docstring for lifecycle)
_BY_JVM: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()

#: md5 over the concatenated sources of the upstream functions whose
#: bodies this module replicates, at the pyspark version the replicas
#: were written against and tested with. If a pyspark upgrade changes
#: ANY of those bodies — even keeping the names importable — install()
#: declines and the stock resolvers keep running, because a semantic
#: drift in e.g. _create_lambda would otherwise silently miscompute
#: plans through a stale replica (r13, per ADVICE.md).
_TESTED_UPSTREAM_MD5 = {
    "4.1.2": "c820b1ab385ffa95cba51311f45e7db3",
}


def _upstream_unchanged() -> bool:
    import hashlib
    import inspect

    import pyspark
    from pyspark.sql.classic import column as _col
    from pyspark.sql.functions import builtin as _builtin

    expected = _TESTED_UPSTREAM_MD5.get(pyspark.__version__)
    if expected is None:
        return False
    fns = (
        _builtin._get_jvm_function,
        _builtin._create_lambda,
        _builtin._unresolved_named_lambda_variable,
        _builtin._invoke_higher_order_function,
        _col._create_column_from_literal,
        _col._create_column_from_name,
        _col._to_seq,
        _col._to_list,
    )
    src = "".join(inspect.getsource(f) for f in fns)
    return hashlib.md5(src.encode()).hexdigest() == expected


def _cache_for(jvm) -> dict:
    d = _BY_JVM.get(jvm)
    if d is None:
        d = {}
        _BY_JVM[jvm] = d
    return d


def install() -> None:
    """Install the caches (idempotent; call before building plans)."""
    from pyspark.sql.functions import builtin as _builtin
    from pyspark.sql.classic import column as _col
    from pyspark.sql.utils import enum_to_value, get_active_spark_context

    if getattr(_builtin._get_jvm_function, "_sparkdab_fastpath", False):
        return
    if not _upstream_unchanged():
        # an untested pyspark: keep the stock resolvers (correct, just
        # chattier) and say so once at debug level instead of passing
        # silently
        import logging

        logging.getLogger(__name__).debug(
            "fastpath: pyspark upstream sources differ from the tested "
            "snapshot; leaving stock py4j resolvers installed"
        )
        return

    _orig_get = _builtin._get_jvm_function

    def _get_jvm_function(name: str, sc):
        d = _cache_for(sc._jvm)
        fn = d.get(name)
        if fn is None:
            fn = _orig_get(name, sc)
            d[name] = fn
        return fn

    _get_jvm_function._sparkdab_fastpath = True
    _builtin._get_jvm_function = _get_jvm_function

    def _create_column_from_literal(literal):
        sc = get_active_spark_context()
        return _get_jvm_function("lit", sc)(enum_to_value(literal))

    def _create_column_from_name(name: str):
        sc = get_active_spark_context()
        return _get_jvm_function("col", sc)(name)

    _col._create_column_from_literal = _create_column_from_literal
    _col._create_column_from_name = _create_column_from_name

    def _py_utils(sc, name: str):
        d = _cache_for(sc._jvm)
        fn = d.get(("PythonUtils", name))
        if fn is None:
            fn = getattr(sc._jvm.PythonUtils, name)
            d[("PythonUtils", name)] = fn
        return fn

    def _to_seq(sc, cols, converter=None):
        if converter:
            cols = [converter(c) for c in cols]
        assert sc._jvm is not None
        return _py_utils(sc, "toSeq")(cols)

    def _to_list(sc, cols, converter=None):
        if converter:
            cols = [converter(c) for c in cols]
        assert sc._jvm is not None
        return _py_utils(sc, "toList")(cols)

    _col._to_seq = _to_seq
    _col._to_list = _to_list

    # classic/dataframe.py (df.select/groupBy/...) and table_arg.py bind
    # _to_seq/_to_list BY VALUE at module import — rebind those names too
    # so DataFrame-side multi-column calls hit the cache as well
    from pyspark.sql.classic import dataframe as _cdf

    _cdf._to_seq = _to_seq
    _cdf._to_list = _to_list
    try:
        from pyspark.sql.classic import table_arg as _ta

        _ta._to_seq = _to_seq
    except ImportError:  # pragma: no cover - optional module
        pass

    # Higher-order-function lambda machinery: every F.transform /
    # aggregate / filter lambda resolves PythonSQLUtils afresh for each
    # of unresolvedNamedLambdaVariable / lambdaFunction / fn — 2
    # reflection commands per resolution, ~6 per HOF call. Same cache;
    # bodies replicate upstream exactly otherwise.
    def _psu(sc, name: str):
        d = _cache_for(sc._jvm)
        fn = d.get(("PythonSQLUtils", name))
        if fn is None:
            fn = getattr(sc._jvm.PythonSQLUtils, name)
            d[("PythonSQLUtils", name)] = fn
        return fn

    _Column = _builtin.Column
    _get_ctx = _builtin._get_active_spark_context

    def _unresolved_named_lambda_variable(name: str):
        sc = _get_ctx()
        return _Column(_psu(sc, "unresolvedNamedLambdaVariable")(name))

    def _create_lambda(f):
        parameters = _builtin._get_lambda_parameters(f)
        sc = _get_ctx()
        argnames = ["x", "y", "z"]
        args = [
            _unresolved_named_lambda_variable(arg)
            for arg in argnames[: len(parameters)]
        ]
        result = f(*args)
        if not isinstance(result, _Column):
            from pyspark.errors import PySparkValueError

            raise PySparkValueError(
                errorClass="HIGHER_ORDER_FUNCTION_SHOULD_RETURN_COLUMN",
                messageParameters={
                    "func_name": f.__name__,
                    "return_type": type(result).__name__,
                },
            )
        jexpr = result._jc
        jargs = _to_seq(sc, [arg._jc for arg in args])
        return _psu(sc, "lambdaFunction")(jexpr, jargs)

    def _invoke_higher_order_function(name: str, cols, funs):
        from pyspark.sql.classic.column import _to_java_column

        sc = _get_ctx()
        jfuns = [_create_lambda(f) for f in funs]
        jcols = [_to_java_column(c) for c in cols]
        return _Column(_psu(sc, "fn")(name, _to_seq(sc, jcols + jfuns)))

    _builtin._unresolved_named_lambda_variable = _unresolved_named_lambda_variable
    _builtin._create_lambda = _create_lambda
    _builtin._invoke_higher_order_function = _invoke_higher_order_function

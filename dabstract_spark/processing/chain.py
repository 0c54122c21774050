"""ProcessingChain: named-stage composition of processors into ONE Column
expression (reference /root/reference/dabstract/dataprocessor/processing_chain.py:37-189).

The reference folds data row-by-row through Python processors, threading
a per-example info dict. Here the chain composes Column expressions at
plan-compile time: ``expr()`` returns the fused expression (Catalyst sees
one tree — native stages stay inside whole-stage codegen; pandas-UDF
stages become single Arrow exchanges), and the info dict is threaded
STATICALLY between stages, so inter-stage contracts (e.g. Filterbank
checking the FFT's nfft, reference processors.py:387-394) fail at
plan-build instead of mid-job.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, functions as F

from dabstract_spark.processing import processors as P


class ProcessingChain:
    """Composable processor pipeline.

    ``add`` accepts (reference processing_chain.py:50-95):
    - a Processor instance,
    - a processor class (instantiated with ``parameters``),
    - a string name resolved via the registry,
    - a bare ``Column -> Column`` callable (wrapped ExternalProcessor),
    - a list of ``{"name": ..., "parameters": ...}`` dicts,
    - a ``{"chain": [...]}`` config dict,
    - None (no-op).
    """

    def __init__(self, chain=None):
        self._chain: list[P.Processor] = []
        if chain is not None:
            self.add(chain)

    # ------------------------------------------------------------------ #
    # construction
    # ------------------------------------------------------------------ #
    def add(self, name, parameters: dict | None = None) -> "ProcessingChain":
        parameters = dict(parameters or {})
        if name is None or name in ("none", "None"):
            return self
        if isinstance(name, P.Processor):
            self._chain.append(name)
            return self
        if isinstance(name, dict):
            if "chain" not in name:
                raise ValueError("config dict must contain a 'chain' entry")
            return self.add(name["chain"])
        if isinstance(name, (list, tuple)):
            for item in name:
                if isinstance(item, dict) and "name" in item:
                    self.add(item["name"], item.get("parameters"))
                else:
                    self.add(item)
            return self
        if isinstance(name, str):
            cls = P.resolve(name)
            proc = cls(**parameters)
            return self.add(proc)
        if isinstance(name, type):
            return self.add(name(**parameters))
        if callable(name):
            return self.add(P.ExternalProcessor(name))
        raise TypeError(f"cannot add {type(name)} to ProcessingChain")

    def __len__(self) -> int:
        return len(self._chain)

    @property
    def stages(self) -> list[P.Processor]:
        return list(self._chain)

    # ------------------------------------------------------------------ #
    # compilation (reference .process/.__call__, :97-111)
    # ------------------------------------------------------------------ #
    def expr(self, col: Column | str, info: dict | None = None) -> Column:
        c, _ = self.expr_info(col, info)
        return c

    @staticmethod
    def _post_dtype(proc, info: dict) -> None:
        """A stage's output dtype drives the next stage's elementwise
        dispatch; processors that reshape set it explicitly."""
        if isinstance(proc, P.ExpandDims):
            info["dtype"] = f"array<{info.get('dtype', 'double')}>"
        elif isinstance(proc, (P.Framing,)):
            info["dtype"] = "array<array<double>>"
        elif isinstance(proc, (P.FFT, P.Filterbank, P.FIRFilter, P.Resample)):
            info["dtype"] = "array<double>"

    def expr_info(self, col: Column | str, info: dict | None = None) -> tuple[Column, dict]:
        """Compose all stages; returns (expression, final info dict).

        Optimization r12 (guide §1.2, driver-side): stages that provide
        a one-parse SQL twin (``Processor.sql``) are composed as SQL
        text and materialized with a single ``F.expr`` parse — the
        Column-by-Column form of an unrolled-literal stage (Filterbank,
        FIRFilter) costs hundreds of py4j round trips for the identical
        expression tree. The first stage without a SQL form flushes the
        accumulated text to a Column and the rest composes Column-wise,
        so mixed native/UDF chains still get the cheap prefix. Results
        are identical by construction (each sql() mirrors its expr()
        tree node for node; pinned by test_processing.py equality
        tests)."""
        info = dict(info or {})
        sql_acc = None
        if isinstance(col, str):
            # backtick-quoted TOP-LEVEL column name: embedded backticks
            # are doubled per the SQL quoting rule. Note the string-key
            # contract here is "a column name", unlike F.col(), where a
            # dotted string may resolve a nested field — dataset
            # add_feature/apply keys are top-level by construction.
            sql_acc = f"`{col.replace('`', '``')}`"
            c = None
        else:
            c = col
        for proc in self._chain:
            if sql_acc is not None:
                got = proc.sql(sql_acc, info)
                if got is not None:
                    sql_acc, upd = got
                    info.update(upd)
                    self._post_dtype(proc, info)
                    continue
                # flush the SQL prefix to a Column, continue Column-wise
                c = F.expr(sql_acc)
                sql_acc = None
            c, upd = proc.expr(c, info)
            info.update(upd)
            self._post_dtype(proc, info)
        if sql_acc is not None:
            c = F.expr(sql_acc)
        return c, info

    def inv_expr(self, col: Column | str, info: dict | None = None) -> Column:
        """Reverse-composed inverses (reference inv_process, :113-120);
        raises if any stage lacks one, like the reference's assert."""
        c = F.col(col) if isinstance(col, str) else col
        info = dict(info or {})
        for proc in reversed(self._chain):
            c = proc.inv_expr(c, info)
        return c

    # ------------------------------------------------------------------ #
    # DataFrame-level application
    # ------------------------------------------------------------------ #
    def process_df(
        self,
        df: DataFrame,
        key: str,
        new_key: str | None = None,
        info: dict | None = None,
    ) -> DataFrame:
        info = dict(info or {})
        info.setdefault("dtype", dict(df.dtypes).get(key))
        # pass the NAME, not F.col(key): a string input lets expr_info
        # compose SQL-twin stages into one parse (see expr_info)
        return df.withColumn(new_key or key, self.expr(key, info))

    # ------------------------------------------------------------------ #
    # fitting (reference .fit, :122-172)
    # ------------------------------------------------------------------ #
    def fit(
        self,
        df: DataFrame,
        key: str,
        info: dict | None = None,
        init_subsample: float | None = None,
        seed: int = 0,
    ) -> "ProcessingChain":
        """Fit each stateful stage on the data as processed by all prior
        stages — the reference's causal recursion (:139-168), here as one
        aggregate job per stateful stage (no materialization loop).
        ``init_subsample`` fits on a Bernoulli sample."""
        info = dict(info or {})
        info.setdefault("dtype", dict(df.dtypes).get(key))
        fit_df = df.sample(fraction=init_subsample, seed=seed) if init_subsample else df
        c: Column = F.col(key)
        cur = dict(info)
        for proc in self._chain:
            if hasattr(proc, "fit") and callable(getattr(proc, "fit")):
                proc.fit(fit_df, c, cur)
            c, upd = proc.expr(c, cur)
            cur.update(upd)
        return self

    # ------------------------------------------------------------------ #
    # persistence (reference save/load/exists, :174-189): JSON spec, not
    # pickle — engine-portable and diffable
    # ------------------------------------------------------------------ #
    def to_spec(self) -> dict:
        return {"chain": [p.to_spec() for p in self._chain]}

    @classmethod
    def from_spec(cls, spec: dict) -> "ProcessingChain":
        out = cls()
        for st in spec.get("chain", []):
            proc = P.resolve(st["name"])(**st.get("parameters", {}))
            if st.get("fitted") is not None:
                proc.fitted = st["fitted"]
            out.add(proc)
        return out

    def save(self, filepath: str, ext: str = ".json") -> None:
        with open(filepath + ext, "w") as f:
            json.dump(self.to_spec(), f, indent=1)

    @classmethod
    def load(cls, filepath: str, ext: str = ".json") -> "ProcessingChain":
        with open(filepath + ext) as f:
            return cls.from_spec(json.load(f))

    @staticmethod
    def exists(filepath: str, ext: str = ".json") -> bool:
        return os.path.isfile(filepath + ext)

    def summary(self) -> list[dict]:
        out = []
        for p in self._chain:
            try:
                out.append(p.to_spec())
            except ValueError:
                out.append({"name": type(p).__name__, "parameters": "<callable>"})
        return out

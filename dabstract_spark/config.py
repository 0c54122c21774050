"""YAML/dict pipeline compiler (reference ``dataset_from_config`` /
``dataset_factory`` / ``load_yaml_config``,
/root/reference/dabstract/dataset/helpers.py:14-184 and
/root/reference/dabstract/utils.py:13-146).

A config declares datasets + select/split/xval sections; the compiler
resolves dataset builders from a registry and applies the sections
through the Dataset façade — the whole config therefore lowers to one
Catalyst plan (plus fold metadata), nothing interpreted at access time.

Custom YAML tags (reference utils.py): ``!join`` (string concat),
``!usjoin`` (underscore join), ``!pathjoin`` (path join), ``!kwarg``
(inject a value passed to load_yaml_config), ``!class`` (resolve a
dotted python path).
"""

from __future__ import annotations

import importlib
import os
from typing import Callable

from dabstract_spark.dataset import Dataset

# ------------------------------------------------------------------ #
# dataset registry (reference dataset_factory's name resolution against
# dbs/ + dabstract_CUSTOM_DIR, helpers.py:96-184)
# ------------------------------------------------------------------ #
_DATASETS: dict[str, Callable] = {}


def register_dataset(name: str, builder: Callable) -> None:
    """builder(spark, paths: dict, test_only: bool, **kwargs) -> Dataset"""
    _DATASETS[name] = builder


def _parquet_table(spark, paths, test_only=False, row_key=None, order_by=None, name=None, **kw):
    return Dataset.from_parquet(
        spark,
        paths["data"],
        name=name,
        row_key=row_key,
        order_by=order_by,
        test_only=test_only,
    )


def _folder_wav(spark, paths, test_only=False, decode=True, name=None, **kw):
    from dabstract_spark.sources import decode_wav, folder_dataset

    map_fct = (lambda c: decode_wav(c)) if decode else None
    return folder_dataset(
        spark, paths["data"], extension=".wav", name=name, map_fct=map_fct, test_only=test_only
    )


def _folder_binary(spark, paths, test_only=False, extension=".bin", name=None, **kw):
    from dabstract_spark.sources import folder_dataset

    return folder_dataset(
        spark, paths["data"], extension=extension, name=name, test_only=test_only
    )


def _anomaly_audio(spark, paths, test_only=False, name=None, **kw):
    from dabstract_spark.sources.dbs import _anomaly_audio_db

    return _anomaly_audio_db(spark, paths, test_only=test_only, name=name, **kw)


def _dcase(cls_name):
    def build(spark, paths, test_only=False, name=None, **kw):
        from dabstract_spark.sources import dbs

        return getattr(dbs, cls_name).build(
            spark, paths or {}, test_only=test_only, name=name, **kw
        )

    return build


register_dataset("parquet_table", _parquet_table)
register_dataset("folder_wav", _folder_wav)
register_dataset("folder_binary", _folder_binary)
register_dataset("AnomalyAudioDB", _anomaly_audio)
register_dataset("DCASE2020Task1A", _dcase("DCASE2020Task1A"))
register_dataset("DCASE2020Task1B", _dcase("DCASE2020Task1B"))
register_dataset("DCASE2018Task5", _dcase("DCASE2018Task5"))


def dataset_factory(spark, builder, paths=None, select=None, split=None, xval=None, test_only=False, **kwargs) -> Dataset:
    """Build one dataset by registry builder-name / Dataset instance /
    callable, then apply its per-dataset select/split/xval sections.
    (``builder`` is the reference factory's ``name`` — renamed so configs
    can also carry a display ``name`` inside parameters.)"""
    if isinstance(builder, Dataset):
        db = builder
    elif callable(builder) and not isinstance(builder, str):
        db = builder(spark, paths=paths, test_only=test_only, **kwargs)
    elif isinstance(builder, str):
        fn = _DATASETS.get(builder)
        if fn is None:
            from dabstract_spark.custom import resolve_custom

            fn = resolve_custom("dbs", builder)
        if fn is None:
            raise KeyError(f"unknown dataset builder '{builder}'; have {sorted(_DATASETS)}")
        db = fn(spark, paths=paths or {}, test_only=test_only, **kwargs)
    else:
        raise TypeError(f"cannot build dataset from {type(builder)}")
    if split is not None:
        db = db.add_split(**split) if isinstance(split, dict) else db.add_split(split)
    if select is not None:
        for sel in select if isinstance(select, list) else [select]:
            db = _apply_select(db, sel)
    if xval is not None:
        db = db.set_xval(xval["name"], **xval.get("parameters", {}))
    return db


def _apply_select(db: Dataset, sel) -> Dataset:
    if isinstance(sel, dict):
        return db.add_select(sel["name"], **sel.get("parameters", {}))
    return db.add_select(sel)


def dataset_from_config(spark, config: dict, overwrite_xval: bool = False) -> Dataset:
    """Multi-dataset pipeline from a config dict (reference
    helpers.py:14-93): concat datasets (intersect=True), then apply the
    top-level select/split/xval sections."""
    if not isinstance(config, dict) or "datasets" not in config:
        raise ValueError("config must be a dict with a 'datasets' list")
    dbs = config["datasets"]
    if not isinstance(dbs, list) or not dbs:
        raise ValueError("config['datasets'] must be a non-empty list")
    out = None
    for spec in dbs:
        db = dataset_factory(spark, spec["name"], **spec.get("parameters", {}))
        out = db if out is None else out.concat(db, intersect=True)
    if "split" in config:
        s = config["split"]
        out = out.add_split(**s) if isinstance(s, dict) else out.add_split(s)
    if "select" in config:
        sels = config["select"]
        for sel in sels if isinstance(sels, list) else [sels]:
            out = _apply_select(out, sel)
    if "xval" in config:
        x = config["xval"]
        out = out.set_xval(x["name"], overwrite=overwrite_xval, **x.get("parameters", {}))
    return out


# ------------------------------------------------------------------ #
# YAML loading with the reference's custom tags (utils.py:13-146)
# ------------------------------------------------------------------ #
def _make_loader(kwargs: dict):
    import yaml

    class _Loader(yaml.SafeLoader):
        pass

    def _seq(loader, node):
        return loader.construct_sequence(node)

    _Loader.add_constructor("!join", lambda l, n: "".join(str(i) for i in _seq(l, n)))
    _Loader.add_constructor("!usjoin", lambda l, n: "_".join(str(i) for i in _seq(l, n)))
    _Loader.add_constructor("!pathjoin", lambda l, n: os.path.join(*[str(i) for i in _seq(l, n)]))

    def _kwarg(loader, node):
        keys = _seq(loader, node)
        cur = kwargs
        for k in keys:
            cur = cur[k]
        return cur

    _Loader.add_constructor("!kwarg", _kwarg)

    def _class(loader, node):
        path = str(loader.construct_scalar(node))
        mod, _, attr = path.rpartition(".")
        return getattr(importlib.import_module(mod), attr)

    _Loader.add_constructor("!class", _class)
    return _Loader


def load_yaml_config(
    filename: str,
    path: str,
    walk: bool = False,
    post_process: Callable | None = None,
    post_process_kwargs: dict | None = None,
    **kwargs,
):
    """Load ``<path>/<filename>.yaml`` (optionally walking subdirs) with
    the custom tags, then hand to ``post_process`` (typically
    ``dataset_from_config``)."""
    import yaml

    if walk:
        for root, _dirs, files in os.walk(path):
            if filename + ".yaml" in files:
                path = root
                break
    filepath = os.path.join(path, filename + ".yaml")
    with open(filepath) as f:
        cfg = yaml.load(f, Loader=_make_loader(kwargs))
    if post_process is not None:
        return post_process(cfg, **(post_process_kwargs or {}))
    return cfg

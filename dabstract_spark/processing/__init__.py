"""Processing chains: dabstract's per-example UDF-pipeline framework
re-expressed as composable Spark Column expressions.

Reference: /root/reference/dabstract/dataprocessor/processing_chain.py and
processors/processors.py. Here a Processor is a *Column-expression
factory* evaluated at plan-compile time: native pyspark.sql.functions
where the semantics allow (Scaler, Logarithm, Windowing, Aggregation,
Normalizer, Framing, ExpandDims — all whole-stage-codegen'd, zero
Python), Arrow-batched pandas UDFs only where Spark has no primitive
(FFT, Filterbank, FIRFilter, Resample). The reference's per-example
``info`` side-channel becomes a static metadata dict threaded through
``expr()`` at compile time (SURVEY §1.1: metadata as columns/statics).
"""

from dabstract_spark.processing.chain import ProcessingChain
from dabstract_spark.processing.processors import (
    PROCESSORS,
    Aggregation,
    Dummy,
    ExpandDims,
    ExternalProcessor,
    FFT,
    Filterbank,
    FIRFilter,
    Framing,
    Logarithm,
    Normalizer,
    Processor,
    Resample,
    Scaler,
    Windowing,
    resolve,
)

__all__ = [
    "ProcessingChain",
    "Processor",
    "ExternalProcessor",
    "PROCESSORS",
    "resolve",
    "Scaler",
    "Normalizer",
    "Logarithm",
    "Windowing",
    "ExpandDims",
    "Aggregation",
    "Framing",
    "FFT",
    "Filterbank",
    "FIRFilter",
    "Resample",
    "Dummy",
]

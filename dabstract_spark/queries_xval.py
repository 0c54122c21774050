"""Cross-validation fold-assignment query catalog entries (SURVEY §2.10).

Registered into dabstract_spark.queries on import. Filled in as the
fold builders land.
"""

from __future__ import annotations

"""Text / dedup / similarity / events query catalog entries (SURVEY §7-M6).

Registered into dabstract_spark.queries on import. Filled in as the
corresponding operators land.
"""

from __future__ import annotations

"""FreshKart replay (SURVEY.md §7 M3) — the reference's own pipeline,
re-expressed on the engine's library operators and verified differentially
(the promise of the reference's empty ``test/test_pipeline_equivalence.py``).
"""

from esther_apache_spark_spark.freshkart.fixture import FIXTURE_DIR, ensure_fixture
from esther_apache_spark_spark.freshkart.pipeline import (
    run_freshkart_pipeline,
    write_freshkart_outputs,
)

__all__ = [
    "FIXTURE_DIR",
    "ensure_fixture",
    "run_freshkart_pipeline",
    "write_freshkart_outputs",
]

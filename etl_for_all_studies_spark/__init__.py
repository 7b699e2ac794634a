"""PySpark-native analytics engine with the capabilities of
``jrapisarda/etl-for-all-studies``.

Public API mirrors the reference's 4-symbol surface
(``src/etl_for_all_studies/__init__.py:3-7``): ``AppConfig``, ``load_config``,
``run_pipeline``, ``run_correlation_job`` — rebuilt Spark-first on
DataFrame/SQL plans instead of row-at-a-time Python + SQLAlchemy.
"""

from .config import AppConfig, ConfigurationError, load_config
from .plans.correlation_job import run_correlation_job
from .plans.pipeline import run_pipeline

__all__ = [
    "AppConfig",
    "ConfigurationError",
    "load_config",
    "run_pipeline",
    "run_correlation_job",
]

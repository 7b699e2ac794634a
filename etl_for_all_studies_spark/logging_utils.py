"""Logging setup, parity with the reference's ``configure_logging``
(``src/etl_for_all_studies/logging_utils.py:12-34``): resolved level from
config, a size-rotated file handler under ``logging.log_directory`` plus a
console handler, one shared format. Spark's own JVM (log4j) logging is
configured separately via ``session.get_spark``'s conf; this covers the
Python driver side, which is where all of the reference's logging lived.
"""
from __future__ import annotations

import logging
import logging.handlers
import pathlib

from .config import AppConfig

LOG_FORMAT = "%(asctime)s [%(levelname)s] %(name)s - %(message)s"


def configure_logging(config: AppConfig) -> None:
    """Configure root logging from ``config.logging`` (level, directory).

    Mirrors the reference: ``logs/etl.log`` rotated at 10 MB × 5 backups,
    console echo, ``%(asctime)s [%(levelname)s] %(name)s - %(message)s``.
    ``force=True`` so repeat calls (tests, notebook reruns) re-bind handlers
    instead of accumulating duplicates.
    """
    level = getattr(logging, config.logging.log_level.upper(), logging.INFO)
    log_dir = pathlib.Path(config.logging.log_directory)
    log_dir.mkdir(parents=True, exist_ok=True)

    handlers: list[logging.Handler] = [
        logging.handlers.RotatingFileHandler(
            log_dir / "etl.log", maxBytes=10_000_000, backupCount=5
        ),
        logging.StreamHandler(),
    ]
    logging.basicConfig(
        level=level, format=LOG_FORMAT, handlers=handlers, force=True
    )


__all__ = ["LOG_FORMAT", "configure_logging"]

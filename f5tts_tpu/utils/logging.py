"""Logging setup: stdout + rotating file handler (parity with
``src/server/logging_config.py:11-40`` — 10 MB x 5 rotation, level from env)."""

from __future__ import annotations

import logging
import logging.config
import os


def setup_logging(log_file: str | None = "f5tpu.log", level: str | None = None) -> logging.Logger:
    level = level or os.environ.get("F5TPU_LOG_LEVEL", "INFO").upper()
    handlers = {
        "console": {"class": "logging.StreamHandler", "formatter": "std", "stream": "ext://sys.stdout"},
    }
    if log_file:
        handlers["file"] = {
            "class": "logging.handlers.RotatingFileHandler",
            "formatter": "std",
            "filename": log_file,
            "maxBytes": 10 * 1024 * 1024,
            "backupCount": 5,
        }
    logging.config.dictConfig(
        {
            "version": 1,
            "disable_existing_loggers": False,
            "formatters": {"std": {"format": "%(asctime)s %(name)s %(levelname)s %(message)s"}},
            "handlers": handlers,
            "root": {"level": level, "handlers": list(handlers)},
        }
    )
    return logging.getLogger("f5tpu")

"""Logger setup (reference init_logger/get_logger, src/utils.py:28-43)."""

import logging
import sys

_NAME = "mapping-tpu"


def init_logger(level=logging.INFO):
    logger = logging.getLogger(_NAME)
    if logger.handlers:
        return logger
    logger.setLevel(level)
    handler = logging.StreamHandler(sys.stdout)
    handler.setFormatter(logging.Formatter(
        "%(asctime)s %(name)s >>> %(message)s", datefmt="%Y-%m-%d %H:%M:%S"))
    logger.addHandler(handler)
    logger.propagate = False
    return logger


def get_logger():
    return init_logger()

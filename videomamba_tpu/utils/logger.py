"""Rank-aware logging + experiment trackers — twin of /root/reference/utils/logger.py.

Master-only colored console, per-rank log files, warnings capture, wandb and
TensorBoard helpers. Optional deps (wandb, termcolor, tensorboard) are
imported lazily and degrade gracefully when absent — this framework has no
hard logging dependencies.
"""

from __future__ import annotations

import functools
import logging
import os
import sys
import time
from typing import Optional

from videomamba_tpu.utils.distributed import get_rank, is_main_process


def _colored(text, color=None, attrs=None):
    try:
        from termcolor import colored

        return colored(text, color, attrs=attrs)
    except ImportError:
        return text


def log_dict_to_wandb(log_dict, step, prefix=""):
    """include a separator `/` at the end of `prefix`"""
    if not is_main_process():
        return
    import wandb

    log_dict = {f"{prefix}{k}": v for k, v in log_dict.items()}
    wandb.log(log_dict, step)


def setup_wandb(config):
    if not (config.wandb.enable and is_main_process()):
        return None
    import wandb

    run = wandb.init(
        config=config,
        project=config.wandb.project,
        entity=config.wandb.entity,
        name=os.path.basename(config.output_dir),
        reinit=True,
    )
    return run


def setup_output_folder(save_dir: str = ".", folder_only: bool = False) -> str:
    """Output log path: save_dir/logs/train_<timestamp>.log (reference :51-75)."""
    log_filename = "train_"
    log_filename += time.strftime("%Y_%m_%dT%H_%M_%S")
    log_filename += ".log"

    log_folder = os.path.join(save_dir, "logs")
    if not os.path.exists(log_folder):
        os.makedirs(log_folder, exist_ok=True)
    if folder_only:
        return log_folder
    return os.path.join(log_folder, log_filename)


def setup_logger(
    output: Optional[str] = None,
    color: bool = True,
    name: str = "videomamba_tpu",
    disable: bool = False,
    clear_handlers=True,
    *args,
    **kwargs,
):
    """Configure the root framework logger (reference :78-180).

    Master logs to stdout (colored); every rank logs to its own file
    (``train.log`` on rank 0, ``train.log.rank{N}`` otherwise); Python
    warnings are captured into the same handlers.
    """
    if disable:
        return None
    logger = logging.getLogger(name)
    logger.propagate = False

    logging.captureWarnings(True)
    warnings_logger = logging.getLogger("py.warnings")

    plain_formatter = logging.Formatter(
        "%(asctime)s | %(levelname)s | %(name)s : %(message)s",
        datefmt="%Y-%m-%dT%H:%M:%S",
    )

    distributed_rank = get_rank()
    handlers = []
    logging_level = logging.INFO

    if distributed_rank == 0:
        logger.setLevel(logging_level)
        ch = logging.StreamHandler(stream=sys.stdout)
        ch.setLevel(logging_level)
        if color:
            formatter = ColorfulFormatter(
                _colored("%(asctime)s | %(name)s: ", "green") + "%(message)s",
                datefmt="%Y-%m-%dT%H:%M:%S",
            )
        else:
            formatter = plain_formatter
        ch.setFormatter(formatter)
        logger.addHandler(ch)
        warnings_logger.addHandler(ch)
        handlers.append(ch)

    # file logging: all workers
    if output is None:
        output = setup_output_folder()

    if output is not None:
        if output.endswith(".txt") or output.endswith(".log"):
            filename = output
        else:
            filename = os.path.join(output, "train.log")
        if distributed_rank > 0:
            filename = filename + f".rank{distributed_rank}"
        os.makedirs(os.path.dirname(filename), exist_ok=True)

        fh = logging.StreamHandler(_cached_log_stream(filename))
        fh.setLevel(logging_level)
        fh.setFormatter(plain_formatter)
        logger.addHandler(fh)
        warnings_logger.addHandler(fh)
        handlers.append(fh)
        logger.info(f"Logging to: {filename}")

    if clear_handlers:
        for handler in logging.root.handlers[:]:
            logging.root.removeHandler(handler)
    logging.basicConfig(level=logging_level, handlers=handlers)

    return logger


def setup_very_basic_config(color=True):
    plain_formatter = logging.Formatter(
        "%(asctime)s | %(levelname)s | %(name)s : %(message)s",
        datefmt="%Y-%m-%dT%H:%M:%S",
    )
    ch = logging.StreamHandler(stream=sys.stdout)
    ch.setLevel(logging.INFO)
    if color:
        formatter = ColorfulFormatter(
            _colored("%(asctime)s | %(name)s: ", "green") + "%(message)s",
            datefmt="%Y-%m-%dT%H:%M:%S",
        )
    else:
        formatter = plain_formatter
    ch.setFormatter(formatter)
    logging.basicConfig(level=logging.INFO, handlers=[ch])


@functools.lru_cache(maxsize=None)
def _cached_log_stream(filename):
    # Cache the opened file object so repeated setup_logger calls with the
    # same filename safely share one stream.
    return open(filename, "a")


class ColorfulFormatter(logging.Formatter):
    def formatMessage(self, record):
        log = super().formatMessage(record)
        if record.levelno == logging.WARNING:
            prefix = _colored("WARNING", "red", attrs=["blink"])
        elif record.levelno in (logging.ERROR, logging.CRITICAL):
            prefix = _colored("ERROR", "red", attrs=["blink", "underline"])
        else:
            return log
        return prefix + " " + log


class TensorboardLogger:
    """Master-only TensorBoard writer (reference :226-278).

    Requires the ``tensorboard`` package (via torch.utils.tensorboard);
    raises ImportError at construction when unavailable.
    """

    def __init__(self, log_folder="./logs", iteration=0):
        from torch.utils.tensorboard import SummaryWriter

        self.summary_writer = None
        self._is_master = is_main_process()
        self.log_folder = log_folder

        if self._is_master:
            current_time = time.strftime("%Y-%m-%dT%H:%M:%S")
            tensorboard_folder = os.path.join(
                self.log_folder, f"tensorboard_{current_time}"
            )
            self.summary_writer = SummaryWriter(tensorboard_folder)

    def __del__(self):
        if getattr(self, "summary_writer", None) is not None:
            self.summary_writer.close()

    def _should_log_tensorboard(self):
        return self.summary_writer is not None and self._is_master

    def add_scalar(self, key, value, iteration):
        if not self._should_log_tensorboard():
            return
        self.summary_writer.add_scalar(key, value, iteration)

    def add_scalars(self, scalar_dict, iteration):
        if not self._should_log_tensorboard():
            return
        for key, val in scalar_dict.items():
            self.summary_writer.add_scalar(key, val, iteration)

    def add_histogram_for_model(self, model, iteration):
        if not self._should_log_tensorboard():
            return
        import numpy as np

        from videomamba_tpu.utils.optimizer import param_path_strings

        for name, param in param_path_strings(model.params):
            self.summary_writer.add_histogram(name, np.asarray(param), iteration)

"""Meters, metrics, and misc helpers — twin of /root/reference/utils/basic_utils.py.

Torch-free: values are plain floats/NumPy (call ``float(x)`` happens
automatically for 0-d jax arrays); cross-process meter sync uses JAX
multihost allgather instead of NCCL all_reduce; device memory reporting in
``MetricLogger.log_every`` reads TPU memory_stats instead of CUDA counters.
"""

from __future__ import annotations

import datetime
import json
import logging
import os
import random
import statistics
import time
from collections import defaultdict, deque
from pathlib import Path
from typing import List, Union

import numpy as np

import jax

from videomamba_tpu.utils.distributed import is_dist_avail_and_initialized

logger = logging.getLogger(__name__)


class SmoothedValue(object):
    """Track a series of values; expose window-smoothed and global stats."""

    def __init__(self, window=20, fmt=None):
        if fmt is None:
            fmt = "{median:.4f} ({global_avg:.4f})"
        self.deque = deque(maxlen=window)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n=1):
        value = float(value)
        self.deque.append(value)
        self.count += n
        self.total += value * n

    def synchronize_between_processes(self):
        """Sum count/total across hosts (does not synchronize the deque)."""
        if not is_dist_avail_and_initialized():
            return
        from jax.experimental import multihost_utils

        t = multihost_utils.process_allgather(
            np.asarray([self.count, self.total], np.float64)
        )
        t = np.asarray(t).reshape(-1, 2).sum(axis=0)
        self.count = int(t[0])
        self.total = float(t[1])

    @property
    def median(self):
        return statistics.median(self.deque)

    @property
    def avg(self):
        return sum(self.deque) / len(self.deque)

    @property
    def global_avg(self):
        return self.total / self.count

    @property
    def max(self):
        return max(self.deque)

    @property
    def value(self):
        return self.deque[-1]

    def __str__(self):
        return self.fmt.format(
            median=self.median,
            avg=self.avg,
            global_avg=self.global_avg,
            max=self.max,
            value=self.value,
        )


def _device_memory_mb():
    """(allocated_mb, limit_mb) for the first local device, if reported."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats is None:
            return None
        mb = 1024.0 * 1024.0
        return (
            stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0)) / mb,
            stats.get("bytes_limit", 0) / mb,
        )
    except Exception:
        return None


class MetricLogger(object):
    def __init__(self, delimiter="\t"):
        self.meters = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            if isinstance(v, (jax.Array, np.ndarray)):
                v = float(v)
            assert isinstance(v, (float, int))
            self.meters[k].update(v)

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        if attr in self.__dict__:
            return self.__dict__[attr]
        raise AttributeError(
            "'{}' object has no attribute '{}'".format(type(self).__name__, attr)
        )

    def __str__(self):
        loss_str = []
        for name, meter in self.meters.items():
            if meter.count == 0:
                loss_str.append("{}: {}".format(name, "No data"))
            else:
                loss_str.append("{}: {}".format(name, str(meter)))
        return self.delimiter.join(loss_str)

    def global_avg(self):
        loss_str = []
        for name, meter in self.meters.items():
            if meter.count == 0:
                loss_str.append("{}: {}".format(name, "No data"))
            else:
                loss_str.append("{}: {:.4f}".format(name, meter.global_avg))
        return self.delimiter.join(loss_str)

    def get_global_avg_dict(self, prefix=""):
        """include a separator (e.g., `/`, or "_") at the end of `prefix`"""
        return {
            f"{prefix}{k}": m.global_avg if m.count > 0 else 0.0
            for k, m in self.meters.items()
        }

    def synchronize_between_processes(self):
        for meter in self.meters.values():
            meter.synchronize_between_processes()

    def add_meter(self, name, meter):
        self.meters[name] = meter

    def log_every(self, iterable, log_freq, header=None):
        i = 0
        if not header:
            header = ""
        start_time = time.time()
        end = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        space_fmt = ":" + str(len(str(len(iterable)))) + "d"
        log_msg = [
            header,
            "[{0" + space_fmt + "}/{1}]",
            "eta: {eta}",
            "{meters}",
            "time: {time}",
            "data: {data}",
        ]
        show_mem = _device_memory_mb() is not None
        if show_mem:
            log_msg.append("max mem: {memory:.0f} mem limit: {res_mem:.0f}")
        log_msg = self.delimiter.join(log_msg)
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % log_freq == 0 or i == len(iterable) - 1:
                eta_seconds = iter_time.global_avg * (len(iterable) - i)
                eta_string = str(datetime.timedelta(seconds=int(eta_seconds)))
                if show_mem:
                    mem = _device_memory_mb() or (0.0, 0.0)
                    logger.info(
                        log_msg.format(
                            i, len(iterable), eta=eta_string, meters=str(self),
                            time=str(iter_time), data=str(data_time),
                            memory=mem[0], res_mem=mem[1],
                        )
                    )
                else:
                    logger.info(
                        log_msg.format(
                            i, len(iterable), eta=eta_string, meters=str(self),
                            time=str(iter_time), data=str(data_time),
                        )
                    )
            i += 1
            end = time.time()
        total_time = time.time() - start_time
        total_time_str = str(datetime.timedelta(seconds=int(total_time)))
        logger.info(
            "{} Total time: {} ({:.4f} s / it)".format(
                header, total_time_str, total_time / max(1, len(iterable))
            )
        )


class AttrDict(dict):
    def __init__(self, *args, **kwargs):
        super(AttrDict, self).__init__(*args, **kwargs)
        self.__dict__ = self


def compute_acc(logits, label, reduction="mean"):
    import jax.numpy as jnp

    ret = (jnp.argmax(logits, axis=1) == label).astype(jnp.float32)
    if reduction == "none":
        return ret
    elif reduction == "mean":
        return float(ret.mean())
    raise ValueError(f"Unknown reduction: {reduction}")


def compute_n_params(model_or_params, return_str=True):
    """Parameter count; accepts a model (with .params) or a pytree."""
    params = getattr(model_or_params, "params", model_or_params)
    tot = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    if return_str:
        if tot >= 1e6:
            return "{:.1f}M".format(tot / 1e6)
        return "{:.1f}K".format(tot / 1e3)
    return tot


def setup_seed(seed: int, deterministic: bool = False):
    """Seed RNGs (older twin of determinism.configure_determinism)."""
    from videomamba_tpu.determinism import configure_determinism

    np.random.seed(seed)
    random.seed(seed)
    configure_determinism(seed=seed, deterministic=deterministic)


def remove_files_if_exist(file_paths):
    for fp in file_paths:
        if os.path.isfile(fp):
            os.remove(fp)


def save_json(data, filename, save_pretty=False, sort_keys=False):
    with open(filename, "w") as f:
        if save_pretty:
            f.write(json.dumps(data, indent=4, sort_keys=sort_keys))
        else:
            json.dump(data, f)


def load_json(filename):
    with open(filename, "r") as f:
        return json.load(f)


def flat_list_of_lists(list_of_lists):
    """flatten a list of lists [[1,2], [3,4]] to [1,2,3,4]"""
    return [item for sublist in list_of_lists for item in sublist]


def find_files_by_suffix_recursively(root: str, suffix: Union[str, List[str]]):
    """Recursive file search by suffix (glob-style, multi-suffix)."""
    if isinstance(suffix, str):
        suffix = [suffix]
    return flat_list_of_lists([list(Path(root).rglob(f"*{e}")) for e in suffix])


def match_key_and_shape(state_dict1, state_dict2):
    """Print key/shape diffs between two flat state dicts (debug helper)."""
    keys1 = set(state_dict1.keys())
    keys2 = set(state_dict2.keys())
    print(f"keys1 - keys2: {keys1 - keys2}")
    print(f"keys2 - keys1: {keys2 - keys1}")

    mismatch = 0
    for k in list(keys1 & keys2):
        if tuple(state_dict1[k].shape) != tuple(state_dict2[k].shape):
            print(
                f"k={k}, state_dict1[k].shape={state_dict1[k].shape}, "
                f"state_dict2[k].shape={state_dict2[k].shape}"
            )
            mismatch += 1
    print(f"mismatch {mismatch}")


def merge_dicts(list_dicts):
    merged_dict = list_dicts[0].copy()
    for i in range(1, len(list_dicts)):
        merged_dict.update(list_dicts[i])
    return merged_dict

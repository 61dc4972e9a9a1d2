"""Tabular logger — ASCII table + log.txt + JSONL metrics.

Reference: es_distributed/tabular_logger.py (TF EventsWriter + console) and
the TF-free rewrite gpu_implementation/tabular_logger.py:19-237. API surface
preserved: start/stop, record_tabular, dump_tabular, log, info/warn/error,
get_dir/log_dir. TensorBoard protobuf events are replaced by JSONL (one
object per dump) — machine-readable without a TF dependency; the metric
*names* match the reference exactly for comparability (SURVEY §5.5)."""

from __future__ import annotations

import datetime
import json
import os
import sys
import time
from typing import Any, Dict, Optional

DEBUG = 10
INFO = 20
WARN = 30
ERROR = 40
DISABLED = 50


class TabularLogger:
    def __init__(self, log_dir: Optional[str] = None, level: int = INFO):
        self.log_dir = log_dir
        self.level = level
        self._kvs: Dict[str, Any] = {}
        self._text = None
        self._jsonl = None
        self._tb = None
        self._step = 0
        self._start = time.time()
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._text = open(os.path.join(log_dir, "log.txt"), "a")
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
            from .tb_events import EventsWriter

            self._tb = EventsWriter(log_dir)

    # ------------------------------------------------------------- tabular

    def record_tabular(self, key: str, val: Any) -> None:
        self._kvs[key] = val

    def dump_tabular(self) -> None:
        if not self._kvs:
            return
        key_width = max(len(k) for k in self._kvs)
        val_strs = {}
        for k, v in self._kvs.items():
            if hasattr(v, "item"):
                v = v.item()
            val_strs[k] = f"{v:<8.3g}" if isinstance(v, float) else str(v)
        val_width = max(len(s) for s in val_strs.values())
        dashes = "-" * (key_width + val_width + 7)
        lines = [dashes]
        for k, s in val_strs.items():
            lines.append(f"| {k.ljust(key_width)} | {s.ljust(val_width)} |")
        lines.append(dashes)
        out = "\n".join(lines)
        print(out)
        sys.stdout.flush()
        if self._text:
            self._text.write(out + "\n")
            self._text.flush()
        if self._jsonl:
            rec = {
                k: (v.item() if hasattr(v, "item") else v) for k, v in self._kvs.items()
            }
            rec["_time"] = time.time()
            self._jsonl.write(json.dumps(rec) + "\n")
            self._jsonl.flush()
        if self._tb:
            # one TB scalar event per dump, like the reference's EventsWriter
            # append (tabular_logger.py:131-153); step = dump ordinal
            self._step += 1
            self._tb.write_scalars(self._step, self._kvs)
        self._kvs.clear()

    # ------------------------------------------------------------- messages

    def log(self, *args, level: int = INFO) -> None:
        if self.level <= level:
            now = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S.%f")[:-3]
            msg = f"[{now}] " + " ".join(map(str, args))
            print(msg)
            sys.stdout.flush()
            if self._text:
                self._text.write(msg + "\n")
                self._text.flush()

    def debug(self, *args) -> None:
        self.log(*args, level=DEBUG)

    def info(self, *args) -> None:
        self.log(*args, level=INFO)

    def warn(self, *args) -> None:
        self.log(*args, level=WARN)

    def error(self, *args) -> None:
        self.log(*args, level=ERROR)

    def get_dir(self) -> Optional[str]:
        return self.log_dir

    def close(self) -> None:
        if self._text:
            self._text.close()
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()


# module-level singleton API (reference tabular_logger exposes module fns)
_logger = TabularLogger()


def start(log_dir: str) -> None:
    global _logger
    _logger.close()
    _logger = TabularLogger(log_dir)


def stop() -> None:
    global _logger
    _logger.close()
    _logger = TabularLogger()


def record_tabular(key, val) -> None:
    _logger.record_tabular(key, val)


def dump_tabular() -> None:
    _logger.dump_tabular()


def log(*args, **kw) -> None:
    _logger.log(*args, **kw)


def info(*args) -> None:
    _logger.info(*args)


def warn(*args) -> None:
    _logger.warn(*args)


def error(*args) -> None:
    _logger.error(*args)


def get_dir():
    return _logger.get_dir()


def log_dir():
    return _logger.get_dir()

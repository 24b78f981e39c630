"""Structured logging (reference src/unifydb/structlog.clj).

The reference wraps Timbre with three interchangeable formatters —
edn-format, json-format, human-format — each rendering a structured map
{:ns :level :timestamp :message :data (:error)}. Same surface here over
the stdlib: `log(level, message, **data)` renders one line per call in
the configured format; `set_log_formatter` / `set_level` mirror
structlog.clj's setters.
"""

from __future__ import annotations

import json
import sys
import time
import traceback
from typing import Optional

_LEVELS = ["debug", "info", "warn", "error", "fatal"]
_STATE = {"format": "human", "level": "info", "stream": None}

_COLORS = {"debug": "\033[34m", "info": "\033[32m", "warn": "\033[33m",
           "error": "\033[31m", "fatal": "\033[31m"}
_RESET = "\033[0m"


def set_log_formatter(fmt: str) -> None:
    if fmt not in ("human", "json", "edn"):
        raise ValueError(f"unknown log format {fmt!r}")
    _STATE["format"] = fmt


def set_level(level: str) -> None:
    if level not in _LEVELS:
        raise ValueError(f"unknown log level {level!r}")
    _STATE["level"] = level


def _log_map(ns: str, level: str, message: str, data: dict,
             err: Optional[BaseException]) -> dict:
    out = {
        "ns": ns,
        "level": level,
        "timestamp": int(time.time() * 1000),
        "message": message,
        "data": data,
    }
    if err is not None:
        out["error"] = "".join(
            traceback.format_exception(type(err), err, err.__traceback__)
        )
    return out


def _render(m: dict) -> str:
    fmt = _STATE["format"]
    if fmt == "json":
        return json.dumps(m, default=str)
    if fmt == "edn":
        from unifydb_spark import edn

        return edn.dumps({k: v for k, v in m.items()})
    color = _COLORS.get(m["level"], "")
    kv = " ".join(f"{k}={v!r}" for k, v in m["data"].items())
    line = f"{color}{m['level'].upper()}{_RESET} [{m['ns']}] - {m['message']} {kv}"
    if "error" in m:
        line += "\n" + m["error"]
    return line


def log(level: str, message: str, _ns: str = "unifydb_spark",
        _err: Optional[BaseException] = None, **data) -> Optional[str]:
    """Emit one structured log line; returns the rendered line (None when
    below the configured level)."""
    if _LEVELS.index(level) < _LEVELS.index(_STATE["level"]):
        return None
    line = _render(_log_map(_ns, level, message, data, _err))
    print(line, file=_STATE["stream"] or sys.stderr)
    return line


def debug(message: str, **data):
    return log("debug", message, **data)


def info(message: str, **data):
    return log("info", message, **data)


def warn(message: str, **data):
    return log("warn", message, **data)


def error(message: str, _err: Optional[BaseException] = None, **data):
    return log("error", message, _err=_err, **data)

"""Minimal EDN reader/writer for the HTTP surface (V4 content
negotiation, reference src/unifydb/server.clj:54-81).

Covers the subset the service actually speaks: nil, booleans, integers,
floats, strings, keywords, symbols, vectors, lists, maps, sets and
#inst tagged instants.

Decoding conventions (aligned with the engine's JSON-side query syntax):
 - keywords decode to their ':name' string form in value position
   (patterns like [?e :customer/custkey ?ck] arrive exactly as the
   engine's dict syntax spells them), but MAP KEYS decode to the bare
   name ('find', 'where', 'customer/nation'), matching the dict-query
   convention.
 - symbols decode to plain strings ('?e', '_', '&').
 - EDN lists (...) decode to Python tuples — call positions (predicates,
   fn heads) are naturally distinguished from vectors, which is what the
   JSON surface needs the {"$call": ...} wrapper for.

Encoding: dict keys render as keywords, strings as quoted strings,
Ref as the tagged literal #unifydb/ref <id> (the engine types refs
strictly, unlike the reference where entity ids are bare numbers —
documented divergence), datetimes as #inst.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from unifydb_spark.values import Ref


class EdnError(ValueError):
    pass


_WS = set(" \t\n\r,")
_DELIM = _WS | set("()[]{}\"';")


class _Reader:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def error(self, msg):
        raise EdnError(f"{msg} at position {self.i}")

    def peek(self):
        return self.s[self.i] if self.i < len(self.s) else ""

    def skip_ws(self):
        while self.i < len(self.s):
            c = self.s[self.i]
            if c in _WS:
                self.i += 1
            elif c == ";":  # comment to end of line
                while self.i < len(self.s) and self.s[self.i] != "\n":
                    self.i += 1
            else:
                return

    def read(self, as_key: bool = False) -> Any:
        self.skip_ws()
        c = self.peek()
        if c == "":
            self.error("unexpected end of input")
        if c == "[":
            return self.read_seq("]", list)
        if c == "(":
            return self.read_seq(")", tuple)
        if c == "{":
            return self.read_map()
        if c == '"':
            return self.read_string()
        if c == "#":
            return self.read_dispatch()
        if c == ":":
            return self.read_keyword(as_key)
        return self.read_atom()

    def read_seq(self, close: str, ctor):
        self.i += 1  # opener
        out = []
        while True:
            self.skip_ws()
            if self.peek() == "":
                self.error(f"unterminated sequence (expected {close!r})")
            if self.peek() == close:
                self.i += 1
                return ctor(out)
            out.append(self.read())

    def read_map(self):
        self.i += 1
        out = {}
        while True:
            self.skip_ws()
            if self.peek() == "":
                self.error("unterminated map")
            if self.peek() == "}":
                self.i += 1
                return out
            k = self.read(as_key=True)
            if isinstance(k, (list, dict)):
                self.error("unsupported map key type")
            v = self.read()
            out[k] = v

    def read_string(self):
        self.i += 1
        out = []
        while True:
            if self.i >= len(self.s):
                self.error("unterminated string")
            c = self.s[self.i]
            if c == '"':
                self.i += 1
                return "".join(out)
            if c == "\\":
                self.i += 1
                e = self.s[self.i] if self.i < len(self.s) else ""
                mapped = {"n": "\n", "t": "\t", "r": "\r", '"': '"',
                          "\\": "\\"}.get(e)
                if mapped is None:
                    if e == "u":
                        out.append(chr(int(self.s[self.i + 1:self.i + 5], 16)))
                        self.i += 5
                        continue
                    self.error(f"bad escape \\{e}")
                out.append(mapped)
                self.i += 1
            else:
                out.append(c)
                self.i += 1

    def read_dispatch(self):
        if self.s.startswith("#{", self.i):
            self.i += 1
            return set(self.read_seq("}", frozenset))
        if self.s.startswith("#inst", self.i):
            self.i += 5
            self.skip_ws()
            iso = self.read_string()
            return _dt.datetime.fromisoformat(iso.replace("Z", "+00:00"))
        if self.s.startswith("#unifydb/ref", self.i):
            # the engine types refs strictly (a bare int in value position
            # is a long, by design), so the wire format tags them
            self.i += len("#unifydb/ref")
            n = self.read()
            if not isinstance(n, int):
                self.error("#unifydb/ref expects an integer")
            return Ref(n)
        if self.s.startswith("#unifydb/id", self.i):
            # input alias: the reference's tag for the same boxed-ID
            # concept (/root/reference/src/data_readers.clj:1) — accepted
            # on read; we keep EMITTING #unifydb/ref (documented form)
            self.i += len("#unifydb/id")
            n = self.read()
            if not isinstance(n, int):
                self.error("#unifydb/id expects an integer")
            return Ref(n)
        self.error("unsupported dispatch")

    def read_token(self):
        start = self.i
        while self.i < len(self.s) and self.s[self.i] not in _DELIM:
            self.i += 1
        return self.s[start:self.i]

    def read_keyword(self, as_key: bool):
        tok = self.read_token()  # includes the leading ':'
        return tok[1:] if as_key else tok

    def read_atom(self):
        tok = self.read_token()
        if tok == "nil":
            return None
        if tok == "true":
            return True
        if tok == "false":
            return False
        try:
            return int(tok)
        except ValueError:
            pass
        try:
            return float(tok)
        except ValueError:
            pass
        return tok  # symbol -> plain string ('?e', '_', '&')


def loads(s: str) -> Any:
    r = _Reader(s)
    v = r.read()
    r.skip_ws()
    if r.i < len(r.s):
        r.error("trailing input")
    return v


_STR_ESC = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\t": "\\t", "\r": "\\r"}

_KW_SAFE = set(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    "-_.*+!?$%&=<>/"
)


def _kw(name: str) -> str:
    if name and all(ch in _KW_SAFE for ch in name):
        return ":" + name
    raise EdnError(f"map key {name!r} is not keyword-safe")


def dumps(v: Any) -> str:
    if v is None:
        return "nil"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, Ref):
        return f"#unifydb/ref {int(v)}"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        return '"' + "".join(_STR_ESC.get(c, c) for c in v) + '"'
    if isinstance(v, (_dt.datetime, _dt.date)):
        return f'#inst "{v.isoformat()}"'
    if isinstance(v, (list, tuple)):
        return "[" + " ".join(dumps(x) for x in v) + "]"
    if isinstance(v, (set, frozenset)):
        return "#{" + " ".join(dumps(x) for x in sorted(v, key=str)) + "}"
    if isinstance(v, dict):
        return "{" + " ".join(
            f"{_kw(str(k))} {dumps(x)}" for k, x in v.items()
        ) + "}"
    raise EdnError(f"cannot encode {type(v).__name__}")

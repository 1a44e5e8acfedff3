"""External result cache + rate limiter speaking the Redis wire
protocol (RESP2) — the reference's out-of-process cache
(`healthcare-api-main.py:402-419` SETEX/GET result caching,
`:181-206` INCR + first-call-EXPIRE rate limiting) implemented
against ANY Redis-compatible server using only stdlib sockets.

The in-process `sinks.ResultCache` / `security.RateLimiter` remain
the default (SURVEY §1.4's sanctioned mapping: state dies with the
session). These adapters are the deployment path when cache state
must OUTLIVE the session or be SHARED across drivers: same call
surface, state in Redis, values JSON-encoded (driver-side result
records only — DataFrame handles are engine state and cannot
round-trip through an external store; callers cache `to_records`
output, exactly like the reference caches JSON).

No redis-py dependency: `RespClient` writes RESP arrays of bulk
strings and parses the five RESP2 reply types. That is the entire
protocol surface GET/SETEX/INCR/EXPIRE/PING need.
"""

from __future__ import annotations

import json
import socket
from typing import Any

from ..healthcare.security import RateLimitExceededError


class RespError(RuntimeError):
    """Server-side -ERR reply."""


class RespClient:
    """Minimal RESP2 client over one blocking socket.

    Commands go as `*N\\r\\n$len\\r\\narg\\r\\n...` (arrays of bulk
    strings — the only request shape Redis accepts); replies cover
    simple strings, errors, integers, bulk strings, and arrays."""

    def __init__(self, host: str, port: int, timeout: float = 5.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._rd = self._sock.makefile("rb")

    def close(self) -> None:
        try:
            self._rd.close()
        finally:
            self._sock.close()

    def cmd(self, *args: str | int) -> Any:
        out = [f"*{len(args)}\r\n".encode()]
        for a in args:
            b = str(a).encode()
            out.append(b"$" + str(len(b)).encode() + b"\r\n" + b + b"\r\n")
        self._sock.sendall(b"".join(out))
        return self._read_reply()

    def _read_reply(self) -> Any:
        line = self._rd.readline()
        if not line:
            raise ConnectionError("redis connection closed mid-reply")
        kind, rest = line[:1], line[1:-2]
        if kind == b"+":
            return rest.decode()
        if kind == b"-":
            raise RespError(rest.decode())
        if kind == b":":
            return int(rest)
        if kind == b"$":
            n = int(rest)
            if n == -1:
                return None
            data = self._rd.read(n + 2)
            return data[:-2].decode()
        if kind == b"*":
            n = int(rest)
            if n == -1:
                return None
            return [self._read_reply() for _ in range(n)]
        raise RespError(f"unknown RESP reply type {kind!r}")


def connect_or_none(host: str, port: int, timeout: float = 2.0) -> RespClient | None:
    """PING-probed connection; None when the server is unreachable so
    callers can fall back to the in-process cache (the reference's
    'if Redis is down, allow the request' posture, `:200-203`)."""
    try:
        c = RespClient(host, port, timeout=timeout)
        if c.cmd("PING") != "PONG":
            c.close()
            return None
        return c
    except OSError:
        return None


class RedisResultCache:
    """`sinks.ResultCache` surface over SETEX/GET (reference
    `:402-419`): JSON values, server-side TTL. `put` returns the value
    for call-site chaining, like the in-process twin."""

    def __init__(self, client: RespClient, ttl_seconds: int = 3600):
        self.client = client
        self.ttl = int(ttl_seconds)

    @staticmethod
    def key(**params: Any) -> str:
        return "&".join(f"{k}={params[k]}" for k in sorted(params))

    def get(self, key: str) -> Any | None:
        raw = self.client.cmd("GET", key)
        return None if raw is None else json.loads(raw)

    def put(self, key: str, value: Any) -> Any:
        self.client.cmd("SETEX", key, self.ttl, json.dumps(value, default=str))
        return value


class RedisRateLimiter:
    """`security.RateLimiter` surface over INCR + first-call EXPIRE —
    byte-for-byte the reference's pattern (`:181-206`): the counter's
    TTL starts when the first call in a window creates the key, and
    the 429 fires when the count exceeds max_calls."""

    def __init__(self, client: RespClient, max_calls: int = 100,
                 window_seconds: int = 3600):
        self.client = client
        self.max_calls = max_calls
        self.window_seconds = window_seconds

    def check(self, key: str) -> int:
        count = self.client.cmd("INCR", key)
        if count == 1:
            self.client.cmd("EXPIRE", key, self.window_seconds)
        if count > self.max_calls:
            raise RateLimitExceededError(
                f"Rate limit exceeded. Max {self.max_calls} calls per "
                f"{self.window_seconds} seconds"
            )
        return count

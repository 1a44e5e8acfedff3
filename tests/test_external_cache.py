"""RESP client + Redis-backed cache/limiter adapters, driven against
an in-process RESP2 server (socketserver + injectable clock) — real
wire-protocol bytes over a real socket, no redis-py anywhere."""

from __future__ import annotations

import socketserver
import threading

import pytest

from healthcare_research_data_pipeline_project_spark.healthcare.security import (
    RateLimitExceededError,
)
from healthcare_research_data_pipeline_project_spark.sources.external_cache import (
    RedisRateLimiter,
    RedisResultCache,
    RespClient,
    RespError,
    connect_or_none,
)


class FakeRedis(socketserver.ThreadingTCPServer):
    """Tiny RESP2 server: PING/GET/SET/SETEX/INCR/EXPIRE/TTL with
    lazy TTL expiry on an injectable clock — enough surface to verify
    the adapters' protocol behavior byte-for-byte."""

    allow_reuse_address = True
    daemon_threads = True

    def __init__(self):
        self.now = [0.0]  # test-controlled clock
        self.store: dict[str, str] = {}
        self.expiry: dict[str, float] = {}
        self.lock = threading.Lock()
        super().__init__(("127.0.0.1", 0), _Handler)

    def _alive(self, k: str) -> bool:
        exp = self.expiry.get(k)
        if exp is not None and self.now[0] >= exp:
            self.store.pop(k, None)
            self.expiry.pop(k, None)
            return False
        return k in self.store

    def execute(self, args: list[str]):
        cmd, rest = args[0].upper(), args[1:]
        with self.lock:
            if cmd == "PING":
                return "+PONG"
            if cmd == "GET":
                return self.store[rest[0]] if self._alive(rest[0]) else None
            if cmd == "SET":
                self.store[rest[0]] = rest[1]
                self.expiry.pop(rest[0], None)
                return "+OK"
            if cmd == "SETEX":
                self.store[rest[0]] = rest[2]
                self.expiry[rest[0]] = self.now[0] + int(rest[1])
                return "+OK"
            if cmd == "INCR":
                cur = int(self.store[rest[0]]) if self._alive(rest[0]) else 0
                self.store[rest[0]] = str(cur + 1)
                return cur + 1
            if cmd == "EXPIRE":
                if not self._alive(rest[0]):
                    return 0
                self.expiry[rest[0]] = self.now[0] + int(rest[1])
                return 1
            if cmd == "TTL":
                if not self._alive(rest[0]):
                    return -2
                exp = self.expiry.get(rest[0])
                return -1 if exp is None else int(exp - self.now[0])
            return f"-ERR unknown command '{cmd}'"


class _Handler(socketserver.StreamRequestHandler):
    def handle(self):
        while True:
            line = self.rfile.readline()
            if not line or not line.startswith(b"*"):
                return
            n = int(line[1:-2])
            args = []
            for _ in range(n):
                ln = int(self.rfile.readline()[1:-2])  # $len
                args.append(self.rfile.read(ln + 2)[:-2].decode())
            reply = self.server.execute(args)
            if isinstance(reply, str) and reply[:1] in "+-":
                self.wfile.write(reply.encode() + b"\r\n")
            elif isinstance(reply, int):
                self.wfile.write(b":" + str(reply).encode() + b"\r\n")
            elif reply is None:
                self.wfile.write(b"$-1\r\n")
            else:
                data = reply.encode()
                self.wfile.write(
                    b"$" + str(len(data)).encode() + b"\r\n" + data + b"\r\n"
                )


@pytest.fixture()
def server():
    srv = FakeRedis()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def test_resp_client_roundtrip_and_errors(server):
    c = RespClient("127.0.0.1", server.server_address[1])
    assert c.cmd("PING") == "PONG"
    assert c.cmd("SET", "k", "v") == "OK"
    assert c.cmd("GET", "k") == "v"
    assert c.cmd("GET", "absent") is None
    assert c.cmd("INCR", "ctr") == 1
    assert c.cmd("INCR", "ctr") == 2
    with pytest.raises(RespError, match="unknown command"):
        c.cmd("FLY")
    c.close()


def test_result_cache_setex_ttl_semantics(server):
    c = RespClient("127.0.0.1", server.server_address[1])
    cache = RedisResultCache(c, ttl_seconds=60)
    records = [{"diagnosis_code": "I10", "rate": 12.5}]
    key = cache.key(analysis="readmissions", days=90)
    assert cache.get(key) is None
    assert cache.put(key, records) == records
    assert cache.get(key) == records  # JSON round-trip
    assert c.cmd("TTL", key) == 60  # server-side TTL, from SETEX
    server.now[0] = 61.0
    assert cache.get(key) is None  # expired on the server, not client
    c.close()


def test_rate_limiter_incr_expire_window(server):
    c = RespClient("127.0.0.1", server.server_address[1])
    rl = RedisRateLimiter(c, max_calls=3, window_seconds=10)
    assert [rl.check("u1") for _ in range(3)] == [1, 2, 3]
    with pytest.raises(RateLimitExceededError):
        rl.check("u1")
    assert rl.check("u2") == 1  # keys independent
    # the window TTL was set by the FIRST call; expiry resets the count
    server.now[0] = 10.0
    assert rl.check("u1") == 1
    c.close()


def test_connect_or_none_fallback_posture(server):
    ok = connect_or_none("127.0.0.1", server.server_address[1])
    assert ok is not None
    ok.close()
    # unreachable → None (reference's 'if Redis is down, allow' path)
    assert connect_or_none("127.0.0.1", 1, timeout=0.2) is None

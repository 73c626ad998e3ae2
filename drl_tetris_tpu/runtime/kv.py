"""Client for tetrikv (native/kvstore) — the host-side control plane.

Typed primitives mirroring drl_tetris/training_state/redis_types.py:25-181:
entry / clock / flag (TTL + atomic claim) / byte_block / queue, all keyed
``run_id/role/name`` (scope.py keyjoin).  Values are raw bytes; pytrees go
through flax.serialization (msgpack), replacing the reference's dill blobs.
"""
from __future__ import annotations

import os
import socket
import struct
import subprocess
import time
from typing import Any, List, Optional, Tuple


def keyjoin(*parts: str) -> str:
    """scope.py:4-9."""
    return "/".join(p for p in parts if p)


class KVClient:
    def __init__(self, host: str = "127.0.0.1", port: int = 6399,
                 timeout: float = 30.0):
        self.addr = (host, port)
        self.timeout = timeout
        self._sock: Optional[socket.socket] = None

    def _conn(self) -> socket.socket:
        if self._sock is None:
            s = socket.create_connection(self.addr, timeout=self.timeout)
            s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            self._sock = s
        return self._sock

    def close(self):
        if self._sock is not None:
            self._sock.close()
            self._sock = None

    def _call(self, line: str, value: bytes = b"") -> Tuple[str, bytes]:
        payload = line.encode() + b"\n" + value
        msg = struct.pack("<I", len(payload)) + payload
        for attempt in range(2):
            try:
                s = self._conn()
                s.sendall(msg)
                hdr = self._read_n(s, 4)
                (rlen,) = struct.unpack("<I", hdr)
                resp = self._read_n(s, rlen)
                status, body = chr(resp[0]), resp[1:]
                return status, body
            except (OSError, ConnectionError):
                self.close()
                if attempt == 1:
                    raise
        raise ConnectionError("unreachable")

    def _read_n(self, s: socket.socket, n: int) -> bytes:
        out = b""
        while len(out) < n:
            chunk = s.recv(n - len(out))
            if not chunk:
                raise ConnectionError("kv server closed connection")
            out += chunk
        return out

    # -- primitives ---------------------------------------------------------
    def ping(self) -> bool:
        try:
            st, body = self._call("PING")
            return st == "$" and body == b"PONG"
        except Exception:
            return False

    def set(self, key: str, value: bytes):
        self._call(f"SET {key}", value)

    def get(self, key: str) -> Optional[bytes]:
        st, body = self._call(f"GET {key}")
        return body if st == "$" else None

    def delete(self, key: str):
        self._call(f"DEL {key}")

    def incr(self, key: str, delta: int = 1) -> int:
        st, body = self._call(f"INCR {key} {delta}")
        return int(body)

    def fincr(self, key: str, delta: float) -> float:
        st, body = self._call(f"FINCR {key} {delta}")
        return float(body)

    def expire(self, key: str, ttl_s: float) -> bool:
        st, _ = self._call(f"EXPIRE {key} {int(ttl_s * 1000)}")
        return st == "+"

    def claim(self, key: str, ttl_s: float) -> bool:
        """flag.claim (redis_types.py:118-131)."""
        st, body = self._call(f"CLAIM {key} {int(ttl_s * 1000)}")
        return body == b"1"

    def push(self, queue: str, value: bytes):
        self._call(f"PUSH {queue}", value)

    def pop(self, queue: str) -> Optional[bytes]:
        st, body = self._call(f"POP {queue}")
        return body if st == "$" else None

    def pop_iter(self, queue: str, max_items: int = 1 << 30):
        """queue.pop_iter (trainer.py:83-87 drain)."""
        for _ in range(max_items):
            v = self.pop(queue)
            if v is None:
                return
            yield v

    def qlen(self, queue: str) -> int:
        _, body = self._call(f"QLEN {queue}")
        return int(body)

    def keys(self, prefix: str = "") -> List[str]:
        _, body = self._call(f"KEYS {prefix}")
        return [k for k in body.decode().split("\n") if k]

    def save(self, path: str) -> bool:
        st, _ = self._call(f"SAVE {path}")
        return st == "+"


def server_binary() -> str:
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = os.path.join(repo, "build", "tetrikv")
    if not os.path.exists(path):
        subprocess.run(
            [os.path.join(repo, "native", "kvstore", "build.sh")], check=True)
    return path


def launch_server(port: int = 6399, wait: float = 5.0) -> subprocess.Popen:
    """Start tetrikv (the docker-compose 'redis' service analog)."""
    proc = subprocess.Popen([server_binary(), str(port)],
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    cli = KVClient(port=port)
    deadline = time.time() + wait
    while time.time() < deadline:
        if cli.ping():
            cli.close()
            return proc
        time.sleep(0.05)
    proc.kill()
    raise RuntimeError("tetrikv did not come up")

"""Cluster transports: in-process fake with fault injection + TCP.

Parity with tensor_chain's Transport trait (network.rs:929-943) and
MemoryTransport (network.rs:981-1283): send/broadcast/recv between named
peers, with partition sets, asymmetric inbound/outbound blocking,
probabilistic drops, and message corruption — the hooks the reference's
chaos/DST tests rely on. TcpTransport adds length-delimited framing over
sockets for real multi-process clusters (the TPU data plane uses ICI
collectives; this is the control plane).
"""

from __future__ import annotations

import json
import queue
import socket
import struct
import threading
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Set, Tuple

from neumann_tpu.utils.errors import ChainError


@dataclass
class Message:
    """Cluster message envelope; `kind` plays the role of the reference's
    Message enum variants (RequestVote/AppendEntries/TxPrepare/...)."""

    kind: str
    src: str
    dst: str
    payload: dict = field(default_factory=dict)

    def encode(self) -> bytes:
        return json.dumps({"k": self.kind, "s": self.src, "d": self.dst,
                           "p": self.payload}).encode("utf-8")

    @staticmethod
    def decode(buf: bytes) -> "Message":
        o = json.loads(buf.decode("utf-8"))
        return Message(o["k"], o["s"], o["d"], o["p"])


class TransportHub:
    """Shared switchboard for MemoryTransports (one per simulated node)."""

    def __init__(self, seed: int = 0):
        self._nodes: Dict[str, "MemoryTransport"] = {}
        self._lock = threading.RLock()
        # fault injection state
        self.partitions: List[Set[str]] = []
        self.blocked_inbound: Set[str] = set()
        self.blocked_outbound: Set[str] = set()
        self.drop_probability = 0.0
        self.corrupt_probability = 0.0
        import random

        self._rng = random.Random(seed)

    def register(self, node_id: str) -> "MemoryTransport":
        with self._lock:
            t = MemoryTransport(node_id, self)
            self._nodes[node_id] = t
            return t

    def peers(self) -> List[str]:
        with self._lock:
            return sorted(self._nodes)

    # -- fault injection -------------------------------------------------
    def partition(self, *groups: Set[str]) -> None:
        """Nodes can only talk within their group."""
        self.partitions = [set(g) for g in groups]

    def heal(self) -> None:
        self.partitions = []
        self.blocked_inbound.clear()
        self.blocked_outbound.clear()
        self.drop_probability = 0.0
        self.corrupt_probability = 0.0

    def _can_deliver(self, src: str, dst: str) -> bool:
        if src in self.blocked_outbound or dst in self.blocked_inbound:
            return False
        if self.partitions:
            for group in self.partitions:
                if src in group and dst in group:
                    break
            else:
                return False
        if self.drop_probability and \
                self._rng.random() < self.drop_probability:
            return False
        return True

    def deliver(self, msg: Message) -> bool:
        with self._lock:
            target = self._nodes.get(msg.dst)
        if target is None or not self._can_deliver(msg.src, msg.dst):
            return False
        if self.corrupt_probability and \
                self._rng.random() < self.corrupt_probability:
            msg = Message(msg.kind, msg.src, msg.dst,
                          {"__corrupted__": True})
        target._enqueue(msg)
        return True


class MemoryTransport:
    """In-process transport endpoint (one simulated node)."""

    def __init__(self, node_id: str, hub: TransportHub):
        self.node_id = node_id
        self.hub = hub
        self._queue: "queue.Queue[Message]" = queue.Queue()

    def _enqueue(self, msg: Message) -> None:
        self._queue.put(msg)

    def send(self, dst: str, kind: str, payload: dict) -> bool:
        return self.hub.deliver(Message(kind, self.node_id, dst, payload))

    def broadcast(self, kind: str, payload: dict) -> int:
        n = 0
        for peer in self.hub.peers():
            if peer != self.node_id and self.send(peer, kind, payload):
                n += 1
        return n

    def recv(self, timeout: Optional[float] = 0.0) -> Optional[Message]:
        try:
            if timeout == 0.0:
                return self._queue.get_nowait()
            return self._queue.get(timeout=timeout)
        except queue.Empty:
            return None

    def drain(self) -> List[Message]:
        out = []
        while True:
            m = self.recv()
            if m is None:
                return out
            out.append(m)


# ---------------------------------------------------------------------------
# TCP transport: length-delimited frames, background reader thread
# ---------------------------------------------------------------------------

_FRAME = struct.Struct("<I")
_MAX_FRAME = 64 * 1024 * 1024


class TcpTransport:
    """Point-to-point TCP control-plane transport.

    listen() accepts peers; connect() dials them; incoming messages go to
    the registered handler (or an internal queue). Framing: [len u32]
    [Message json]. Reconnects are the caller's concern (cluster layer
    retries on send failure).
    """

    def __init__(self, node_id: str, host: str = "127.0.0.1",
                 port: int = 0):
        self.node_id = node_id
        self._handler: Optional[Callable[[Message], None]] = None
        self._queue: "queue.Queue[Message]" = queue.Queue()
        self._conns: Dict[str, socket.socket] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.listen(16)
        self.address = self._sock.getsockname()
        self._accept_thread = threading.Thread(target=self._accept_loop,
                                               daemon=True)
        self._accept_thread.start()

    def on_message(self, handler: Callable[[Message], None]) -> None:
        self._handler = handler

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            threading.Thread(target=self._read_loop, args=(conn,),
                             daemon=True).start()

    def _read_loop(self, conn: socket.socket) -> None:
        try:
            while not self._stop.is_set():
                hdr = self._read_exact(conn, _FRAME.size)
                if hdr is None:
                    return
                (length,) = _FRAME.unpack(hdr)
                if length > _MAX_FRAME:
                    raise ChainError("oversized frame")
                body = self._read_exact(conn, length)
                if body is None:
                    return
                msg = Message.decode(body)
                if self._handler is not None:
                    self._handler(msg)
                else:
                    self._queue.put(msg)
        except (OSError, ChainError, json.JSONDecodeError):
            return
        finally:
            conn.close()

    @staticmethod
    def _read_exact(conn, n) -> Optional[bytes]:
        buf = b""
        while len(buf) < n:
            part = conn.recv(n - len(buf))
            if not part:
                return None
            buf += part
        return buf

    def connect(self, peer_id: str, address: Tuple[str, int]) -> None:
        s = socket.create_connection(address, timeout=5.0)
        with self._lock:
            self._conns[peer_id] = s

    def disconnect(self, peer_id: str) -> None:
        with self._lock:
            s = self._conns.pop(peer_id, None)
        if s is not None:
            s.close()

    def send(self, dst: str, kind: str, payload: dict) -> bool:
        with self._lock:
            s = self._conns.get(dst)
        if s is None:
            return False
        body = Message(kind, self.node_id, dst, payload).encode()
        try:
            s.sendall(_FRAME.pack(len(body)) + body)
            return True
        except OSError:
            self.disconnect(dst)
            return False

    def broadcast(self, kind: str, payload: dict) -> int:
        with self._lock:
            peers = list(self._conns)
        return sum(1 for p in peers if self.send(p, kind, payload))

    def recv(self, timeout: Optional[float] = 0.0) -> Optional[Message]:
        try:
            if timeout == 0.0:
                return self._queue.get_nowait()
            return self._queue.get(timeout=timeout)
        except queue.Empty:
            return None

    def close(self) -> None:
        self._stop.set()
        self._sock.close()
        with self._lock:
            for s in self._conns.values():
                s.close()
            self._conns.clear()

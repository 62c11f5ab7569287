"""Multi-host runtime: jax.distributed wiring, host health checking, and a
restartable serving supervisor.

The reference is strictly single-process (SURVEY.md §2.4: rayon threading is
the only parallelism; §5: failure detection/elastic recovery "Absent").
Serving a Llama-class model over N≥2 hosts (BASELINE.json config 5) needs
three pieces the reference never had, built here TPU-native:

1. ``init_distributed`` — one call per host wiring
   ``jax.distributed.initialize`` from explicit args or RTEN_* env vars;
   after it, ``jax.devices()`` spans all hosts and pjit/shard_map programs
   run collectives over ICI/DCN.
2. ``HeartbeatMonitor`` — a UDP heartbeat mesh between hosts (stdlib socket
   threads; no external deps). Inference has no optimizer state to lose, so
   the right recovery is detect-fast + restart-the-ring, not elastic
   training. The monitor reports peers whose heartbeats go stale.
3. ``ServingSupervisor`` — restartable serving: wraps an engine factory,
   snapshots session state (rten_tpu.serve.checkpoint) every N steps, and on
   failure (engine exception or peer death) rebuilds the engine from the
   last snapshot and resumes — in-flight requests keep their generated
   prefixes.
"""

from __future__ import annotations

import dataclasses
import json
import os
import socket
import threading
import time
from typing import Callable


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Initialize the JAX multi-host runtime (one call per host, before any
    device use). Arguments default to RTEN_COORDINATOR / RTEN_NUM_PROCESSES /
    RTEN_PROCESS_ID env vars (the reference's env-first config pattern,
    RTEN_NUM_THREADS src/threading.rs:46).

    Returns {"process_id", "num_processes", "local_devices", "global_devices"}.
    Safe to call in single-process mode (no coordinator): returns the
    single-host layout without touching jax.distributed."""
    import jax

    coordinator_address = coordinator_address or os.environ.get("RTEN_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("RTEN_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("RTEN_PROCESS_ID", "0"))

    if coordinator_address and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_id": process_id,
        "num_processes": num_processes,
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


@dataclasses.dataclass
class PeerState:
    address: tuple[str, int]
    last_seen: float = 0.0
    alive: bool = True


class HeartbeatMonitor:
    """UDP heartbeat mesh: every host broadcasts a beat to all peers each
    ``interval`` seconds and marks peers dead after ``timeout`` without one.

    Dead peers trigger ``on_peer_dead(peer_id)`` exactly once per transition
    (a peer that recovers and beats again is resurrected and can die again).
    """

    def __init__(
        self,
        host_id: int,
        listen_port: int,
        peers: dict[int, tuple[str, int]],
        *,
        interval: float = 0.5,
        timeout: float = 2.0,
        on_peer_dead: Callable[[int], None] | None = None,
        bind_address: str = "0.0.0.0",
        cluster_token: str | None = None,
    ) -> None:
        self.host_id = host_id
        self.interval = interval
        self.timeout = timeout
        self.on_peer_dead = on_peer_dead
        # Heartbeats are unauthenticated UDP on a trusted cluster network
        # (ICI/DCN fabric). A spoofed beat could mask a real peer failure, so
        # deployments on shared networks should set ``cluster_token`` (any
        # shared secret): beats carry it and non-matching datagrams are
        # ignored.
        self.cluster_token = cluster_token
        self.peers = {pid: PeerState(addr) for pid, addr in peers.items()}
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        # Bind all interfaces by default — a loopback bind would silently
        # drop beats from peers on OTHER hosts, defeating multi-host failure
        # detection (override via bind_address to pin an interface).
        self._sock.bind((bind_address, listen_port))
        self._sock.settimeout(0.2)
        self.port = self._sock.getsockname()[1]
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []

    def start(self) -> None:
        now = time.monotonic()
        for p in self.peers.values():
            p.last_seen = now
        for fn in (self._recv_loop, self._beat_loop, self._check_loop):
            t = threading.Thread(target=fn, daemon=True)
            t.start()
            self._threads.append(t)

    def stop(self) -> None:
        self._stop.set()
        for t in self._threads:
            t.join(timeout=2)
        self._sock.close()

    def alive_peers(self) -> list[int]:
        return [pid for pid, p in self.peers.items() if p.alive]

    def dead_peers(self) -> list[int]:
        return [pid for pid, p in self.peers.items() if not p.alive]

    # -- internals --------------------------------------------------------------

    def _beat_loop(self) -> None:
        beat = {"id": self.host_id}
        if self.cluster_token is not None:
            beat["token"] = self.cluster_token
        msg = json.dumps(beat).encode()
        while not self._stop.wait(self.interval):
            for p in self.peers.values():
                try:
                    self._sock.sendto(msg, p.address)
                except OSError:
                    pass

    def _recv_loop(self) -> None:
        while not self._stop.is_set():
            try:
                data, _ = self._sock.recvfrom(4096)
            except (socket.timeout, OSError):
                continue
            try:
                beat = json.loads(data.decode())
                pid = beat["id"]
            except (ValueError, KeyError):
                continue
            if self.cluster_token is not None and beat.get("token") != self.cluster_token:
                continue
            peer = self.peers.get(pid)
            if peer is not None:
                peer.last_seen = time.monotonic()
                peer.alive = True

    def _check_loop(self) -> None:
        while not self._stop.wait(self.interval):
            now = time.monotonic()
            for pid, p in self.peers.items():
                if p.alive and now - p.last_seen > self.timeout:
                    p.alive = False
                    if self.on_peer_dead:
                        self.on_peer_dead(pid)


class ServingSupervisor:
    """Restartable serving loop: snapshot every ``snapshot_every`` engine
    steps; on engine failure rebuild from the last snapshot and resume.

    ``engine_factory()`` must return a fresh ServingEngine (weights reloaded /
    re-sharded); restore is delegated to rten_tpu.serve.checkpoint.
    """

    def __init__(
        self,
        engine_factory: Callable[[], "object"],
        *,
        snapshot_every: int = 16,
        max_restarts: int = 3,
        snapshot_path: str | None = None,
    ) -> None:
        self.engine_factory = engine_factory
        self.snapshot_every = snapshot_every
        self.max_restarts = max_restarts
        self.snapshot_path = snapshot_path
        self.restarts = 0
        self.engine = engine_factory()
        self._snapshot = None

    def submit(self, request) -> None:
        self.engine.submit(request)

    def run(self) -> list:
        from rten_tpu.serve import checkpoint

        done: list = []
        steps_since_snapshot = 0
        while self.engine.has_work():
            try:
                done.extend(self.engine.step())
                steps_since_snapshot += 1
                if steps_since_snapshot >= self.snapshot_every:
                    self._snapshot = checkpoint.snapshot_engine(self.engine)
                    if self.snapshot_path:
                        checkpoint.save_snapshot(self._snapshot, self.snapshot_path)
                    steps_since_snapshot = 0
            except Exception:
                self.restarts += 1
                if self.restarts > self.max_restarts:
                    raise
                self.engine = self.engine_factory()
                snap = self._snapshot
                if snap is None and self.snapshot_path and os.path.exists(
                    self.snapshot_path
                ):
                    snap = checkpoint.load_snapshot(self.snapshot_path)
                if snap is not None:
                    checkpoint.restore_engine(self.engine, snap)
                steps_since_snapshot = 0
        return done

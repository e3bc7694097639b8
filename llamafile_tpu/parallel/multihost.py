"""Multi-host orchestration: jax.distributed bring-up + cross-host batching.

SURVEY.md §2.10 maps the reference's single-host request parallelism to a
cross-host continuous batcher over DCN. This module holds the host-level glue:

- `init_distributed()` wires jax.distributed from standard TPU pod env vars
  (or explicit coordinator args) so every host sees the global device set;
- `global_mesh()` builds a (dp=hosts*local_dp, tp) mesh whose tp axis stays
  within a host's ICI domain (collectives ride ICI, not DCN — the sharding
  rule from the scaling playbook);
- `HostShardedBatcher` partitions requests by host: every host runs its own
  local continuous batcher (single-chip or TP within its ICI domain), each
  request hashes to exactly one owner host (`owner_host`), and non-owned
  requests are forwarded to their owner over a JSON-lines TCP protocol (the
  DCN layer) with tokens streamed back. Model state never crosses DCN — only
  request/token traffic, the same decomposition the scaling playbook
  prescribes for serving (ICI for tensor collectives, DCN for data/request
  parallelism).

Single-host environments degrade gracefully (init is a no-op, mesh = local,
all requests are owned locally). The unit suite exercises the full
forward-and-stream path with two local processes on the CPU backend.
"""
from __future__ import annotations

import dataclasses
import json
import os
import queue
import socket
import threading
from typing import List, Optional

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running on a multi-host slice.

    Returns True if distributed mode is active. Env-driven on TPU pods
    (jax.distributed.initialize autodetects); explicit args for DCN clusters.
    """
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if coordinator or (num_processes or 0) > 1:
        # explicitly configured: a failure here is a broken pod, not a
        # single-host run — raise instead of silently degrading
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return True
    if os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        try:
            jax.distributed.initialize()
        except Exception as e:           # env-sniffed: warn, fall back
            import logging
            logging.getLogger(__name__).warning(
                "multi-host env vars present but jax.distributed.initialize "
                "failed (%s) — continuing single-host", e)
            return False
        return jax.process_count() > 1
    return jax.process_count() > 1


def global_mesh(tp_per_host: Optional[int] = None) -> Mesh:
    """dp x tp mesh: tp confined to each host's local (ICI-connected) devices,
    dp spanning hosts (DCN) and any leftover local parallelism."""
    devices = jax.devices()
    n_local = max(1, jax.local_device_count())
    tp = tp_per_host or n_local
    tp = min(tp, n_local)
    dp = len(devices) // tp
    # order devices host-major so each tp group is intra-host
    devs = sorted(devices, key=lambda d: (d.process_index, d.id))
    arr = np.asarray(devs).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def owner_host(request_key: str, n_hosts: Optional[int] = None) -> int:
    """Stable request -> host partitioning for the cross-host batcher."""
    import hashlib
    n = n_hosts if n_hosts is not None else max(1, jax.process_count())
    h = int(hashlib.sha1(request_key.encode()).hexdigest()[:8], 16)
    return h % n


def is_mine(request_key: str) -> bool:
    return owner_host(request_key) == jax.process_index()


# ---------------------------------------------------------------------------
# Cross-host request partitioning (DCN layer)
# ---------------------------------------------------------------------------

def _sp_to_wire(sp) -> dict:
    d = dataclasses.asdict(sp)
    d["logit_bias"] = [list(p) for p in d.get("logit_bias", ())]
    return d


def _sp_from_wire(d: dict):
    from ..runtime.sampling import SamplingParams
    d = dict(d)
    d["logit_bias"] = tuple((int(t), float(x))
                            for t, x in d.get("logit_bias", []))
    return SamplingParams(**d)


class _RemoteRequest:
    """Facade matching server.batcher.Request's consumer surface (out queue +
    cooperative stop) for a request executing on another host."""

    def __init__(self):
        self.out: "queue.Queue" = queue.Queue()
        self.stop = False


class HostShardedBatcher:
    """Cross-host continuous batcher: local Batcher + request forwarding.

    peers: one "host:port" per host, indexed by host id; this host binds
    peers[host_id] and serves forwarded requests from other hosts. submit()
    hashes the request to its owner (stable across hosts) and either admits
    it into the local batcher or streams it from the owner over TCP.

    Replaces the reference's single-node request parallelism (worker threads
    over one llama context, SURVEY §2.10): here each host owns an independent
    model replica + KV pool, and only request/token bytes cross DCN.
    """

    def __init__(self, engine, peers: List[str], host_id: Optional[int] = None,
                 rows: int = 4, paged: Optional[bool] = None):
        from ..server.batcher import Batcher
        self.host_id = (host_id if host_id is not None
                        else jax.process_index())
        self.peers = list(peers)
        self.n_hosts = len(peers)
        self.batcher = Batcher(engine, rows=rows, paged=paged)
        self.stats = {"local": 0, "forwarded": 0, "served_remote": 0}
        self._stop = False
        host, port = self.peers[self.host_id].rsplit(":", 1)
        self._lsock = socket.create_server((host, int(port)))
        self._lsock.settimeout(0.5)
        self._lthread = threading.Thread(target=self._serve, daemon=True)
        self._lthread.start()

    # -- public API ----------------------------------------------------------

    def submit(self, ids, sp, max_tokens: int, key: Optional[str] = None):
        """Route a request to its owner host; returns an object with the
        Request consumer surface (.out queue of ("token", id) / ("done",
        reason), .stop)."""
        rkey = key if key is not None else ",".join(map(str, ids))
        owner = owner_host(rkey, self.n_hosts)
        if owner == self.host_id:
            self.stats["local"] += 1
            return self.batcher.submit(list(ids), sp, max_tokens)
        self.stats["forwarded"] += 1
        req = _RemoteRequest()
        threading.Thread(target=self._stream_from, daemon=True,
                         args=(owner, ids, sp, max_tokens, req)).start()
        return req

    def shutdown(self, broadcast: bool = False):
        """Stop the local batcher + listener; with broadcast=True also ask
        every peer to shut down (coordinator-initiated teardown)."""
        if broadcast:
            for h in range(self.n_hosts):
                if h == self.host_id:
                    continue
                try:
                    with self._connect(h) as s:
                        s.sendall(b'{"op": "shutdown"}\n')
                except OSError:
                    pass
        self._stop = True
        self.batcher.shutdown()
        try:
            self._lsock.close()
        except OSError:
            pass
        self._lthread.join(timeout=5)

    def wait(self, timeout: Optional[float] = None):
        """Block until a peer's shutdown broadcast stops this host."""
        self._lthread.join(timeout=timeout)

    # -- DCN wire (JSON lines over TCP) ---------------------------------------

    def _connect(self, host: int) -> socket.socket:
        h, p = self.peers[host].rsplit(":", 1)
        return socket.create_connection((h, int(p)), timeout=600)

    def _stream_from(self, owner: int, ids, sp, max_tokens,
                     req: _RemoteRequest):
        try:
            with self._connect(owner) as s:
                s.sendall((json.dumps({
                    "op": "generate", "ids": list(map(int, ids)),
                    "sp": _sp_to_wire(sp), "max_tokens": int(max_tokens),
                }) + "\n").encode())
                f = s.makefile("r")
                for line in f:
                    if req.stop:
                        break
                    msg = json.loads(line)
                    if "t" in msg:
                        req.out.put(("token", int(msg["t"])))
                    else:
                        req.out.put(("done", msg.get("done", "stop")))
                        return
            req.out.put(("done", "error"))
        except OSError:
            req.out.put(("done", "error"))

    def _serve(self):
        while not self._stop:
            try:
                conn, _addr = self._lsock.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            threading.Thread(target=self._handle, args=(conn,),
                             daemon=True).start()

    def _handle(self, conn: socket.socket):
        try:
            with conn:
                f = conn.makefile("r")
                msg = json.loads(f.readline())
                if msg.get("op") == "shutdown":
                    self._stop = True
                    self.batcher.shutdown()
                    try:
                        self._lsock.close()
                    except OSError:
                        pass
                    return
                self.stats["served_remote"] += 1
                req = self.batcher.submit(msg["ids"], _sp_from_wire(msg["sp"]),
                                          int(msg["max_tokens"]))
                while True:
                    kind, val = req.out.get()
                    if kind == "token":
                        conn.sendall((json.dumps({"t": int(val)}) + "\n")
                                     .encode())
                    else:
                        conn.sendall((json.dumps({"done": val}) + "\n")
                                     .encode())
                        return
        except (OSError, ValueError):
            pass

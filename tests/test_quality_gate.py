"""Quantization quality gate plumbing: HF build -> convert -> quantize ->
decode-path NLL/KL comparison must run end-to-end and produce sane metrics.

The committed QUALITY_r*.json artifact comes from the full-scale run
(scripts/quality_gate.py on TPU); this test keeps the pipeline honest at
micro scale. Reference analog: perplexity --kl-divergence
(llamafile-files/perplexity/perplexity.1)."""
import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

pytest.importorskip("torch")
pytest.importorskip("transformers")


def test_quality_gate_micro(tmp_path):
    out = tmp_path / "q.json"
    r = subprocess.run(
        [sys.executable, "scripts/quality_gate.py", "--micro",
         "--windows", "2", "--ctx", "64", "--out", str(out)],
        capture_output=True, text=True, cwd=".", timeout=900,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(out.read_text())
    assert set(res["ppl"]) == {"f16", "q4k_planes", "q4k_txn"}
    for v in res["mean_kl_vs_f16"].values():
        assert 0.0 <= v < 1.0          # distributions stay close
    for v in res["top1_agree_vs_f16"].values():
        assert v > 0.1
    assert "pass" in res["gate"]

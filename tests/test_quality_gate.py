"""Quantization quality gate plumbing: pure-JAX train -> GGUF export ->
quantize -> decode-path NLL/KL comparison must run end-to-end and produce
sane metrics, for both the dense and the routed-MoE decode paths.

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


def _run_gate(out, extra):
    return subprocess.run(
        [sys.executable, "scripts/quality_gate.py", "--micro",
         "--windows", "2", "--ctx", "64", "--steps", "40",
         "--out", str(out)] + extra,
        capture_output=True, text=True, cwd=".", timeout=900,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})


@pytest.mark.parametrize("variant", ["dense", "moe"])
def test_quality_gate_micro(tmp_path, variant):
    out = tmp_path / "q.json"
    r = _run_gate(out, ["--moe"] if variant == "moe" else [])
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(out.read_text())
    assert set(res["ppl"]) == {"f16", "q4k_planes", "q4k_txn", "q4k_i8p"}
    assert res["trained_steps"] == 40
    # trainer and framework agree on the exported F16 (semantic parity)
    assert abs(res["trainer_vs_f16_nll_delta"]) < 0.03
    for v in res["mean_kl_vs_f16"].values():
        assert 0.0 <= v < 1.0          # distributions stay close
    for v in res["top1_agree_vs_f16"].values():
        assert v > 0.8                 # trained logits are peaked
    assert "pass" in res["gate"]
    # micro scale doesn't gate the 0.01-nat bar (tiny models genuinely
    # lose more to Q4_K); the bar is asserted on the full-scale artifact


def test_quality_gate_untrained_path(tmp_path):
    """Legacy random-init HF-convert path still works (also exercises
    tools/convert_hf.py inside the gate)."""
    pytest.importorskip("torch")
    pytest.importorskip("transformers")
    out = tmp_path / "q.json"
    r = _run_gate(out, ["--untrained"])
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(out.read_text())
    assert res["trained_steps"] == 0
    assert "pass" in res["gate"]

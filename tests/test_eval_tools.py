"""Evaluation tool modes: hellaswag / winogrande / KL-divergence end-to-end.

Reference: llamafile-perplexity with the upstream perplexity.cpp modes
(SURVEY.md §2.7). Tiny random model; we assert the tools run their full path
and produce sane JSON, and that KL(base||base) == 0.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

import tests.conftest  # noqa: F401

from tests.util_models import make_tiny_llama_gguf

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    p = subprocess.run([sys.executable, os.path.join(REPO, "tools",
                                                     "perplexity.py")] + args,
                       capture_output=True, text=True, timeout=900, env=env)
    assert p.returncode == 0, p.stderr[-2000:]
    return json.loads(p.stdout.strip().splitlines()[-1])


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("m") / "t.gguf"
    make_tiny_llama_gguf(str(path))
    return str(path)


def test_hellaswag_mode(model, tmp_path):
    tasks = tmp_path / "hs.txt"
    lines = []
    for i in range(3):
        lines += [f"the context sentence {i}", str(i % 4),
                  "ending one", "ending two", "ending three", "ending four"]
    tasks.write_text("\n".join(lines) + "\n")
    out = _run(["-m", model, "--hellaswag", str(tasks), "-c", "128",
                "--json"])
    assert out["tasks"] == 3
    assert 0.0 <= out["hellaswag_acc"] <= 100.0


def test_multiple_choice_mode(model, tmp_path):
    import json
    jf = tmp_path / "mc.jsonl"
    rows = [{"question": f"question number {i} is about",
             "choices": ["alpha beta", "gamma", "delta epsilon zeta"],
             "answer": i % 3} for i in range(3)]
    jf.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    out = _run(["-m", model, "--multiple-choice", str(jf), "-c", "128",
                "--json"])
    assert out["tasks"] == 3
    assert 0.0 <= out["multiple_choice_acc"] <= 100.0


def test_winogrande_mode(model, tmp_path):
    csvf = tmp_path / "wg.csv"
    csvf.write_text(
        'the trophy would not fit in the case because _ was too big,'
        'the trophy,the case,1\n'
        'the man could not lift his son because _ was so weak,'
        'the man,the son,1\n')
    out = _run(["-m", model, "--winogrande", str(csvf), "-c", "128",
                "--json"])
    assert out["tasks"] == 2
    assert 0.0 <= out["winogrande_acc"] <= 100.0


def test_kl_divergence_self_is_zero(model, tmp_path):
    text = tmp_path / "t.txt"
    text.write_text("the quick brown fox jumps over the lazy dog " * 40)
    base = tmp_path / "base.npz"
    out1 = _run(["-m", model, "-f", str(text), "-c", "64", "--max-chunks",
                 "2", "--save-logits", str(base), "--json"])
    assert out1["ppl"] > 0
    out2 = _run(["-m", model, "-f", str(text), "-c", "64", "--max-chunks",
                 "2", "--kl-divergence", str(base), "--json"])
    # f16-stored log-probs: KL(base||base) within storage rounding
    assert abs(out2["kl_divergence"]) < 1e-3, out2
    assert out2["same_top1"] == 1.0

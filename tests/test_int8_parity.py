"""int8-MXU activation-quant kernel: perplexity parity gate.

VERDICT r1 action #1: the int8 path (Q8_K-analog on-the-fly activation
quantization, reference iqk_mul_mat.inc:182 / tinyblas_cpu_sgemm.inc:286-322)
must not move perplexity. The reference itself int8-quantizes activations
per-256 block; ours quantizes per-32 (strictly finer), so parity is expected.
Kernel selection is module-level (env), hence the subprocess harness.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

import tests.conftest  # noqa: F401

SCRIPT = r"""
import json, sys
import numpy as np
sys.path.insert(0, "@REPO@")
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from llamafile_tpu.models.loader import load_llama
from llamafile_tpu.models.llama import forward, init_cache

cfg, params, tok, _ = load_llama("@MODEL@")
ids = np.asarray([(i * 37 + 11) % cfg.n_vocab for i in range(48)], np.int32)
cache = init_cache(cfg, 1, 64)
logits, _ = forward(params, cfg, jnp.asarray(ids[None]),
                    jnp.zeros((1,), jnp.int32), cache)
logp = jax.nn.log_softmax(np.asarray(logits[0], np.float32), axis=-1)
nll = -logp[np.arange(47), ids[1:]]
print(json.dumps({"nll": float(nll.mean())}))
"""


def test_int8_kernel_ppl_parity(tmp_path):
    from tests.util_models import make_tiny_llama_gguf
    model = str(tmp_path / "t.gguf")
    make_tiny_llama_gguf(model, d_model=256, n_layers=2, n_heads=4,
                         n_kv_heads=2, d_ff=512, quant="Q4_K")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = SCRIPT.replace("@REPO@", repo).replace("@MODEL@", model)
    out = {}
    for kern in ("planes", "int8", "txn"):
        env = dict(os.environ, LLAMAFILE_TPU_Q4B=kern, JAX_PLATFORMS="cpu")
        p = subprocess.run([sys.executable, "-c", script], env=env,
                           capture_output=True, text=True, timeout=600)
        assert p.returncode == 0, p.stderr[-2000:]
        out[kern] = json.loads(p.stdout.strip().splitlines()[-1])["nll"]
    # mean-NLL shift under activation int8: must stay well under typical
    # quantization-format deltas (reference accepts Q8_K activation error)
    assert abs(out["int8"] - out["planes"]) < 0.05, out
    assert abs(out["txn"] - out["planes"]) < 0.05, out

"""Tokenizer + chat template tests (SPM byte-fallback, BPE, template sniffing)."""
import numpy as np

from llamafile_tpu.runtime.chat import apply_chat_template, detect_dialect
from llamafile_tpu.runtime.tokenizer import Tokenizer


def spm_meta():
    tokens = ["<unk>", "<s>", "</s>"] + [f"<0x{b:02X}>" for b in range(256)]
    # a realistic merge lattice: single chars + intermediates + words
    extra = {"h": -20, "e": -20, "l": -20, "o": -20, "w": -20, "r": -20,
             "d": -20, "▁": -10, "he": -5, "ll": -5, "llo": -6, "▁he": -4,
             "▁hello": -1, "▁w": -4, "or": -5, "ld": -5, "▁wor": -4.5,
             "▁world": -1}
    tokens += list(extra)
    types = [2, 3, 3] + [6] * 256 + [1] * len(extra)
    scores = [0.0] * 259 + list(extra.values())
    return {
        "tokenizer.ggml.model": "llama",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.scores": np.asarray(scores, np.float32),
        "tokenizer.ggml.token_type": np.asarray(types, np.int32),
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
        "tokenizer.ggml.add_bos_token": True,
    }


def test_spm_merges_best_score():
    tok = Tokenizer(spm_meta())
    ids = tok.encode("hello world", add_bos=False)
    # "▁hello" and "▁world" have the best scores -> 2 tokens
    assert [tok.tokens[i] for i in ids] == ["▁hello", "▁world"]


def test_spm_byte_fallback_roundtrip():
    tok = Tokenizer(spm_meta())
    text = "héllo ☃"
    ids = tok.encode(text, add_bos=False)
    assert tok.decode(ids) == " " + text  # add_space_prefix inserts leading space


def test_bos_added_once():
    tok = Tokenizer(spm_meta())
    ids = tok.encode("hello")
    assert ids[0] == 1 and ids.count(1) == 1


def test_special_token_splitting():
    meta = spm_meta()
    meta["tokenizer.ggml.tokens"] = list(meta["tokenizer.ggml.tokens"]) + ["<|eot|>"]
    meta["tokenizer.ggml.token_type"] = np.append(meta["tokenizer.ggml.token_type"], 3)
    meta["tokenizer.ggml.scores"] = np.append(meta["tokenizer.ggml.scores"], 0.0)
    tok = Tokenizer(meta)
    ids = tok.encode("hello<|eot|>world", add_bos=False)
    eot = tok.vocab["<|eot|>"]
    assert eot in ids


def bpe_meta():
    # tiny GPT-2-style vocab
    toks = ["h", "e", "l", "o", "w", "r", "d", "Ġ", "he", "ll", "hell",
            "hello", "Ġw", "Ġwo", "Ġwor", "Ġworld", "<|endoftext|>"]
    merges = ["h e", "l l", "he ll", "hell o", "Ġ w", "Ġw o", "Ġwo r", "Ġwor l d",
              "Ġworl d"]
    # note: merges applied by rank over characters
    return {
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.tokens": toks,
        "tokenizer.ggml.merges": merges,
        "tokenizer.ggml.bos_token_id": 16,
        "tokenizer.ggml.eos_token_id": 16,
        "tokenizer.ggml.token_type": np.asarray([1] * 16 + [3], np.int32),
        "tokenizer.ggml.add_bos_token": False,
    }


def test_bpe_basic():
    tok = Tokenizer(bpe_meta())
    ids = tok.encode("hello", add_bos=False)
    assert [tok.tokens[i] for i in ids] == ["hello"]
    assert tok.decode(ids) == "hello"


def test_bpe_space_prefix():
    tok = Tokenizer(bpe_meta())
    ids = tok.encode("hello world", add_bos=False)
    text = tok.decode(ids)
    assert text == "hello world"


def test_eog_detection():
    tok = Tokenizer(spm_meta())
    assert tok.is_eog(2)
    assert not tok.is_eog(5)


# -- chat templates ---------------------------------------------------------

MSGS = [{"role": "system", "content": "be brief"},
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": "hello"},
        {"role": "user", "content": "bye"}]


def test_dialect_detection():
    assert detect_dialect("{{... <|im_start|> ...}}") == "chatml"
    assert detect_dialect("<|start_header_id|>...") == "llama3"
    assert detect_dialect("[INST] <<SYS>> ... [/INST]") == "llama2"
    assert detect_dialect("[INST] x [/INST]") == "mistral"
    assert detect_dialect("<start_of_turn>") == "gemma"
    assert detect_dialect(None) == "chatml"


def test_llama3_template():
    out = apply_chat_template(MSGS, dialect="llama3")
    assert out.count("<|start_header_id|>") == 5  # 4 messages + assistant cue
    assert out.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")


def test_chatml_template():
    out = apply_chat_template(MSGS, dialect="chatml")
    assert out.count("<|im_start|>") == 5
    assert "be brief" in out and out.endswith("<|im_start|>assistant\n")


def test_llama2_template_sys_folded():
    out = apply_chat_template(MSGS, dialect="llama2")
    assert "<<SYS>>\nbe brief\n<</SYS>>" in out
    assert out.count("[INST]") == 2

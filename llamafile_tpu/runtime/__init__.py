"""Runtime: engine, KV cache, tokenizer, sampling (llamafile L4 analog)."""

"""Model architectures (GGUF arch registry): llama family, MoE, vision."""

"""Cross-cutting utilities: flags, logging, tracing (llamafile support layer)."""

"""HTTP serving layer: slots, prefix cache, OpenAI-compatible endpoints
(llamafiler analog — reference llamafile/server/, SURVEY.md §2.5)."""

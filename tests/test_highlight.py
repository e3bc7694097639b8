"""Syntax highlighter tests (llamafile/highlight analog)."""
from llamafile_tpu.utils.highlight import StreamHighlighter, highlight_code, KEYWORD


def test_keyword_coloring():
    out = highlight_code("def foo(): return 1", "python")
    assert KEYWORD + "def" in out and KEYWORD + "return" in out


def test_unknown_lang_passthrough():
    assert highlight_code("def x", "klingon") == "def x"


def test_stream_fenced_block():
    hl = StreamHighlighter()
    text = "look:\n```python\ndef f():\n    return 'hi'\n```\ndone"
    out = ""
    for piece in [text[i:i+7] for i in range(0, len(text), 7)]:
        out += hl.feed(piece)
    out += hl.flush()
    assert KEYWORD + "def" in out
    assert out.startswith("look:")
    assert "done" in out


def test_stream_no_color_outside_fence():
    hl = StreamHighlighter()
    out = hl.feed("return of the jedi") + hl.flush()
    assert out == "return of the jedi"

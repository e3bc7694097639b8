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


def test_every_language_has_working_lexer():
    """Per-language coverage (reference ships 46 lexers; we cover 48):
    keywords colorize, numbers colorize, comments (when the language has
    them) colorize in their own style."""
    from llamafile_tpu.utils.highlight import (KEYWORD, COMMENT, NUMBER,
                                               get_spec, highlight_code,
                                               supported_languages)
    assert len(supported_languages()) >= 46
    for lang in supported_languages():
        spec = get_spec(lang)
        if spec.keywords:
            kw = sorted(spec.keywords)[0]
            assert KEYWORD in highlight_code(f"x {kw} y", lang), lang
        assert NUMBER in highlight_code("a 123 b", lang), lang
        for lc in spec.line_comments:
            assert COMMENT in highlight_code(f"{lc} note\n", lang), (lang, lc)
        for a, b in spec.block_comments:
            assert COMMENT in highlight_code(f"{a} note {b}", lang), (lang, a)


def test_aliases_resolve():
    from llamafile_tpu.utils.highlight import _ALIASES, get_spec
    for alias in _ALIASES:
        assert get_spec(alias) is not None, alias

"""ANSI syntax highlighting for terminal chat output.

Lightweight analog of llamafile/highlight/ (reference: 40+ gperf-table lexers
feeding the chatbot's streaming output). One generic keyword/string/comment
lexer parameterized per language, applied to fenced code blocks; plain
markdown emphasis elsewhere. Streaming-safe: feed() accepts partial text.
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional

RESET = "\x1b[0m"
BOLD = "\x1b[1m"
KEYWORD = "\x1b[35m"
STRING = "\x1b[32m"
COMMENT = "\x1b[90m"
NUMBER = "\x1b[33m"
TYPE = "\x1b[36m"

_KW: Dict[str, set] = {
    "python": set("def class return if elif else for while import from as with "
                  "try except finally lambda yield pass break continue in is "
                  "not and or None True False async await raise global "
                  "nonlocal del assert match case".split()),
    "c": set("int char long short float double void unsigned signed struct "
             "union enum typedef static extern const volatile return if else "
             "for while do switch case break continue goto sizeof inline".split()),
    "javascript": set("function var let const return if else for while do "
                      "switch case break continue new delete typeof "
                      "instanceof in of class extends super this null "
                      "undefined true false async await yield import export "
                      "default try catch finally throw".split()),
    "rust": set("fn let mut const static struct enum trait impl for while "
                "loop if else match return use mod pub crate self super "
                "where async await move ref box dyn type unsafe extern".split()),
    "go": set("func var const type struct interface map chan go defer return "
              "if else for range switch case break continue package import "
              "select fallthrough goto nil true false".split()),
    "shell": set("if then else elif fi for while do done case esac function "
                 "return exit echo cd export local readonly set unset".split()),
    "sql": set(w.lower() for w in
               "SELECT FROM WHERE INSERT INTO VALUES UPDATE SET DELETE CREATE "
               "TABLE DROP ALTER INDEX JOIN LEFT RIGHT INNER OUTER ON AS AND "
               "OR NOT NULL PRIMARY KEY FOREIGN REFERENCES GROUP BY ORDER "
               "LIMIT".split()),
}
_ALIASES = {"py": "python", "js": "javascript", "ts": "javascript",
            "cpp": "c", "cc": "c", "h": "c", "cxx": "c", "c++": "c",
            "bash": "shell", "sh": "shell", "zsh": "shell", "golang": "go"}

_TOKEN_RE = re.compile(
    r"(?P<comment>#[^\n]*|//[^\n]*|/\*.*?\*/)|"
    r"(?P<string>\"(?:\\.|[^\"\\])*\"|'(?:\\.|[^'\\])*')|"
    r"(?P<number>\b\d+(?:\.\d+)?\b)|"
    r"(?P<word>\b\w+\b)", re.S)


def highlight_code(code: str, lang: Optional[str]) -> str:
    kws = _KW.get(_ALIASES.get((lang or "").lower(), (lang or "").lower()))
    if kws is None:
        return code

    def repl(m: re.Match) -> str:
        if m.group("comment"):
            return f"{COMMENT}{m.group(0)}{RESET}"
        if m.group("string"):
            return f"{STRING}{m.group(0)}{RESET}"
        if m.group("number"):
            return f"{NUMBER}{m.group(0)}{RESET}"
        w = m.group("word")
        if w in kws or w.lower() in kws:
            return f"{KEYWORD}{w}{RESET}"
        return w

    return _TOKEN_RE.sub(repl, code)


class StreamHighlighter:
    """Streaming markdown-ish highlighter: colorize fenced code blocks.

    feed(piece) returns text to print (may buffer partial fence markers)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.buf = ""
        self.in_code = False
        self.lang: Optional[str] = None

    def feed(self, piece: str) -> str:
        if not self.enabled:
            return piece
        self.buf += piece
        out = []
        while True:
            idx = self.buf.find("```")
            if idx < 0:
                # keep a possible partial fence in the buffer
                keep = 0
                for k in (2, 1):
                    if self.buf.endswith("`" * k):
                        keep = k
                        break
                emit, self.buf = self.buf[: len(self.buf) - keep], \
                    self.buf[len(self.buf) - keep:]
                out.append(highlight_code(emit, self.lang) if self.in_code else emit)
                return "".join(out)
            head, rest = self.buf[:idx], self.buf[idx + 3:]
            out.append(highlight_code(head, self.lang) if self.in_code else head)
            if self.in_code:
                self.in_code = False
                self.lang = None
                out.append("```")
                self.buf = rest
            else:
                nl = rest.find("\n")
                if nl < 0:      # language line not complete yet
                    self.buf = "```" + rest
                    return "".join(out)
                self.lang = rest[:nl].strip() or None
                self.in_code = True
                out.append("```" + rest[: nl + 1])
                self.buf = rest[nl + 1:]

    def flush(self) -> str:
        emit = highlight_code(self.buf, self.lang) if self.in_code else self.buf
        self.buf = ""
        return emit

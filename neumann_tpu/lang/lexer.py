"""Hand-written lexer with source positions.

Mirrors neumann_parser/src/lexer.rs in capability: case-insensitive
keywords (kept as uppercase `KW` tokens), single-quoted strings with ''
escapes, numbers (int/float/scientific), vector literals are handled at
parse level from '[' tokens, punctuation including -> arrows.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

from neumann_tpu.utils.errors import ParseError

PUNCT = (
    "->", "<=", ">=", "!=", "<>", "(", ")", "[", "]", "{", "}", ",", ":",
    ";", "=", "<", ">", "*", ".", "+", "-", "/", "%",
)


@dataclass(frozen=True)
class Token:
    kind: str   # "ident" | "string" | "number" | "punct" | "eof"
    text: str
    value: object
    line: int
    col: int

    def upper(self) -> str:
        return self.text.upper() if self.kind == "ident" else self.text


def tokenize(src: str) -> List[Token]:
    toks: List[Token] = []
    i = 0
    line = 1
    col = 1
    n = len(src)

    def advance(k: int):
        nonlocal i, line, col
        for _ in range(k):
            if i < n and src[i] == "\n":
                line += 1
                col = 1
            else:
                col += 1
            i += 1

    while i < n:
        ch = src[i]
        if ch in " \t\r\n":
            advance(1)
            continue
        if ch == "-" and src.startswith("--", i):
            while i < n and src[i] != "\n":
                advance(1)
            continue
        if ch == "'":
            start_line, start_col = line, col
            advance(1)
            buf = []
            while True:
                if i >= n:
                    raise ParseError("unterminated string", start_line,
                                     start_col)
                if src[i] == "'":
                    if i + 1 < n and src[i + 1] == "'":
                        buf.append("'")
                        advance(2)
                        continue
                    advance(1)
                    break
                buf.append(src[i])
                advance(1)
            toks.append(Token("string", "".join(buf), "".join(buf),
                              start_line, start_col))
            continue
        if ch.isdigit() or (ch == "." and i + 1 < n and src[i + 1].isdigit()):
            start_line, start_col = line, col
            j = i
            seen_dot = seen_e = False
            while j < n:
                c = src[j]
                if c.isdigit():
                    j += 1
                elif c == "." and not seen_dot and not seen_e:
                    seen_dot = True
                    j += 1
                elif c in "eE" and not seen_e and j > i:
                    seen_e = True
                    j += 1
                    if j < n and src[j] in "+-":
                        j += 1
                else:
                    break
            text = src[i:j]
            try:
                value = float(text) if (seen_dot or seen_e) else int(text)
            except ValueError as e:
                raise ParseError(f"bad number {text!r}", start_line,
                                 start_col) from e
            advance(j - i)
            toks.append(Token("number", text, value, start_line, start_col))
            continue
        if ch.isalpha() or ch == "_":
            start_line, start_col = line, col
            j = i
            while j < n and (src[j].isalnum() or src[j] == "_"):
                j += 1
            text = src[i:j]
            advance(j - i)
            toks.append(Token("ident", text, text, start_line, start_col))
            continue
        matched = None
        for p in PUNCT:
            if src.startswith(p, i):
                matched = p
                break
        if matched is None:
            raise ParseError(f"unexpected character {ch!r}", line, col)
        toks.append(Token("punct", matched, matched, line, col))
        advance(len(matched))
    toks.append(Token("eof", "", None, line, col))
    return toks

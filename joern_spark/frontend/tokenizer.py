"""Regex tokenizer for the C/Java fixture subset. Deterministic, position-aware."""

from __future__ import annotations

import re
from typing import NamedTuple

KEYWORDS = {
    # C
    "if", "else", "while", "do", "for", "switch", "case", "default", "break",
    "continue", "goto", "return", "struct", "union", "enum", "typedef",
    "sizeof", "static", "const", "unsigned", "signed", "void", "int", "char",
    "short", "long", "float", "double",
    # Java
    "class", "interface", "extends", "implements", "public", "private",
    "protected", "final", "abstract", "new", "this", "super", "boolean",
    "byte", "String", "null", "true", "false", "try", "catch", "finally",
    "throw", "throws", "import", "package", "instanceof",
    # C++ subset
    "delete",
}

TYPE_KEYWORDS = {
    "void", "int", "char", "short", "long", "float", "double", "unsigned",
    "signed", "const", "static", "struct", "union", "enum", "boolean", "byte",
    "String", "final",
}

# multi-char operators first (longest match wins)
_OPERATORS = [
    "===", "!==", "=>", "??=",
    "<<=", ">>=", "...", "->", "++", "--", "<<", ">>", "<=", ">=", "==", "!=",
    "&&", "||", "+=", "-=", "*=", "/=", "%=", "&=", "|=", "^=", "?", ":",
    "+", "-", "*", "/", "%", "<", ">", "=", "!", "&", "|", "^", "~", ".", ",",
    ";", "(", ")", "{", "}", "[", "]", "@",
]

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>//[^\n]*|/\*.*?\*/)
  | (?P<pp>\#[^\n]*)
  | (?P<num>0[xX][0-9a-fA-F]+[uUlL]*|\d+\.\d+[fF]?|\d+[uUlL]*[fF]?)
  | (?P<str>"(?:\\.|[^"\\])*")
  | (?P<char>'(?:\\.|[^'\\])*')
  | (?P<tmpl>`(?:\\.|[^`\\])*`)
  | (?P<ident>\$?[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>%s)
    """
    % "|".join(re.escape(o) for o in _OPERATORS),
    re.VERBOSE | re.DOTALL,
)


class Token(NamedTuple):
    # NamedTuple, not frozen dataclass: tokenization creates one of these per
    # token and the frozen-dataclass __init__ (4 object.__setattr__ calls)
    # was a measurable share of the parse floor
    kind: str  # ident | kw | num | str | char | op
    text: str
    pos: int  # char offset into the concatenated code text
    line: int


def tokenize(text: str, comments: list[Token] | None = None) -> list[Token]:
    """``comments`` (optional out-param): collects the skipped // and /* */
    runs as Tokens so frontends can emit COMMENT nodes
    (reference NodeTypeStarters.comment; c2cpg AstCreator comment nodes)."""
    tokens: list[Token] = []
    line = 1
    i = 0
    n = len(text)
    while i < n:
        m = _TOKEN_RE.match(text, i)
        if m is None:
            # unknown char: skip deterministically
            if text[i] == "\n":
                line += 1
            i += 1
            continue
        kind = m.lastgroup
        tok_text = m.group()
        if kind in ("ws", "comment", "pp"):
            if kind == "comment" and comments is not None:
                comments.append(Token("comment", tok_text, m.start(), line))
            line += tok_text.count("\n")
            i = m.end()
            continue
        if kind == "ident" and tok_text in KEYWORDS:
            kind = "kw"
        tokens.append(Token(kind, tok_text, m.start(), line))
        line += tok_text.count("\n")
        i = m.end()
    return tokens

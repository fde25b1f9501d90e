"""Code-language detection for extracted ``code`` spans.

Behavior contract rebuilt from the reference
(``docling/utils/code_language.py:196`` ``detect_code_language``): an
explicit hint (markdown fence token, HTML ``language-*`` class) is
trusted first; content detection commits only on a high-precision marker
and an ambiguous snippet stays ``"unknown"`` — downstream consumers treat
the label as authoritative, so a wrong guess is worse than none.

This is an independent implementation: its own alias table and marker
rules (one distinctive signal per language), pinned by literal tests in
``tests/test_enrich.py``.
"""

from __future__ import annotations

import json
import re

LANGS = (
    "python", "javascript", "typescript", "java", "c", "c++", "c#", "go",
    "rust", "ruby", "php", "bash", "sql", "html", "json", "yaml",
    "dockerfile", "kotlin", "perl", "latex", "unknown",
)

_ALIASES = {
    "py": "python", "python2": "python", "python3": "python",
    "js": "javascript", "jsx": "javascript", "node": "javascript",
    "nodejs": "javascript",
    "ts": "typescript", "tsx": "typescript",
    "cpp": "c++", "cxx": "c++", "cc": "c++",
    "cs": "c#", "csharp": "c#",
    "golang": "go",
    "rb": "ruby", "rs": "rust",
    "sh": "bash", "shell": "bash", "zsh": "bash",
    "yml": "yaml",
    "mysql": "sql", "postgres": "sql", "postgresql": "sql", "sqlite": "sql",
    "kt": "kotlin", "tex": "latex",
    "htm": "html", "xhtml": "html",
}


def normalize_code_hint(hint: str | None) -> str:
    """Fence/class token → canonical language label, or ``unknown``."""
    if not hint:
        return "unknown"
    tok = hint.strip().lower()
    for prefix in ("language-", "lang-"):
        if tok.startswith(prefix):
            tok = tok[len(prefix):]
            break
    if tok in LANGS:
        return tok
    return _ALIASES.get(tok, "unknown")


_SHEBANG_RE = re.compile(r"^#!\S*/(?:env\s+)?([a-z]+)[0-9.]*\b")
_SHEBANG_LANG = {"bash": "bash", "sh": "bash", "zsh": "bash",
                 "python": "python", "node": "javascript", "perl": "perl",
                 "ruby": "ruby", "php": "php"}

# one distinctive, high-precision marker per language (checked in order)
_MARKERS: tuple[tuple[str, re.Pattern], ...] = (
    ("php", re.compile(r"<\?php\b")),
    ("html", re.compile(r"<!doctype\s+html\b|</(?:html|body|head)>",
                        re.IGNORECASE)),
    ("go", re.compile(r"^[ \t]*package\s+main\b|\bfmt\.Print", re.MULTILINE)),
    ("rust", re.compile(r"\blet\s+mut\b|\bprintln!\s*\(|\bfn\s+main\s*\(")),
    ("python", re.compile(
        r"^[ \t]*def\s+\w+\s*\(.*\)\s*:|^[ \t]*elif\b|\b__name__\b"
        r"|^[ \t]*from\s+\S+\s+import\b", re.MULTILINE)),
    ("java", re.compile(r"\bpublic\s+static\s+void\s+main\b|\bSystem\.out\.")),
    ("c#", re.compile(r"\busing\s+System\b|\bConsole\.Write")),
    ("sql", re.compile(
        r"^[ \t]*select\b[\s\S]{0,200}?\bfrom\b"
        r"|^[ \t]*insert\s+into\b|^[ \t]*create\s+table\b",
        re.IGNORECASE | re.MULTILINE)),
    ("typescript", re.compile(
        r":\s*(?:string|number|boolean)(?:\[\])?\s*[;,)=]"
        r"|\binterface\s+\w+\s*\{")),
    ("javascript", re.compile(
        r"\bconsole\.log\s*\(|\brequire\s*\(|\bmodule\.exports\b")),
    ("ruby", re.compile(r"^[ \t]*puts\s+['\"]|^[ \t]*require\s+['\"]",
                        re.MULTILINE)),
    ("dockerfile", re.compile(
        r"^[ \t]*FROM\s+\S+[\s\S]*?^[ \t]*(?:RUN|CMD|COPY|ENTRYPOINT)\b",
        re.IGNORECASE | re.MULTILINE)),
)

_CPP_MARK = re.compile(r"\bstd::|\bcout\b|\btemplate\s*<")
_C_MARK = re.compile(r"\bint\s+main\s*\(|\bprintf\s*\(")


def detect_code_language(text: str, hint: str | None = None) -> str:
    """Detect a code block's language; ``unknown`` when not confident."""
    lang = normalize_code_hint(hint)
    if lang != "unknown":
        return lang
    if not text or not text.strip():
        return "unknown"
    m = _SHEBANG_RE.match(text.lstrip())
    if m and m.group(1) in _SHEBANG_LANG:
        return _SHEBANG_LANG[m.group(1)]
    if "#include" in text:
        if _CPP_MARK.search(text):
            return "c++"
        if _C_MARK.search(text):
            return "c"
    for cand, pat in _MARKERS:
        if pat.search(text):
            return cand
    stripped = text.strip()
    if stripped[:1] in "{[":
        try:
            json.loads(stripped)
            return "json"
        except ValueError:
            pass
    return "unknown"

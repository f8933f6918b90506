"""SQLite-compat rewrites for the verbatim ad-hoc SQL surface (E3).

The reference promises its users raw SQL over the store
(querying.md:35-39); those queries run under sqlite3 semantics. One
documented deviation survives the port to Spark SQL (SURVEY §7g):
SQLite's LIKE is ASCII case-INsensitive by default ("The LIKE operator
does case-insensitive matching for ASCII characters" — sqlite3 docs,
PRAGMA case_sensitive_like off), while Spark's LIKE is case-sensitive.
The querying.md examples therefore match 'Text/plain' under sqlite3
and miss it under a naive port.

`sqlite_like_compat` is the OPT-IN rewrite that closes the deviation:
every LIKE token outside string literals / quoted identifiers becomes
ILIKE (Spark >= 3.3), which is Spark's case-insensitive LIKE. NOT LIKE
becomes NOT ILIKE by the same token substitution. The rewrite is
deliberately token-level, not a SQL parse: the verbatim surface's
contract is "paste your sqlite3 query", and a tokenizer that only has
to respect quoting cannot mis-nest an expression it never rebuilds.

Deviation note kept honest: sqlite3's CI is ASCII-only ('Ä' LIKE 'ä'
is FALSE there), while ILIKE lowercases per Unicode — the rewrite is
case-insensitive in strictly more cases. For the reference's phone
numbers, MIME types and ASCII names the two agree exactly.
"""

from __future__ import annotations

import re

# string literals ('' escapes), quoted identifiers and COMMENTS are
# opaque: a LIKE inside any of them is data, not an operator. sqlite3
# accepts FOUR identifier quotings — "double" (standard), [brackets]
# and `backticks` (MS/MySQL compat, sqlite docs §keywords) — and the
# verbatim surface's contract is "paste your sqlite3 query", so all
# four are honored (review r16: the first draft rewrote SELECT [LIKE]
# / `LIKE`). Comments matter for a subtler reason (ADVICE r16 #1): an
# apostrophe inside `-- don't` would otherwise open a phantom string
# literal and desynchronize the scanner, silently leaving a LATER
# operator LIKE case-sensitive. sqlite3 supports both `--` to
# end-of-line (an unterminated final line is a whole comment) and
# `/* */` block comments (unterminated runs to end of input, no
# nesting — sqlite docs §comments).
_OPAQUE_RE = re.compile(
    r"'(?:[^']|'')*'"  # string literal
    r"|\"(?:[^\"]|\"\")*\""  # "identifier"
    r"|\[[^\]]*\]"  # [identifier]
    r"|`(?:[^`]|``)*`"  # `identifier`
    r"|--[^\n]*(?:\n|$)"  # -- line comment
    r"|/\*(?:[^*]|\*(?!/))*(?:\*/|$)"  # /* block comment */
)
_LIKE_RE = re.compile(r"\bLIKE\b", re.IGNORECASE)
# \bLIKE\b cannot match inside ILIKE: the preceding I is a word
# character, so there is no boundary — the rewrite is idempotent


def sqlite_like_compat(sql: str) -> str:
    """Rewrite LIKE -> ILIKE outside literals/quoted identifiers, so a
    sqlite3 query's (ASCII-)case-insensitive LIKE behaves identically
    when pasted into the Spark surface."""
    out: list[str] = []
    pos = 0
    for m in _OPAQUE_RE.finditer(sql):
        out.append(_LIKE_RE.sub("ILIKE", sql[pos : m.start()]))
        out.append(m.group(0))
        pos = m.end()
    out.append(_LIKE_RE.sub("ILIKE", sql[pos:]))
    return "".join(out)

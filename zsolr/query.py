"""Query-string builders (SURVEY.md §2.3) — the zeit.solr ``query.py``
helper surface.  Upstream these build Lucene query-string fragments for
``SolrConnection.search``; ours build the identical strings, consumed by
``zsolr.parse`` (Q1).  Pure Python, driver-side only.
"""

from __future__ import annotations

from datetime import datetime

# Lucene special characters that must be escaped in term text
_SPECIALS = '+-&|!(){}[]^"~*?:\\/'


def _escape(text: str) -> str:
    out = []
    for ch in str(text):
        if ch in _SPECIALS:
            out.append("\\")
        out.append(ch)
    return "".join(out)


def and_(*queries: str) -> str:
    return "(" + " AND ".join(queries) + ")"


def or_(*queries: str) -> str:
    return "(" + " OR ".join(queries) + ")"


def not_(query: str) -> str:
    return f"NOT ({query})"


def field(name: str, value: str) -> str:
    """Escaped, quoted fielded term: ``name:"value"``."""
    return f'{name}:"{_escape(value)}"'


def field_raw(name: str, raw: str) -> str:
    """Fielded query with no escaping (caller controls syntax)."""
    return f"{name}:{raw}"


def text_as_term(text: str, field_name: str | None = None) -> str:
    esc = _escape(text)
    return f"{field_name}:{esc}" if field_name else esc


def any_value() -> str:
    """Existence range: matches any document with a value."""
    return "[* TO *]"


def _iso(dt: datetime | None) -> str:
    if dt is None:
        return "*"
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def datetime_range(name: str, start: datetime | None, end: datetime | None) -> str:
    return f"{name}:[{_iso(start)} TO {_iso(end)}]"


def bool_field(name: str, value: bool) -> str:
    return f"{name}:{'true' if value else 'false'}"


def prefix(text: str) -> str:
    """PrefixQuery fragment: ``text*`` (single alphanumeric token)."""
    if not text.isalnum():
        raise ValueError("prefix() takes a single alphanumeric token")
    return f"{text}*"


def boost(term_or_phrase: str, weight: float) -> str:
    """Clause boost ``q^w`` — applies to a term or quoted phrase (the
    grammar attaches ``^w`` to term/phrase clauses, like Lucene)."""
    w = int(weight) if float(weight).is_integer() else weight
    return f"{term_or_phrase}^{w}"


def fuzzy(term: str, max_edits: int = 1) -> str:
    """FuzzyQuery fragment: ``term~d`` (single alphanumeric token)."""
    if not term.isalnum() or max_edits not in (1, 2):
        raise ValueError("fuzzy() takes an alphanumeric token and d in {1,2}")
    return f"{term}~{max_edits}"


def contains(sub: str) -> str:
    """Infix-wildcard fragment: ``*sub*`` (single alphanumeric token)."""
    if not sub.isalnum():
        raise ValueError("contains() takes a single alphanumeric token")
    return f"*{sub}*"

"""Lucene-subset query parser → AST (SURVEY.md §2.2 Q1).

Grammar (the subset zeit.solr's builders emit + bare user queries):

    query   := clause (("AND"|"OR") clause)*      # left-assoc, AND > OR
    clause  := "NOT" clause | "(" query ")" | ranged | fielded | term
    fielded := NAME ":" (quoted | word | range)
    ranged  := NAME ":" "[" bound "TO" bound "]"
    quoted  := '"' words '"'                      # positional PhraseQuery

Produces a tiny driver-side AST; the search planner (zsolr.search) splits
it into scored term clauses vs metadata predicates.  Terms are run through
the normative analyzer so query-side and index-side tokens agree.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .analyze import tokenize_py


@dataclass(frozen=True)
class Term:
    term: str
    field: str = "content"


@dataclass(frozen=True)
class Range:
    field: str
    lo: str | None   # None = open (*)
    hi: str | None


@dataclass(frozen=True)
class Phrase:
    """Quoted multi-token value: terms must appear consecutively in order
    (Lucene PhraseQuery).  Scored with tf := phrase frequency and
    idf := sum of the member terms' idfs.

    ``slop`` (``"a b"~2``): ORDER-FREE sloppy match on adjusted positions
    (token position − query slot, Lucene SloppyPhraseMatcher): a doc
    matches when some selection of one occurrence per member term has
    adjusted span ≤ slop — so ``"b a"~2`` matches transposed adjacent
    terms (span 2), matching Lucene's move-distance semantics.  Phrase
    frequency counts the first-term occurrences that anchor a valid
    window.  Simplification vs Lucene: repeated query terms may select
    the same token (phrases with distinct terms are exact)."""
    terms: tuple
    field: str = "content"
    slop: int = 0


@dataclass(frozen=True)
class Prefix:
    """``spar*`` — Lucene PrefixQuery.  Rewritten at plan time to the set
    of matching index terms (capped, Lucene maxBooleanClauses-style) and
    evaluated CONSTANT-SCORE (Lucene's default multi-term rewrite)."""
    prefix: str
    field: str = "content"


@dataclass(frozen=True)
class Contains:
    """``*sub*`` — infix wildcard.  Rewritten at plan time to the index
    terms containing the substring (full term-dictionary scan, like
    Lucene's leading-wildcard queries) and evaluated CONSTANT-SCORE."""
    sub: str


@dataclass(frozen=True)
class Wildcard:
    """General Lucene WildcardQuery pattern (``sp?rk``, ``sp*rk``,
    ``s*k*`` — any mix of ``*`` = any run and ``?`` = one char).  The
    trailing-star-only form stays :class:`Prefix` (its dictionary scan is
    a pushed-down StartsWith) and ``*sub*`` stays :class:`Contains`; this
    node covers the rest via a SQL-LIKE dictionary scan.  Rewritten at
    plan time to the matching index terms, evaluated CONSTANT-SCORE."""
    pattern: str


@dataclass(frozen=True)
class Fuzzy:
    """``spark~1`` — Lucene FuzzyQuery.  Rewritten at plan time to the
    index terms within ``max_edits`` Levenshtein distance (length-banded
    term-dictionary scan; an FST automaton is the Lucene-internal
    equivalent) and evaluated CONSTANT-SCORE like Prefix."""
    term: str
    max_edits: int = 1


@dataclass(frozen=True)
class Boost:
    """``term^2`` / ``"a b"^1.5`` — multiplies the child clause's score."""
    child: object
    weight: float


@dataclass(frozen=True)
class DisMax:
    """Lucene DisjunctionMaxQuery — the edismax ``qf`` expansion shape
    (Solr DisMaxQParser).  Matches the UNION of its children; a doc's
    score is ``max(child scores) + tie * (sum of the other children)``
    with ``tie`` ∈ [0, 1] (Solr's tiebreaker).  Children are typically
    the same analyzed user term re-fielded per qf entry (each wrapped in
    :class:`Boost` for its qf weight).  Constructed by the planner
    (``Searcher.search_dismax``), never by the query parser — edismax is
    a request-time rewrite, not query syntax."""
    children: tuple
    tie: float = 0.0


@dataclass(frozen=True)
class MinMatch:
    """Lucene BooleanQuery minimumNumberShouldMatch — edismax ``mm``: a
    doc matches when at least ``m`` of the SHOULD children match; its
    score is the sum of the matching children's scores.  ``m == 1`` is
    plain Or, ``m == len(children)`` is And — the planner normalizes
    those, so this node only materializes for the strictly-between
    cases.  Constructed by ``Searcher.dismax_ast`` (request-time
    rewrite), never by the query parser."""
    children: tuple
    m: int


@dataclass(frozen=True)
class And:
    children: tuple


@dataclass(frozen=True)
class Or:
    children: tuple


@dataclass(frozen=True)
class Not:
    child: object


_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\() | (?P<rparen>\)) |
        (?P<lbrack>\[) | (?P<rbrack>\]) |
        (?P<quoted>"(?:\\.|[^"\\])*") |
        (?P<word>(?:\\.|[^\s()\[\]:"])+) |
        (?P<colon>:)
    )""",
    re.VERBOSE,
)


def _lex(q: str) -> list[tuple[str, str]]:
    toks, i = [], 0
    while i < len(q):
        m = _TOKEN_RE.match(q, i)
        if not m:
            raise ValueError(f"bad query at {q[i:]!r}")
        if m.end() == i:
            break
        i = m.end()
        kind = m.lastgroup
        val = m.group(kind)
        toks.append((kind, val))
    return toks


def _unescape(s: str) -> str:
    return re.sub(r"\\(.)", r"\1", s)


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def pop(self):
        t = self.peek()
        self.i += 1
        return t

    # query := or_expr ;  or binds loosest
    def parse(self):
        node = self._or()
        if self.i != len(self.toks):
            raise ValueError(f"trailing tokens: {self.toks[self.i:]}")
        return node

    def _or(self):
        left = self._and()
        parts = [left]
        while self.peek() == ("word", "OR"):
            self.pop()
            parts.append(self._and())
        return parts[0] if len(parts) == 1 else Or(tuple(parts))

    def _and(self):
        parts = [self._clause()]
        while True:
            kind, val = self.peek()
            if (kind, val) == ("word", "AND"):
                self.pop()
                parts.append(self._clause())
            # implicit AND between adjacent clauses (Lucene default OR is
            # config; Solr q.op=AND is the zeit.solr-era default posture)
            elif kind in ("lparen", "quoted", "word") and val != "OR":
                parts.append(self._clause())
            else:
                break
        return parts[0] if len(parts) == 1 else And(tuple(parts))

    def _clause(self):
        kind, val = self.peek()
        if (kind, val) == ("word", "NOT"):
            self.pop()
            return Not(self._clause())
        if kind == "lparen":
            self.pop()
            node = self._or()
            k, _ = self.pop()
            if k != "rparen":
                raise ValueError("unbalanced parens")
            return node
        if kind == "lbrack":
            # bare `[* TO *]` from any_value(): match-all existence
            return self._range("*")
        if kind == "quoted":
            self.pop()
            node = self._phrase(_unescape(val[1:-1]), "content", quoted=True)
            return self._maybe_slop(node)
        if kind == "word":
            if val in ("AND", "OR", "NOT"):
                raise ValueError(
                    f"operator {val} in term position (Solr rejects this too)")
            self.pop()
            # fielded?
            if self.peek()[0] == "colon":
                self.pop()
                return self._fielded(_unescape(val))
            return self._word_clause(val)
        raise ValueError(f"unexpected token {kind}:{val}")

    def _word_clause(self, val: str):
        """Bare (or ``content:``-fielded) word → Boost / wildcard / fuzzy
        node or analyzed term(s).  Unsupported suffixes RAISE rather than
        silently tokenizing into something else (``term~3`` previously
        became ``And('term','3')`` — round-2 advice)."""
        m = re.fullmatch(r"(.+)\^(\d+(?:\.\d+)?)", val)
        if m:  # term boost: term^2 (suffix strips first, so spar*^2 works)
            return Boost(self._word_clause(m.group(1)), float(m.group(2)))
        m = re.fullmatch(r"([A-Za-z0-9]+)\*", val)
        if m:  # prefix query: spar* (StartsWith-pushdown dictionary scan)
            return Prefix(m.group(1).lower())
        m = re.fullmatch(r"\*([A-Za-z0-9]+)\*", val)
        if m:  # infix wildcard: *par*
            return Contains(m.group(1).lower())
        m = re.fullmatch(r"([A-Za-z0-9]+)~([12])?", val)
        if m:  # fuzzy query: spark~ / spark~1 / spark~2
            return Fuzzy(m.group(1).lower(),
                         int(m.group(2)) if m.group(2) else 1)
        m = re.fullmatch(r"(.+)~(\d+)", val)
        if m:  # anything else with a fuzzy suffix is unsupported syntax
            raise ValueError(
                f"fuzzy {val!r}: max_edits must be 1 or 2 on a plain term"
                f" (Lucene caps FuzzyQuery at 2 edits)")
        if ("*" in val or "?" in val) \
                and re.fullmatch(r"[A-Za-z0-9*?]+", val) \
                and re.search(r"[A-Za-z0-9]", val):
            # general wildcard: sp?rk / sp*rk / s*k* (Lucene WildcardQuery)
            return Wildcard(val.lower())
        return self._phrase(_unescape(val), "content")

    def _fielded(self, name: str):
        kind, val = self.peek()
        if kind == "lbrack":
            return self._range(name)
        if kind == "quoted":
            self.pop()
            node = self._phrase(_unescape(val[1:-1]), name, quoted=True)
            return self._maybe_slop(node)
        if kind == "word":
            self.pop()
            if name == "content":
                # content:… gets the full bare-word treatment (wildcards,
                # fuzzy, boosts) — previously content:spar* silently
                # dropped the star during tokenization
                return self._word_clause(val)
            m = re.fullmatch(r"(.+)\^(\d+(?:\.\d+)?)", val)
            if m:  # lang:en^2 — boost the (zero-scored) filter term;
                #    previously mis-parsed as exact Term('en^2') → 0 hits
                return Boost(Term(_unescape(m.group(1)), name),
                             float(m.group(2)))
            if re.fullmatch(r".+~\d*", val):
                raise ValueError(
                    f"fuzzy suffix on metadata field {name!r} is not"
                    f" supported ({val!r})")
            return self._phrase(_unescape(val), name)
        raise ValueError(f"bad fielded value for {name}")

    def _maybe_slop(self, node):
        """Consume trailing ``~k`` (slop) and/or ``^w`` (boost) after a
        quoted phrase — Lucene allows ``"a b"~2^3``."""
        kind, val = self.peek()
        if kind == "word" and re.fullmatch(
                r"(~\d+)?(\^\d+(?:\.\d+)?)?", val) and val:
            self.pop()
            m = re.fullmatch(r"(?:~(\d+))?(?:\^(\d+(?:\.\d+)?))?", val)
            slop = int(m.group(1)) if m.group(1) else 0
            if slop and isinstance(node, Phrase):
                node = Phrase(node.terms, node.field, slop)
            if m.group(2):
                node = Boost(node, float(m.group(2)))
        return node

    def _range(self, name: str):
        self.pop()  # [
        parts = []
        while self.peek()[0] not in ("rbrack", None):
            parts.append(self.pop())
        if self.pop()[0] != "rbrack":
            raise ValueError("unterminated range")
        # bounds may contain colons the lexer splits on (ISO-8601
        # timestamps: ``ts:[2020-01-01T00:00:00Z TO *]``) — the literal
        # word ``TO`` is the only reliable separator, so tokens on each
        # side re-join into one bound.  Only colon-split sequences may
        # re-join (word colon word …); two ADJACENT word tokens mean the
        # input had whitespace inside a bound, which stays an error.
        vals = [v for _k, v in parts]
        if vals.count("TO") != 1:
            raise ValueError(f"bad range {vals}")
        cut = vals.index("TO")
        for seg in (parts[:cut], parts[cut + 1:]):
            if any(a[0] == "word" and b[0] == "word"
                   for a, b in zip(seg, seg[1:])):
                raise ValueError(f"bad range {vals}")
        lo_s, hi_s = "".join(vals[:cut]), "".join(vals[cut + 1:])
        if not lo_s or not hi_s:
            raise ValueError(f"bad range {vals}")
        lo = None if lo_s == "*" else _unescape(lo_s)
        hi = None if hi_s == "*" else _unescape(hi_s)
        return Range(name, lo, hi)

    @staticmethod
    def _phrase(text: str, fld: str, quoted: bool = False):
        """Analyze value text.  Quoted multi-token values → positional
        Phrase (Lucene PhraseQuery); bare multi-token words (e.g. from
        `Foo-Bar`) → AND of terms.  Metadata fields keep the raw value
        (exact match on stored field)."""
        if fld != "content":
            return Term(text, fld)
        toks = tokenize_py(text)
        if not toks:
            raise ValueError(f"no tokens in {text!r}")
        if len(toks) == 1:
            return Term(toks[0], fld)
        if quoted:
            return Phrase(tuple(toks), fld)
        return And(tuple(Term(t, fld) for t in toks))


def parse(q: str):
    """Parse a Lucene-subset query string → AST."""
    toks = _lex(q)
    if not toks:
        raise ValueError("empty query")
    # bare existence range `[* TO *]` (from any_value()) → match-all
    return _Parser(toks).parse()

"""Pure-Python single-node BM25 oracle (SURVEY.md §5 ring 2, Appendix A).

Independent of the engine's codec/kernels: plain dicts + math.  The engine
must be rank-identical with equal scores (atol 1e-9) on the reference query
set (BASELINE.json north_rule).
"""

from __future__ import annotations

import math
import re
from collections import Counter

from zsolr.parse import (And, Boost, Contains, Fuzzy, Not, Or, Phrase,
                         Prefix, Range, Term, Wildcard)


def _lev(a: str, b: str) -> int:
    """Plain DP Levenshtein (independent of the engine's expansion)."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]

K1, B = 1.2, 0.75


class OracleIndex:
    def __init__(self, rows):
        """rows: iterable of dicts with doc_id, content + metadata fields."""
        self.meta = {}
        self.tf: dict[str, dict[int, int]] = {}
        self.doclen: dict[int, int] = {}
        self.tokens: dict[int, list[str]] = {}
        for r in rows:
            did = r["doc_id"]
            toks = re.findall(r"[a-z0-9]+", r["content"].lower())
            self.doclen[did] = len(toks)
            self.tokens[did] = toks
            for t, c in Counter(toks).items():
                self.tf.setdefault(t, {})[did] = c
            self.meta[did] = {k: v for k, v in r.items() if k != "content"}
        self.n = len(self.doclen)
        self.avgdl = sum(self.doclen.values()) / max(1, self.n)

    def idf(self, term: str) -> float:
        df = len(self.tf.get(term, {}))
        return math.log(1.0 + (self.n - df + 0.5) / (df + 0.5))

    def _score_term(self, term: str) -> dict[int, float]:
        w = self.idf(term)
        out = {}
        for did, tf in self.tf.get(term, {}).items():
            dl = self.doclen[did]
            out[did] = w * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / self.avgdl))
        return out

    def _eval(self, node) -> dict[int, float]:
        if isinstance(node, Phrase):
            # Lucene PhraseQuery: tf := phrase frequency, idf := Σ idfs.
            # slop > 0: ordered greedy earliest-next chain per first-term
            # occurrence with total extra gap ≤ slop (engine-independent
            # linear-scan implementation of the same documented semantics).
            idf_p = sum(self.idf(t) for t in node.terms)
            out = {}
            n = len(node.terms)
            for did, toks in self.tokens.items():
                if node.slop:
                    # order-free sloppy match on ADJUSTED positions
                    # (pos − query slot): an anchor occurrence of terms[0]
                    # counts when some brute-force selection of one
                    # occurrence per other term spans ≤ slop around it
                    # (independent of the engine's floor/ceil-neighbor
                    # optimization)
                    import itertools

                    adj = [[p - i for p, t in enumerate(toks) if t == term]
                           for i, term in enumerate(node.terms)]
                    pf = 0
                    if all(adj):
                        for a in adj[0]:
                            for sel in itertools.product(*adj[1:]):
                                w = (a,) + sel
                                if max(w) - min(w) <= node.slop:
                                    pf += 1
                                    break
                else:
                    pf = sum(1 for i in range(len(toks) - n + 1)
                             if tuple(toks[i:i + n]) == node.terms)
                if pf:
                    dl = self.doclen[did]
                    out[did] = (idf_p * pf * (K1 + 1)
                                / (pf + K1 * (1 - B + B * dl / self.avgdl)))
            return out
        if isinstance(node, Term):
            if node.field == "content":
                return self._score_term(node.term)
            return {d: 0.0 for d, m in self.meta.items()
                    if str(m.get(node.field)) == node.term}
        if isinstance(node, Range):
            if node.field in ("*", "content") and node.lo is None and node.hi is None:
                return {d: 0.0 for d in self.meta}
            out = {}
            for d, m in self.meta.items():
                v = m.get(node.field)
                if v is None:
                    continue
                if node.lo is not None and str(v) < node.lo:
                    continue
                if node.hi is not None and str(v) > node.hi:
                    continue
                out[d] = 0.0
            return out
        if isinstance(node, Prefix):
            # Lucene PrefixQuery: constant-score (0) over docs containing
            # any token with the prefix
            return {d: 0.0 for d, toks in self.tokens.items()
                    if any(t.startswith(node.prefix) for t in toks)}
        if isinstance(node, Contains):
            return {d: 0.0 for d, toks in self.tokens.items()
                    if any(node.sub in t for t in toks)}
        if isinstance(node, Wildcard):
            # independent glob implementation (regex, not the engine's
            # SQL-LIKE dictionary scan)
            pat = re.compile(
                "".join(".*" if c == "*" else "." if c == "?"
                        else re.escape(c) for c in node.pattern) + r"\Z")
            return {d: 0.0 for d, toks in self.tokens.items()
                    if any(pat.match(t) for t in toks)}
        if isinstance(node, Fuzzy):
            # constant-score over docs containing any token within edit
            # distance (Lucene FuzzyQuery, constant-score rewrite)
            ok = {t for t in self.tf
                  if abs(len(t) - len(node.term)) <= node.max_edits
                  and _lev(t, node.term) <= node.max_edits}
            return {d: 0.0 for d, toks in self.tokens.items()
                    if ok & set(toks)}
        if isinstance(node, Boost):
            return {d: s * node.weight
                    for d, s in self._eval(node.child).items()}
        if isinstance(node, Or):
            out: dict[int, float] = {}
            for c in node.children:
                if isinstance(c, Not):
                    # complement leg: constant-score 0 (filter semantics)
                    m = set(self._eval(c.child))
                    part = {d: 0.0 for d in self.meta if d not in m}
                else:
                    part = self._eval(c)
                for d, s in part.items():
                    out[d] = out.get(d, 0.0) + s
            return out
        if isinstance(node, And):
            pos = [c for c in node.children if not isinstance(c, Not)]
            neg = [c.child for c in node.children if isinstance(c, Not)]
            if not pos:
                excluded: set = set()
                for nn in neg:
                    excluded |= set(self._eval(nn))
                return {d: 0.0 for d in self.meta if d not in excluded}
            sets = [self._eval(c) for c in pos]
            common = set(sets[0])
            for s in sets[1:]:
                common &= set(s)
            for nn in neg:
                common -= set(self._eval(nn))
            return {d: sum(s.get(d, 0.0) for s in sets) for d in common}
        raise ValueError(f"oracle cannot eval {node}")

    def search(self, ast, k: int = 10):
        """→ list of (doc_id, score), score desc, doc_id asc tie-break."""
        scored = self._eval(ast)
        ranked = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked if k is None else ranked[:k]

    def num_found(self, ast) -> int:
        return len(self._eval(ast))

"""Query-builder string tests (mirrors upstream zeit.solr test_query style,
SURVEY.md §5 ring 1) + parser round-trips."""

from datetime import datetime

from zsolr import parse as P
from zsolr import query as Q


def test_and_or_not_strings():
    assert Q.and_("a", "b") == "(a AND b)"
    assert Q.or_("a", "b", "c") == "(a OR b OR c)"
    assert Q.not_("a") == "NOT (a)"


def test_field_escaping():
    assert Q.field("title", "foo") == 'title:"foo"'
    assert Q.field("title", 'a:b"c') == 'title:"a\\:b\\"c"'
    assert Q.field_raw("lang", "en") == "lang:en"
    assert Q.text_as_term("c++ (x)") == "c\\+\\+ \\(x\\)"


def test_range_builders():
    assert Q.any_value() == "[* TO *]"
    assert (
        Q.datetime_range("ts", datetime(2020, 1, 2, 3, 4, 5), None)
        == "ts:[2020-01-02T03:04:05Z TO *]"
    )
    assert Q.bool_field("published", True) == "published:true"


def test_parse_single_term():
    assert P.parse("spark") == P.Term("spark")


def test_parse_and_or_not():
    ast = P.parse("hash AND join")
    assert ast == P.And((P.Term("hash"), P.Term("join")))
    ast = P.parse("stream OR batch")
    assert ast == P.Or((P.Term("stream"), P.Term("batch")))
    ast = P.parse("query AND NOT slow")
    assert ast == P.And((P.Term("query"), P.Not(P.Term("slow"))))


def test_parse_precedence_and_parens():
    # AND binds tighter than OR
    ast = P.parse("a AND b OR c")
    assert ast == P.Or((P.And((P.Term("a"), P.Term("b"))), P.Term("c")))
    ast = P.parse("a AND (b OR c)")
    assert ast == P.And((P.Term("a"), P.Or((P.Term("b"), P.Term("c")))))


def test_parse_implicit_and():
    assert P.parse("hash join") == P.And((P.Term("hash"), P.Term("join")))


def test_parse_fielded_and_phrase():
    ast = P.parse("lang:en AND spark")
    assert ast == P.And((P.Term("en", "lang"), P.Term("spark")))
    # quoted multi-token → positional Phrase (Lucene PhraseQuery)
    ast = P.parse('"sort merge"')
    assert ast == P.Phrase(("sort", "merge"))
    assert P.parse('"spark"') == P.Term("spark")
    ast = P.parse('"a b c"')
    assert ast == P.Phrase(("a", "b", "c"))


def test_parse_ranges():
    ast = P.parse("commit:[a TO f]")
    assert ast == P.Range("commit", "a", "f")
    ast = P.parse("content:[* TO *]")
    assert ast == P.Range("content", None, None)
    assert P.parse("[* TO *]") == P.Range("*", None, None)


def test_builders_parse_back():
    q = Q.and_(Q.field_raw("lang", "en"), Q.or_("spark", "scan"), Q.not_("slow"))
    ast = P.parse(q)
    assert ast == P.And((
        P.Term("en", "lang"),
        P.Or((P.Term("spark"), P.Term("scan"))),
        P.Not(P.Term("slow")),
    ))


def test_analyzer_applied_to_query_terms():
    assert P.parse("SPARK") == P.Term("spark")
    assert P.parse("Foo-Bar") == P.And((P.Term("foo"), P.Term("bar")))


def test_prefix_and_boost_builders():
    import pytest

    from zsolr import query as q
    from zsolr.parse import Boost, Phrase, Prefix, parse

    assert q.prefix("spar") == "spar*"
    with pytest.raises(ValueError):
        q.prefix("a b")
    assert q.boost("spark", 2) == "spark^2"
    assert q.boost('"sort merge"', 1.5) == '"sort merge"^1.5'
    ast = parse(q.and_(q.prefix("spar"), q.boost("spark", 2)))
    assert isinstance(ast.children[0], Prefix)
    assert isinstance(ast.children[1], Boost)
    b = parse(q.boost('"sort merge"', 1.5))
    assert isinstance(b, Boost) and isinstance(b.child, Phrase)


def test_fielded_suffixes_parse_or_raise():
    """Round-2 advice: 'lang:en^2' must boost the filter term (previously
    exact Term('en^2') → silently zero hits) and unsupported fuzzy
    suffixes must RAISE instead of silently tokenizing."""
    import pytest

    assert P.parse("lang:en^2") == P.Boost(P.Term("en", "lang"), 2.0)
    with pytest.raises(ValueError):
        P.parse("lang:en~1")        # fuzzy on metadata: unsupported
    with pytest.raises(ValueError):
        P.parse("term~3")           # >2 edits: Lucene caps at 2
    with pytest.raises(ValueError):
        P.parse("content:spark~9")
    # content:-fielded words get the full bare-word treatment
    assert P.parse("content:spar*") == P.Prefix("spar")
    assert P.parse("content:spark~2") == P.Fuzzy("spark", 2)
    assert P.parse("content:spark^2") == P.Boost(P.Term("spark"), 2.0)


def test_parse_general_wildcards():
    """Mid-token wildcards (Lucene WildcardQuery): sp?rk / sp*rk / s*k*.
    Trailing-star-only stays Prefix; *sub* stays Contains."""
    assert P.parse("sp?rk") == P.Wildcard("sp?rk")
    assert P.parse("sp*rk") == P.Wildcard("sp*rk")
    assert P.parse("s*k*") == P.Wildcard("s*k*")
    assert P.parse("SP?RK") == P.Wildcard("sp?rk")
    assert P.parse("spar*") == P.Prefix("spar")
    assert P.parse("*par*") == P.Contains("par")
    # boost composes with wildcard forms (suffix strips first)
    assert P.parse("spar*^2") == P.Boost(P.Prefix("spar"), 2.0)
    assert P.parse("sp?rk^1.5") == P.Boost(P.Wildcard("sp?rk"), 1.5)


def test_fuzzy_contains_builders():
    import pytest

    from zsolr import query as q
    from zsolr.parse import Contains, Fuzzy, parse

    assert q.fuzzy("spark") == "spark~1"
    assert q.fuzzy("spark", 2) == "spark~2"
    assert q.contains("par") == "*par*"
    with pytest.raises(ValueError):
        q.fuzzy("a b")
    with pytest.raises(ValueError):
        q.contains("a b")
    a = parse(q.fuzzy("spark", 2))
    assert isinstance(a, Fuzzy) and a.max_edits == 2
    assert isinstance(parse(q.contains("par")), Contains)


def test_highlighter_snippets():
    """Solr highlighting (client-side over fetched content): matches wrap
    in <em>, snippets are windowed, nearby matches coalesce, and the
    analyzer agrees with the index tokenizer (case-insensitive)."""
    from zsolr.search import Searcher

    content = ("The Spark engine shuffles data across the cluster. "
               "A hash JOIN broadcasts the small side; the sort merge "
               "join shuffles both. Spark plans joins adaptively.")
    snips = Searcher.highlight(content, "spark AND join", window=3)
    assert snips and len(snips) <= 3
    joined = " … ".join(snips)
    assert "<em>Spark</em>" in joined
    assert "<em>JOIN</em>" in joined or "<em>join</em>" in joined
    # no-match content → no snippets
    assert Searcher.highlight("nothing relevant here", "spark") == []
    # every snippet contains at least one highlighted term
    for s in snips:
        assert "<em>" in s and "</em>" in s

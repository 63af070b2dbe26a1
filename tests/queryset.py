"""Reference query set v1 (SURVEY.md Appendix B / FIXTURES.md §7)."""

import random

VOCAB = [
    "scan", "column", "window", "order", "sort", "part", "agg", "value",
    "line", "key", "join", "merge", "group", "query", "a", "vector", "hash",
    "slow", "stream", "filter", "fast", "the", "batch", "spark", "table",
    "small", "data", "big", "customer", "row", "dup",
]


def reference_queries() -> list[str]:
    qs = [
        "spark",
        "dup",
        "scan",
        "hash AND join",
        "window AND agg",
        "stream OR batch",
        "query AND NOT slow",
        "lang:en AND spark",
        '"sort merge"',
        "[* TO *]",
    ]
    rng = random.Random(42)
    for _ in range(10):
        a, b = rng.sample(VOCAB, 2)
        qs.append(f"{a} AND {b}")
    return qs

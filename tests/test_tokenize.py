"""Tokenizer / extraction goldens (FIXTURES.md §4; semantics of
reference Searcher.java:39-42)."""

import pyarrow.parquet as pq

from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
    extract_html,
    tokenize,
    tokenize_count_batch,
    tokenize_query,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
    pages_parquet,
    synth_pages,
)

GOLDEN = [
    ("Hello, World!", ["hello", "world"]),
    ("<b>Bold</b> text", ["bold", "text"]),  # tags stripped, contents kept
    ("a<br/>b", ["ab"]),  # tag removal joins adjacent chars (Java semantics)
    ("punct:a;b,c.d!e?f", ["punct", "a", "b", "c", "d", "e", "f"]),
    ("  leading  and   trailing  ", ["leading", "and", "trailing"]),
    ("MiXeD CaSe", ["mixed", "case"]),
    ("under_score and 42 numbers7", ["under", "score", "and", "42", "numbers7"]),
    ("", []),
    ("!!! ???", []),
]


def test_tokenizer_goldens():
    for text, want in GOLDEN:
        assert tokenize(text) == want, text


def test_query_normalization_dedups_preserving_order():
    assert tokenize_query("Apple! banana APPLE <i>cherry</i> banana") == [
        "apple",
        "banana",
        "cherry",
    ]


def test_extract_html_title_and_body():
    html = b"<html><head><title>A Title</title></head><body><p>one <b>two</b></p> three</body></html>"
    title, text = extract_html(html)
    assert title == "A Title"
    assert text == "one two three"


def test_extract_html_no_body_tag_falls_back():
    title, text = extract_html("<title>t</title> plain words here")
    assert title == "t"
    assert text == "plain words here"


def test_extraction_inverse_on_generated_corpus():
    """Byte-identical extraction per url — the pinned invariant."""
    t = synth_pages(300, seed=7)
    for html, text in zip(t["html"].to_pylist(), t["text"].to_pylist()):
        _title, got = extract_html(html)
        assert got == text


def test_pages_parquet_deterministic(tmp_path):
    p1 = pages_parquet(150, cache_dir=str(tmp_path / "a"))
    p2 = pages_parquet(150, cache_dir=str(tmp_path / "b"))
    assert pq.read_table(p1).equals(pq.read_table(p2))


def test_tokenize_count_batch_matches_counter():
    """The vectorized batch kernel == Counter(tokenize(t)) per doc."""
    from collections import Counter

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize,
        tokenize_count_batch,
    )

    texts = [
        "Hello, World! <b>bold</b> x",
        "  lead space",
        "tab\there\nnewline and\xa0nbsp",
        "café ÉTÉ café",
        "",
        "   ",
        "punct!!!only???",
        "repeat repeat repeat one",
        "a<unclosed tag never ends",
    ]
    terms, tfs, lens = tokenize_count_batch(texts)
    for i, text in enumerate(texts):
        want = Counter(tokenize(text))
        got = dict(zip(terms[i].as_py(), tfs[i].as_py()))
        assert got == dict(want), text
        assert lens[i] == sum(want.values())


def test_tokenize_count_batch_repeated_allocation_stability():
    """Regression: pyarrow 16.1's utf8_split_whitespace intermittently
    extended a token's end offset by one byte (allocation-dependent,
    ~1% of calls on a ~30-doc batch), yielding tokens like 'of ' that
    corrupted the index vocabulary. The kernel chain now holds its
    intermediates alive and trims every token; this loop catches a
    recurrence with high probability."""
    from collections import Counter

    import pyarrow.parquet as pq

    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_parquet,
    )

    pages = pq.read_table(pages_parquet(200, row_group_size=32))
    texts = [extract_html(h)[1] for h in pages.slice(160, 32)["html"].to_pylist()]
    expected = [dict(Counter(tokenize(t))) for t in texts]
    for _trial in range(200):
        terms_list, tfs_list, _ = tokenize_count_batch(texts)
        for i in range(len(texts)):
            got = dict(zip(terms_list[i].as_py(), tfs_list[i].as_py()))
            assert got == expected[i]

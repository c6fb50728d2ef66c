"""Property-based tests (hypothesis) over the PURE kernels — the
functions whose exactness every oracle depends on: media codecs,
stemmer, WARC framing, query parsing, thumbnail arithmetic."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.media_codecs import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    resize_nearest,
    thumb_dims,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.queryparse import (
    parse_query,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.stem import (
    porter_stem,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.warc import (
    _build_record,
    parse_warc_bytes,
)


@given(
    st.integers(1, 40),
    st.integers(1, 40),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_bmp_roundtrip(w, h, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(img)) == img).all()


@given(st.integers(1, 5000), st.integers(0, 2**32 - 1), st.sampled_from([8000, 16000, 44100]))
@settings(max_examples=30, deadline=None)
def test_wav_roundtrip(n, seed, rate):
    rng = np.random.default_rng(seed)
    s = rng.integers(-(2**15), 2**15, size=n).astype(np.int16)
    got, got_rate = decode_wav(encode_wav(s, rate))
    assert got_rate == rate and (got == s).all()


@given(st.text(alphabet=st.characters(min_codepoint=97, max_codepoint=122), min_size=0, max_size=24))
@settings(max_examples=300, deadline=None)
def test_stem_bounded_total_deterministic(word):
    # NOTE: Porter is deliberately NOT idempotent in general (hypothesis
    # found 'aase' -> 'aas' -> 'aa': step 5a exposes a new final 's').
    # The stemmed-retrieval contract needs only ONE stem application on
    # both sides, so the properties that matter are: total, bounded
    # growth (at/bl/iz 'e' restore adds at most one char), non-empty on
    # non-empty input, alphabet-preserving, deterministic.
    s = porter_stem(word)
    assert len(s) <= len(word) + 1
    if word:
        assert s
        assert s.isascii() and s.isalpha() and s == s.lower()
    assert porter_stem(word) == s


@given(st.integers(1, 10_000), st.integers(1, 10_000), st.integers(1, 256))
@settings(max_examples=200, deadline=None)
def test_thumb_dims_invariants(w, h, m):
    tw, th = thumb_dims(w, h, m)
    assert 1 <= tw <= max(w, m) and 1 <= th <= max(h, m)
    assert max(tw, th) <= max(m, max(w, h) if max(w, h) <= m else m)
    if max(w, h) <= m:
        assert (tw, th) == (w, h)  # no upscaling
    else:
        assert max(tw, th) == m  # longest side lands exactly on the cap


@given(st.integers(1, 64), st.integers(1, 64), st.integers(1, 32), st.integers(1, 32), st.integers(0, 2**32 - 1))
@settings(max_examples=40, deadline=None)
def test_resize_nearest_picks_real_pixels(w, h, tw, th, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = resize_nearest(img, tw, th)
    assert out.shape == (th, tw, 3)
    # every output pixel is an exact source pixel (nearest, no blend)
    src = {bytes(px) for row in img for px in row}
    assert all(bytes(px) in src for row in out for px in row)


@given(
    st.lists(
        st.tuples(
            st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=30),
            st.binary(min_size=0, max_size=200),
        ),
        min_size=0,
        max_size=8,
    )
)
@settings(max_examples=60, deadline=None)
def test_warc_framing_roundtrip(records):
    # frame N response records (plus junk records interleaved) and
    # parse them back: urls and bodies survive byte-for-byte
    blob = b""
    want_urls, want_bodies = [], []
    for i, (uri, body) in enumerate(records):
        uri = uri.replace("\r", "").replace("\n", "")
        if not uri:
            continue
        http = b"HTTP/1.1 200 OK\r\n\r\n" + body
        blob += _build_record(
            [
                ("WARC-Type", "response"),
                ("WARC-Date", "2026-01-02T03:04:05Z"),
                ("WARC-Target-URI", uri),
                ("Content-Length", str(len(http))),
            ],
            http,
        )
        blob += _build_record(
            [("WARC-Type", "metadata"), ("Content-Length", "2")], b"xx"
        )
        want_urls.append(uri)
        want_bodies.append(body)
    urls, tss, htmls = parse_warc_bytes(blob)
    assert urls == want_urls
    assert htmls == want_bodies
    assert all(t == tss[0] for t in tss)


@given(st.text(max_size=80))
@settings(max_examples=300, deadline=None)
def test_parse_query_total_and_stable(q):
    # the parser never crashes, always partitions: every non-operator
    # whitespace token lands in exactly one bucket, and parsing is
    # deterministic
    p1, p2 = parse_query(q), parse_query(q)
    assert (p1.terms, p1.excluded, p1.phrases, p1.site) == (
        p2.terms,
        p2.excluded,
        p2.phrases,
        p2.site,
    )
    for t in p1.terms:
        assert not t.startswith("-") or len(t) == 1 or t == "-"
        assert not t.lower().startswith("site:")


@given(
    st.lists(st.integers(0, 2**40), min_size=0, max_size=400, unique=True),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_postings_codec_roundtrip(ids, seed):
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.codec import (
        decode_postings,
        encode_postings,
    )

    rng = np.random.default_rng(seed)
    doc_ids = np.sort(np.array(ids, dtype=np.int64))
    n = doc_ids.size
    tfs = rng.integers(1, 1000, size=n).astype(np.int64)
    dls = rng.integers(1, 5000, size=n).astype(np.int64)
    enc = encode_postings(doc_ids, tfs, dls)
    got_ids, got_tfs, got_dls = decode_postings(
        enc["doc_blob"], enc["tf_blob"], enc["dl_blob"], enc["n"]
    )
    assert (got_ids == doc_ids).all()
    assert (got_tfs == tfs).all()
    assert (got_dls == dls).all()
    # block bounds are true bounds (codec BLOCK = 128)
    BLOCK_N = len(enc["block_last_id"])
    if n:
        assert enc["block_last_id"][-1] == doc_ids[-1]
        for b in range(BLOCK_N):
            lo = b * 128
            seg_tf = tfs[lo : lo + 128]
            seg_dl = dls[lo : lo + 128]
            if seg_tf.size:
                assert enc["block_max_tf"][b] == seg_tf.max()
                assert enc["block_min_dl"][b] == seg_dl.min()


@given(st.lists(st.integers(0, 2**62), min_size=0, max_size=500))
@settings(max_examples=80, deadline=None)
def test_varint_roundtrip(vals):
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.codec import (
        varint_decode,
        varint_encode,
    )

    arr = np.array(vals, dtype=np.int64)
    assert (varint_decode(varint_encode(arr), arr.size) == arr).all()

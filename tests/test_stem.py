"""Porter stemmer (functions/stem.py): canonical vectors from the 1980
paper's examples, pass-through rules, and idempotence on a corpus
vocabulary sample."""

from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.stem import (
    porter_stem,
)

VECTORS = {
    # step 1a / 1b / 1c examples (Porter 1980, section 3)
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky",
    # step 2
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic", "differentli": "differ",
    "vileli": "vile", "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    # step 3
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "communism": "commun", "activate": "activ", "angulariti": "angular",
    "homologous": "homolog", "effective": "effect", "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
}


def test_canonical_vectors():
    got = {w: porter_stem(w) for w in VECTORS}
    assert got == VECTORS


def test_passthrough_rules():
    # length <= 2, non-alpha, and non-ASCII tokens are untouched
    for w in ("a", "is", "x1", "don't", "co-op", "42", "naïve", ""):
        assert porter_stem(w) == w


def test_idempotent_on_corpus_vocab():
    import pyarrow.parquet as pq

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize_count_batch,
    )

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet", columns=["text"])
    terms, _tfs, _ = tokenize_count_batch(t["text"].combine_chunks())
    vocab = sorted(set(terms.flatten().to_pylist()))
    assert vocab, "corpus vocabulary must be non-empty"
    for v in vocab:
        s = porter_stem(v)
        # Porter is NOT idempotent in general ('aase' -> 'aas' -> 'aa');
        # this asserts the PINNED corpus vocabulary happens to contain
        # no such words — a tripwire against silent generator/vocab
        # drift, not an algorithm property
        assert porter_stem(s) == s, (v, s, porter_stem(s))
